package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper: print the AQE-final executed plan of one registered
  * query. `Test/runMain graft.tools.PlanDump <queryName> [sfDir]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
