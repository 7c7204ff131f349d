package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for the headline queries.
  * Prefix a query name with `exec:` to RUN it and dump the final
  * AQE-executed plan instead (shows ReusedExchange/ReusedSubquery
  * nodes the static plan can't — the t18 scan-count discipline). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"========== $q ==========")
      if (q.startsWith("exec:")) {
        val df = SparkEntry.queries(q.stripPrefix("exec:"))(spark, sf)
        df.collect(): Unit
        val ex = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(ex).length
        val reused = "ReusedExchange".r.findAllIn(ex).length
        println(ex)
        println(s"[planaudit] scans=$scans reused_exchanges=$reused")
      } else
        SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
