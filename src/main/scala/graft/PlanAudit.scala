package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for the headline queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
