package graft
import org.apache.spark.sql.SparkSession

object T37Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val nMd5 = "md5\\(".r.findAllIn(plan).size
        val nTok = "tokens\\(".r.findAllIn(plan).size
        val nShin = "shingle".r.findAllIn(plan).size
        if (nMd5 > 4 || nTok > 4 || nShin > 6)
          println(f"SUSPECT $name md5=$nMd5 tokens=$nTok shingles=$nShin")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
