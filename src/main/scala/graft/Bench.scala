package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints exactly ONE stdout line: the driver-parsed JSON
  * `{"metric":"total",...}`. Everything else (warm-up failures, per-query
  * errors, progress) goes to stderr so the stdout line can't be truncated
  * or interleaved away from the driver's parser.
  *
  * Noise control: queries run in sorted-key order (stable across rounds —
  * HashMap iteration order reshuffles whenever a key is added, which made
  * r1→r2 per-query deltas incomparable), and each query runs REPS times
  * with the median reported, so one GC pause or JIT warm-up doesn't show
  * up as a 2× "regression".
  */
object Bench {
  private val REPS = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every input table once so the first timed query
    // doesn't pay scheduler/JIT/parquet-footer costs for all of them
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count() catch {
        case e: Throwable => System.err.println(s"[bench] warm-up failed for table $n: $e")
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to REPS).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] query $name failed: $e")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> median(times)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
