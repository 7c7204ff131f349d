package graft

import org.apache.spark.sql.SparkSession
import java.util.Locale
import scala.jdk.CollectionConverters._

/** Isolated per-query probe — the r8 d09 attribution protocol made a
  * permanent tool (VERDICT r11 asked for exactly this on t29): run ONE
  * query N reps in a FRESH JVM with per-rep GC time, so a bench
  * regression can be attributed to (a) JIT/C2 warm-up (monotone
  * rep-over-rep decay to a steady state), (b) GC pressure (GC ms
  * rivaling the rep time), or (c) a real plan cost (flat reps at the
  * high number). The JVM is fresh per sbt invocation, which is what
  * makes the warm-up curve visible — inside the full bench suite every
  * query runs on a JVM warmed by its alphabetical predecessors.
  *
  * Usage: {{{
  *   sbt 'runMain graft.QueryProbe /root/testdata/sf0.1 t29_leakage_audit 6'
  * }}}
  * Mirrors Bench's environment: same master/shuffle settings, same
  * table warm-up; kernel warm-up (the bench's throwaway d02) is OFF by
  * default so rep 1 shows the true cold cost — pass a 4th arg `warm`
  * to reproduce the bench's warmed position instead.
  */
object QueryProbe {
  private def gcMs: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 6
    val warmKernels = args.length > 3 && args(3) == "warm"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    if (warmKernels) operators.Dedup.d02(spark, sfDir).count(): Unit
    val fn = SparkEntry.queries(name)
    val rows = (1 to reps).map { i =>
      val g0 = gcMs
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = gcMs - g0
      System.err.println(
        String.format(Locale.ROOT, "[probe] %s rep %d: %.3f s, gc %d ms",
          name, Int.box(i), Double.box(sec), Long.box(gc)))
      (sec, gc)
    }
    val times = rows.map(_._1)
    println(String.format(Locale.ROOT,
      """{"probe":"%s","sf":"%s","warm":%b,"reps":[%s],"gc_ms":[%s],"median":%.4f}""",
      name, sfDir, java.lang.Boolean.valueOf(warmKernels),
      times.map(t => String.format(Locale.ROOT, "%.3f", Double.box(t))).mkString(","),
      rows.map(_._2.toString).mkString(","),
      Double.box(times.sorted.apply(reps / 2))))
    spark.stop()
  }
}
