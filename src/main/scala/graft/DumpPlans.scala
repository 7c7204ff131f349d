package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.io.PrintWriter
import java.util.Locale
import java.util.concurrent.ConcurrentLinkedQueue

/** Dev measurement tool (guide §1/§7.2): run ONE registered query and
  * dump EVERY internal SQL execution it triggers — iterative operators
  * hide their per-round plans behind `localCheckpoint`, so the outer
  * `df.explain` shows only the final fragment; this listener sees each
  * round's executed plan WITH its duration, which is where the
  * exchange-count-per-iteration work actually is.
  *
  * Usage: sbt 'runMain graft.DumpPlans <sfDir> <query> <outFile> [full]'
  * Writes one block per execution: duration, operator counts
  * (Exchange / BroadcastExchange / SortMergeJoin / ShuffledHashJoin /
  * BroadcastHashJoin / Sort / Window / HashAggregate), and (with
  * `full`) the whole executedPlan tree.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val outFile = args(2)
    val full = args.length > 3 && args(3) == "full"
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
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up: fixtures + JIT land here

    val recs = new ConcurrentLinkedQueue[(String, Long, String)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        { recs.add((funcName, durationNs, qe.executedPlan.toString)); () }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // drain the listener bus
    spark.listenerManager.unregister(listener)

    val ops = Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition", "BroadcastExchange", "SortMergeJoin",
      "ShuffledHashJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
      "CartesianProduct", "+- Sort ", "Window", "HashAggregate",
      "ObjectHashAggregate", "SortAggregate", "AQEShuffleRead")
    val pw = new PrintWriter(outFile)
    var i = 0
    var totalDur = 0.0
    val it = recs.iterator()
    while (it.hasNext) {
      val (fn0, ns, plan) = it.next()
      i += 1
      totalDur += ns / 1e9
      val counts = ops.map(o =>
          o -> java.util.regex.Pattern.quote(o).r.findAllIn(plan).length)
        .filter(_._2 > 0)
        .map { case (o, n) => s"${o.trim.stripPrefix("+- ")}=$n" }
        .mkString(" ")
      pw.println(String.format(Locale.ROOT,
        "== exec %d (%s) %.3f s: %s", Int.box(i), fn0,
        Double.box(ns / 1e9), counts))
      if (full) { pw.println(plan); pw.println() }
    }
    pw.println(String.format(Locale.ROOT,
      "== total: wall %.3f s across %d executions (sum %.3f s)",
      Double.box(wall), Int.box(i), Double.box(totalDur)))
    pw.close()
    System.err.println(f"[dumpplans] $name: $i executions, wall $wall%.3f -> $outFile")
    spark.stop()
  }
}
