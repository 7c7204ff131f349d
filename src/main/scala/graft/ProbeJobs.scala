package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.Locale
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev measurement tool (optimization guide §1: measure FIRST, and
  * decide whether a query is compute-bound or orchestration-bound
  * before touching it): runs ONE registered query with a listener
  * counting jobs / stages / tasks and summing task run time, so a
  * per-query wall second can be attributed to
  *
  *  - executor compute (`task_run_sec` close to `wall × cores`), vs
  *  - scheduling/planning overhead (many jobs+stages, task time ≪
  *    wall — the signature of iterative per-hop loops on small SFs,
  *    where the fix is fewer exchanges/jobs per iteration, which is
  *    ALSO the 100 TB fix: every exchange is a real shuffle there).
  *
  * Usage: sbt 'runMain graft.ProbeJobs /root/testdata/sf0.1 s20b_beam_ann [reps]'
  * Mirrors Bench's session config; first rep is unmeasured warm-up.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
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
    fn(spark, sfDir).count() // warm-up rep (JIT + fixture first-touch)

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskRunMs = new AtomicLong  // executorRunTime (ms) summed
    val taskTotalMs = new AtomicLong // task duration (ms) incl. sched/deser
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (te.taskMetrics != null) {
          taskRunMs.addAndGet(te.taskMetrics.executorRunTime)
          ()
        }
        if (te.taskInfo != null) { taskTotalMs.addAndGet(te.taskInfo.duration); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val walls = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probejobs] $name rep $i: $w%.3f s")
      w
    }
    Thread.sleep(500) // let the listener bus drain the final events
    // standard even/odd median (ADVICE r17: the upper-element pick was
    // the MAX for the default reps=2)
    val medianWall = {
      val s = walls.sorted
      if (reps % 2 == 1) s(reps / 2) else (s(reps / 2 - 1) + s(reps / 2)) / 2.0
    }
    println(String.format(Locale.ROOT,
      """{"probe":"%s","sf":"%s","reps":%d,"median_wall_sec":%.4f,""" +
        """"jobs_per_rep":%.1f,"stages_per_rep":%.1f,"tasks_per_rep":%.1f,""" +
        """"task_run_sec_per_rep":%.3f,"task_total_sec_per_rep":%.3f}""",
      name, sfDir, Int.box(reps), Double.box(medianWall),
      Double.box(jobs.get.toDouble / reps),
      Double.box(stages.get.toDouble / reps),
      Double.box(tasks.get.toDouble / reps),
      Double.box(taskRunMs.get / 1e3 / reps),
      Double.box(taskTotalMs.get / 1e3 / reps)))
    spark.stop()
  }
}
