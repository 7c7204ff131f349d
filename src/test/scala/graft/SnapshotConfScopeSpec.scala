package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** VERDICT r17 #1 / ADVICE r17: the manifest reader's listing-
  * threshold raise (driver-side stat pass instead of a one-task-per-
  * file cluster listing job) must be SCOPED to the manifest read —
  * the r17 form mutated session conf permanently, so after the first
  * manifest read every directory-backed read in the session listed
  * serially on the driver up to 100k files, and an explicitly
  * configured value was silently clobbered. */
class SnapshotConfScopeSpec extends SparkSpec {

  import spark.implicits._

  private val KEY = "spark.sql.sources.parallelPartitionDiscovery.threshold"

  private def freshTable(): String = {
    val out = java.nio.file.Files.createTempDirectory("graft-conf-spec")
    out.toFile.deleteOnExit()
    val base = Tables.load(spark, sf, "orders")
      .withColumn("om", date_format($"o_orderdate", "yyyy-MM"))
      .filter($"om" < "1995-03")
      .repartition(2)
    SnapshotTable.init(spark, base, out.toString, "om", "o_orderkey")
    out.toString
  }

  test("manifest reads do not leak the listing threshold into the session") {
    val path = freshTable()
    val saved = spark.conf.get(KEY) // effective value (default-resolved)
    try {
      // default session: a manifest read must leave the effective
      // value unchanged (the r17 form left it at 100000 forever)
      val v0 = spark.conf.get(KEY)
      val n0 = SnapshotTable.readVersion(spark, path, 1).count()
      assert(n0 > 0)
      assert(spark.conf.get(KEY) == v0,
        s"manifest read changed the session's effective $KEY")

      // explicitly configured session: the user's value must survive
      spark.conf.set(KEY, "7")
      val n1 = SnapshotTable.readVersion(spark, path, 1).count()
      assert(n1 == n0)
      assert(spark.conf.get(KEY) == "7",
        s"manifest read clobbered an explicitly configured $KEY")
    } finally spark.conf.set(KEY, saved)
  }
}
