package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational11

/** Measures what the z-ordered write path BUYS (VERDICT r10 #4): the
  * q56 layout's parquet footers must let a stats-aware reader skip
  * files under the two-dimensional predicate, where a round-robin
  * layout of the same rows prunes nothing. The audit reads each
  * file's (o_custkey, o_orderdate) min/max envelope — exactly the
  * information parquet row-group/file skipping consumes — rather than
  * trusting the writer, and the survivor counts are the SCALING.md
  * row's source.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private val custLo = 30L
  private val custHi = 90L
  // ISO "yyyy-MM-dd HH:mm:ss" strings order like the timestamps they
  // name, and sidestep the NTZ-vs-java.sql.Timestamp getter mismatch
  private val dateLo = "1997-01-01 00:00:00"
  private val dateHi = "1998-01-01 00:00:00"

  /** Per-file (min,max) envelope of the two predicate columns, read
    * back from the written files — one tiny scan per file, the same
    * stats the parquet reader's filter pushdown consults. */
  private def survivors(path: String): (Int, Int) = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    val surv = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_custkey"), max("o_custkey"),
          min(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")),
          max(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")))
        .head()
      val (cLo, cHi) = (r.getLong(0), r.getLong(1))
      val (dLo, dHi) = (r.getString(2), r.getString(3))
      // file survives iff its envelope intersects the predicate box
      cHi >= custLo && cLo <= custHi &&
        dHi >= dateLo && dLo < dateHi
    }
    (surv, files.length)
  }

  test("z-ordered layout prunes files on BOTH dimensions; round-robin prunes none") {
    val zPath = Relational11.zOrderedOrdersPath(spark, sf)

    // round-robin baseline: same rows, same file count, no clustering
    val rrDir = java.nio.file.Files.createTempDirectory("graft-rr-orders")
    try {
      Tables.load(spark, sf, "orders")
        .repartition(16)
        .write.mode("overwrite").parquet(rrDir.toString)

      val (zSurv, zFiles) = survivors(zPath)
      val (rrSurv, rrFiles) = survivors(rrDir.toString)

      info(s"z-ordered: $zSurv/$zFiles files survive the predicate; " +
        s"round-robin: $rrSurv/$rrFiles")
      // round-robin files each span ~the full key space: nothing prunes
      assert(rrSurv == rrFiles,
        "round-robin baseline unexpectedly pruned — predicate too narrow to compare")
      // the clustered layout must actually skip files — strictly fewer
      // survivors, and at most 60% of the layout
      assert(zSurv < rrSurv, "z-ordered layout pruned nothing")
      assert(zSurv.toDouble / zFiles <= 0.6,
        s"z-ordered layout too weak: $zSurv/$zFiles files survive")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(rrDir.toFile)
    }
  }

  test("q56 over the clustered layout matches the original table") {
    val viaLayout = Relational11.q56(spark, sf).collect().map(_.toSeq)
    val direct = Tables.load(spark, sf, "orders")
      .filter(col("o_custkey").between(custLo, custHi) &&
        col("o_orderdate") >= to_timestamp(lit(dateLo)) &&
        col("o_orderdate") < to_timestamp(lit(dateHi)))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_orderkey"),
        max(col("o_orderkey")).as("max_orderkey"))
      .orderBy(col("o_orderpriority"))
      .collect().map(_.toSeq)
    assert(viaLayout.toSeq == direct.toSeq,
      "z-ordered rewrite changed query results")
    assert(viaLayout.nonEmpty)
  }
}
