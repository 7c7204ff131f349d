package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The approximation-quality report for the bucketed/capped operators
  * (SCALING.md "Recall report"): every number the operator Scaladocs
  * quote is computed HERE, deterministically (all inputs and kernels
  * are deterministic given the parquet data), pinned by ScaleSpec at
  * sf0.01 and tabulated in SCALING.md for sf0.01 and sf0.1.
  *
  * Measured tradeoffs:
  *  - d02/d03 with the `maxBucket` skew cap (the 100 TB stop-shingle
  *    guard) vs uncapped — the cap can only LOSE pairs (ScaleSpec
  *    proves containment); this quantifies how many.
  *  - s03's rotation-bucket candidate stage vs the all-pairs ground
  *    truth [[Similarity.s03Exact]], at the output threshold (0.4)
  *    and at the planted-near-dup thresholds (0.8, 0.9), plus the
  *    candidate fraction (|candidates| / n(n-1)/2 — the work the LSH
  *    saves).
  *
  * Regenerate the SCALING.md table with:
  * {{{ sbt 'runMain graft.operators.RecallReport /root/testdata/sf0.1' }}}
  */
object RecallReport {

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0
    else got.intersect(truth).size.toDouble / truth.size

  private def r4(x: Double): Double = math.rint(x * 10000) / 10000

  /** metric name → value, all rounded to 4 decimals. */
  def compute(s: SparkSession, dir: String): Map[String, Double] = {
    val d02u = pairSet(Dedup.d02(s, dir))
    val d03u = pairSet(Dedup.d03(s, dir))
    val caps = Seq(16, 64)
    val dedup = caps.flatMap { m =>
      Seq(
        s"d02_recall_cap$m" -> r4(recall(pairSet(Dedup.d02(s, dir, Some(m))), d02u)),
        s"d03_recall_cap$m" -> r4(recall(pairSet(Dedup.d03(s, dir, Some(m))), d03u)))
    }
    // s03: exact pairs at the output threshold carry their cosine, so
    // higher thresholds are subsets of one all-pairs evaluation.
    // Truth-set SIZES are reported alongside recall: a recall of 1.0
    // over an empty truth set is vacuous, not a measurement (the r3-r4
    // comments claimed recall at cos ≥0.8/0.9 — thresholds this
    // synthetic corpus never reaches; max pair cosine ≈0.51).
    val exactRows = Similarity.s03Exact(s, dir)
      .select("a_id", "b_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val cand = pairSet(Similarity.s03Candidates(s, dir))
    val n = Similarity.embCount(s, dir).toDouble
    val sim = Seq(0.4, 0.45, 0.5).flatMap { t =>
      val truth = exactRows.collect { case (p, c) if c >= t => p }.toSet
      Seq(f"s03_recall_cos$t%.2f" -> r4(recall(cand, truth)),
        f"s03_truth_cos$t%.2f" -> truth.size.toDouble)
    } :+ ("s03_candidate_fraction" -> r4(cand.size / (n * (n - 1) / 2)))
    (dedup ++ sim).toMap
  }

  /** Prints the SCALING.md markdown rows for one scale factor. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val m = compute(spark, dir)
      println(s"| metric | $dir |")
      println("|---|---|")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"| $k | $v%.4f |") }
    } finally spark.stop()
  }
}
