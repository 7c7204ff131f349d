package graft

import graft.operators.{Relational3, Skew}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("x01 approx distinct is within 5% of exact") {
    val rows = Relational3.x01(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("x03 approx quantiles land within 5% of exact") {
    Relational3.x03(spark, sf).collect().foreach { r =>
      for (p <- Seq("p50", "p90")) {
        val a = r.getAs[Double](s"${p}_approx")
        val e = r.getAs[Double](s"${p}_exact")
        assert(math.abs(a - e) / e <= 0.05, s"$p: approx $a vs exact $e")
      }
    }
  }

  test("maxBucket skew cap only removes pairs, never invents them") {
    import graft.operators.Dedup
    val full = Dedup.d02(spark, sf).select("a_id", "b_id")
    val capped = Dedup.d02(spark, sf, maxBucket = Some(3)).select("a_id", "b_id")
    assert(capped.except(full).isEmpty,
      "capped candidate pairs must be a subset of uncapped")
    val fullLsh = Dedup.d03(spark, sf).select("a_id", "b_id")
    val cappedLsh = Dedup.d03(spark, sf, maxBucket = Some(3)).select("a_id", "b_id")
    assert(cappedLsh.except(fullLsh).isEmpty)
  }

  test("recall report: the numbers SCALING.md publishes are what the code measures") {
    // Deterministic given the sf0.01 data — every divergence from the
    // published table is a real behavior change, not noise. Keep in
    // lockstep with SCALING.md "Recall report" (regenerate both with
    // `runMain graft.operators.RecallReport`).
    val m = graft.operators.RecallReport.compute(spark, "/root/testdata/sf0.01")
    val published = Map(
      "d02_recall_cap16" -> 1.0, "d02_recall_cap64" -> 1.0,
      "d03_recall_cap16" -> 1.0, "d03_recall_cap64" -> 1.0,
      "d11_recall_cap16" -> 1.0, "d11_recall_cap64" -> 1.0,
      "d12_recall_cap16" -> 1.0, "d12_recall_cap64" -> 1.0,
      "q51_answered_fraction" -> 0.048, "q51_match_rate" -> 1.0,
      "q51_answered" -> 12.0,
      "s03_recall_cos0.40" -> 0.6780, "s03_truth_cos0.40" -> 59.0,
      "s03_recall_cos0.45" -> 0.7857, "s03_truth_cos0.45" -> 14.0,
      "s03_recall_cos0.50" -> 1.0, "s03_truth_cos0.50" -> 1.0,
      "s03_candidate_fraction" -> 0.2371)
    assert(m == published,
      s"recall drifted from the published table:\n measured=$m\n published=$published")
  }

  test("s05 int8-quantized top-k recalls the exact top-k") {
    import graft.operators.Similarity
    val exact = Similarity.s01(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val quant = Similarity.s05(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"8-bit quantization should barely move top-5: $recall")
  }

  test("w04 sort-based sessionization equals w03 session windows") {
    import graft.operators.EventWindows
    val a = EventWindows.w03(spark, sf)
    val b = EventWindows.w04(spark, sf)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "state-store and sort formulations must agree")
  }

  test("salted join returns exactly the unsalted join's rows") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey")).collect()
      .map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(li, o, "l_orderkey", factor = 7)
      .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted two-phase sum equals direct sum") {
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", 16)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.keySet.foreach { k =>
      assert(math.abs(direct(k)._1 - salted(k)._1) < 1e-6)
      assert(direct(k)._2 == salted(k)._2)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      Tables.load(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$wh/li_b")
        .saveAsTable("li_bucketed")
      Tables.load(spark, sf, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$wh/o_b")
        .saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
