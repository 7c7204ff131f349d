package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** s21 incremental graph-index insert (the HNSW insert path):
  * structural invariants of the updated graph, the micro-batch
  * mergeability lemma the streaming face relies on, and the measured
  * neighbor-selection quality of the insert beam vs exact search.
  * The value-level truth (the full updated edge table) is the DuckDB
  * oracle's job; these tests pin the properties the oracle hash can't
  * express. */
class AnnInsertSpec extends SparkSpec {

  private val KNN_K = graft.operators.Similarity.KNN_K
  private val INS_SEED = 22
  private val INS_MOD = 8

  private def isArrival = (id: org.apache.spark.sql.Column) =>
    pmod(graft.functions.TextOps.hash64Seeded(INS_SEED,
      id.cast("string")), lit(INS_MOD)) === 0

  private def parts(): (DataFrame, DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val e = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding",
        sqrt(graft.functions.NativeKernels.vec_dot($"embedding",
          $"embedding")).as("nrm"))
      .localCheckpoint()
    val baseE = e.filter(!isArrival($"vec_id"))
    val arrivals = e.filter(isArrival($"vec_id"))
      .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
    (e, baseE, arrivals)
  }

  test("s21 updated graph: degree caps, arrival wiring, id discipline") {
    val s = spark
    import s.implicits._
    val (_, baseE, arrivals) = parts()
    val nArr = arrivals.count()
    assert(nArr > 10, s"arrival split too small to test: $nArr")
    val out = Similarity.s21(spark, sf)

    // every node's out-degree ≤ k; every arrival has EXACTLY k
    // out-edges (the beam always carries ≥ k base survivors here)
    val deg = out.groupBy($"src").agg(count(lit(1)).as("d"))
    assert(deg.filter($"d" > KNN_K).count() == 0,
      "a node's out-degree exceeds k after insert")
    val arrIds = arrivals.select($"q_id").collect().map(_.getLong(0)).toSet
    val arrDeg = deg.filter($"src".isin(arrIds.toSeq: _*))
    assert(arrDeg.count() == nArr &&
      arrDeg.filter($"d" =!= KNN_K).count() == 0,
      s"every arrival must carry exactly $KNN_K out-edges")

    // arrivals' out-edges point ONLY at base nodes (pinned-base
    // semantics: intra-batch arrivals never link to each other), and
    // base nodes' edges point at base ∪ arrivals only
    val badDst = out.filter($"src".isin(arrIds.toSeq: _*) &&
      $"dst".isin(arrIds.toSeq: _*))
    assert(badDst.count() == 0,
      "an arrival's out-edge points at another arrival — the pinned-" +
        "base insert must only wire arrivals into the base graph")

    // reverse wiring happened: at least one base node adopted an
    // arrival (on real data the new vectors are not all unpopular)
    val adopted = out.filter(!$"src".isin(arrIds.toSeq: _*) &&
      $"dst".isin(arrIds.toSeq: _*)).count()
    assert(adopted > 0, "no base node adopted any arrival — the " +
      "reverse-edge shrink path produced nothing")
  }

  test("micro-batched insert ≡ bulk insert (the mergeability lemma)") {
    val s = spark
    import s.implicits._
    val (e, baseE0, arrivals) = parts()
    val baseE = baseE0.localCheckpoint()
    val baseEdges = Similarity.materializedBaseEdges(spark, sf)
    val bc = Similarity.baseEdgeCos(baseEdges, baseE).localCheckpoint()

    val arr1 = arrivals.filter(pmod($"q_id", lit(2)) === 0)
    val arr2 = arrivals.filter(pmod($"q_id", lit(2)) === 1)

    // out-edge selection is per-arrival independent against the
    // pinned base: chunked newOut ≡ bulk newOut
    val no1 = Similarity.newOutEdges(baseEdges, baseE, arr1)
    val no2 = Similarity.newOutEdges(baseEdges, baseE, arr2)
    val noAll = Similarity.newOutEdges(baseEdges, baseE, arrivals)
    val chunkedOut = no1.unionByName(no2).collect()
      .map(_.toSeq).toSet
    val bulkOut = noAll.collect().map(_.toSeq).toSet
    assert(chunkedOut == bulkOut,
      "chunked out-edge selection diverged from bulk")

    // the shrink is mergeable: shrink(shrink(A, R1), R2) ≡
    // shrink(A, R1 ∪ R2) — the property that makes micro-batched
    // ingest exactly equal to one bulk insert
    def rev(no: DataFrame) =
      no.select($"dst".as("src"), $"src".as("dst"), $"cos")
    val twoStep = Similarity.shrinkWith(
      Similarity.shrinkWith(bc, rev(no1)).localCheckpoint(), rev(no2))
      .collect().map(_.toSeq).toSet
    val oneStep = Similarity.shrinkWith(bc, rev(no1).unionByName(rev(no2)))
      .collect().map(_.toSeq).toSet
    assert(twoStep == oneStep,
      "per-src top-k shrink is not mergeable: two-step ≠ one-step")
    graft.functions.CheckpointOps.freeLocalCheckpoint(e)
    graft.functions.CheckpointOps.freeLocalCheckpoint(baseE)
    graft.functions.CheckpointOps.freeLocalCheckpoint(bc)
  }

  test("insert beam finds good neighbors: measured recall vs exact") {
    val s = spark
    import s.implicits._
    // exact nearest base vector per arrival, brute force on the
    // driver (500 × 64 floats at this SF)
    val rows = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // reuse the registered split by recomputing it per id through the
    // engine-side hash (no reimplementation that could drift)
    val splitDf = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", isArrival($"vec_id").as("arr")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val base = rows.filter(r => !splitDf(r._1))
    val arrivals = rows.filter(r => splitDf(r._1))
    val exactNn = arrivals.map { case (id, v) =>
      id -> base.map { case (bid, bv) => (cos(v, bv), bid) }
        .maxBy(p => (p._1, -p._2))._2
    }.toMap

    // the insert's rank-1 out-edge per arrival
    val rank1 = Similarity.s21(spark, sf)
      .filter($"src".isin(arrivals.map(_._1).toSeq: _*))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"src")
          .orderBy($"cos_sim".desc, $"dst")))
      .filter($"rk" === 1)
      .select($"src", $"dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val hit = arrivals.count { case (id, _) => rank1(id) == exactNn(id) }
    val n = arrivals.length
    info(f"s21 insert neighbor recall@1: $hit/$n = ${hit.toDouble / n}%.4f")
    // measured 63/64 = 0.9844 at sf0.001 on the r16 serving stack
    // (undirected walk view + adaptive hops + ef=64; was 38/64 on the
    // r15 ef=16 directed walk, 17/64 on the k=3 graph) — insert
    // quality IS search quality by construction (the insert is
    // "beam-search then connect"); chance here is 1/437 ≈ 0.002. The
    // quality knob is the search backend (the s20h hierarchy slots in
    // unchanged, measured 64/64 below); pin a floor under the
    // measured value so a regression in the beam machinery OR the
    // graph build still fails loudly.
    assert(hit.toDouble / n >= 0.9,
      s"insert beam neighbor recall collapsed: $hit/$n")

    // the hierarchical selector (s21h): same exact-NN yardstick —
    // the two-layer search must not be WORSE than the flat beam
    // (the beam-≥-greedy spec convention applied up the quality tier)
    val rank1h = Similarity.s21h(spark, sf)
      .filter($"src".isin(arrivals.map(_._1).toSeq: _*))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"src")
          .orderBy($"cos_sim".desc, $"dst")))
      .filter($"rk" === 1)
      .select($"src", $"dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hitH = arrivals.count { case (id, _) => rank1h(id) == exactNn(id) }
    info(f"s21h hierarchical insert neighbor recall@1: $hitH/$n = ${hitH.toDouble / n}%.4f")
    assert(hitH >= hit,
      s"hierarchical insert selector fell below the flat beam: $hitH < $hit")
  }
}
