package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Mixed-workload index lifecycle: the three mutation faces chained
  * on EACH OTHER'S outputs (the registered queries prove each face
  * against the pinned assets; this proves they compose — a day in a
  * production index: a batch arrives, a deletion request lands, a
  * re-embedding shard migrates). All through the same private[graft]
  * bodies the registered s21/s22/s23 run. */
class IndexLifecycleSpec extends SparkSpec {

  private val KNN_K = graft.operators.Similarity.KNN_K

  private def hashRule(seed: Int, m: Int)(c: org.apache.spark.sql.Column) =
    pmod(graft.functions.TextOps.hash64Seeded(seed, c.cast("string")),
      lit(m)) === 0

  test("insert, then delete, then re-embed — chained on each other's output") {
    val s = spark
    import s.implicits._
    val e = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding",
        sqrt(graft.functions.NativeKernels.vec_dot($"embedding",
          $"embedding")).as("nrm"))
      .localCheckpoint()
    val allIds = e.select($"vec_id").collect().map(_.getLong(0)).toSet

    def ids(rule: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      e.filter(rule($"vec_id")).select($"vec_id").collect()
        .map(_.getLong(0)).toSet
    val arrivals = ids(hashRule(22, 8))
    val tombs = ids(hashRule(23, 16))
    val shard = ids(hashRule(24, 16))

    def cosOf(edges: DataFrame): DataFrame =
      Similarity.baseEdgeCos(edges.select($"src", $"dst"), e)

    def check(g: Array[(Long, Long)], live: Set[Long], stage: String): Unit = {
      assert(g.forall(p => live(p._1) && live(p._2)),
        s"$stage: an edge touches a non-live id")
      val deg = g.groupBy(_._1).view.mapValues(_.length)
      assert(deg.values.forall(_ <= KNN_K), s"$stage: out-degree > k")
      assert(g.distinct.length == g.length, s"$stage: duplicate edge")
    }

    // stage 1: the arrivals wire into the base graph (s21m semantics)
    val g1 = Similarity.s21m(spark, sf).localCheckpoint()
    val live1 = allIds
    check(g1.select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))), live1, "after insert")

    // stage 2: tombstones apply ON TOP of the inserted graph — the
    // deletion set may include freshly-inserted arrivals
    val g2 = Similarity.deleteFromGraph(cosOf(g1), e,
      e.filter(hashRule(23, 16)($"vec_id")).select($"vec_id"))
      .localCheckpoint()
    val live2 = live1 -- tombs
    val g2e = g2.select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    check(g2e, live2, "after delete")
    assert((arrivals -- tombs).exists(a => g2e.exists(_._1 == a)),
      "surviving arrivals must still carry edges after the delete")

    // stage 3: a re-embedding shard migrates ON TOP of the deleted
    // graph (delete ∘ insert with the shard's new vectors)
    val shardLive = (shard -- tombs).toSeq
    val g3del = Similarity.deleteFromGraph(cosOf(g2), e,
      e.filter($"vec_id".isin(shardLive: _*)).select($"vec_id"))
      .localCheckpoint()
    val liveE = e.filter(!$"vec_id".isin((tombs ++ shard).toSeq: _*))
      .localCheckpoint()
    val newVecs = e.filter($"vec_id".isin(shardLive: _*))
      .select($"vec_id".as("q_id"), reverse($"embedding").as("qe"))
      .select($"q_id", $"qe",
        sqrt(graft.functions.NativeKernels.vec_dot($"qe", $"qe")).as("qn"))
    val g3 = Similarity.insertIntoGraph(
      g3del.select($"src", $"dst"), liveE, newVecs)
    val g3e = g3.select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    check(g3e, live2, "after re-embed")
    assert(shardLive.forall(id => g3e.count(_._1 == id) == KNN_K),
      "every re-embedded id must carry exactly k out-edges")

    // determinism: the whole chain replayed gives the same bytes
    val g3again = Similarity.insertIntoGraph(
      Similarity.deleteFromGraph(cosOf(g2), e,
        e.filter($"vec_id".isin(shardLive: _*)).select($"vec_id"))
        .select($"src", $"dst"), liveE, newVecs)
      .collect().map(_.toSeq).toSeq
    assert(g3again == g3.collect().map(_.toSeq).toSeq,
      "the lifecycle chain is not deterministic under replay")

    Seq(e, g1, g2, g3del, liveE)
      .foreach(graft.functions.CheckpointOps.freeLocalCheckpoint)
  }
}
