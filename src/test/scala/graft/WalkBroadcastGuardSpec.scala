package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.operators.Similarity

/** VERDICT r17 #2: the walk/repair bodies broadcast "query-batch-
  * bounded" frames, but an insert/re-embed batch can be corpus-
  * proportional (s23's semantics is "re-embed a shard" — a model bump
  * re-embeds everything), and a forced broadcast of a corpus-scale
  * frame is a driver OOM at 100 TB. The guard (`maybeBroadcast`) keeps
  * the hint below a conf-tunable row cap and falls back to a shuffle
  * join above it. These tests pin (a) the guard's hint behavior on
  * both sides of the cap, and (b) that the full s23 migration body
  * computes IDENTICAL results with every broadcast hint disabled —
  * the fallback is degraded, never different. */
class WalkBroadcastGuardSpec extends SparkSpec {

  private val CAP_KEY = "graft.walk.broadcastMaxRows"

  private def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst { case h: ResolvedHint => h }
      .nonEmpty

  test("maybeBroadcast hints under the cap and falls back above it") {
    val s = spark
    import s.implicits._
    val df = (1L to 10L).toDF("id")
    assert(hinted(Similarity.maybeBroadcast(df, 10L)),
      "a batch under the cap must keep the broadcast hint")
    assert(!hinted(Similarity.maybeBroadcast(df,
        Similarity.WALK_BROADCAST_MAX_ROWS + 1)),
      "a batch over the cap must drop the broadcast hint")
    // the cap is conf-tunable (production sizes it to its driver)
    val saved = spark.conf.getOption(CAP_KEY)
    try {
      spark.conf.set(CAP_KEY, "5")
      assert(!hinted(Similarity.maybeBroadcast(df, 6L)),
        "a conf-lowered cap must gate the hint")
      assert(hinted(Similarity.maybeBroadcast(df, 5L)))
    } finally {
      saved match {
        case Some(v) => spark.conf.set(CAP_KEY, v)
        case None => spark.conf.unset(CAP_KEY)
      }
    }
  }

  test("s23 migration body: corpus-scale batch, all broadcasts off, " +
      "identical result") {
    val s = spark
    import s.implicits._
    // the VERDICT scenario: a corpus-PROPORTIONAL re-embedding batch
    // (half the corpus — a model bump migrating shard by shard), far
    // beyond the 1/16 hash shard the registered s23 uses; a full-
    // corpus batch would leave no live graph to migrate into
    val batch = Tables.load(spark, sf, "embeddings")
      .filter($"vec_id" % 2 === 0)
      .select($"vec_id".as("q_id"), reverse($"embedding").as("embedding"))
      .localCheckpoint()
    val withHints = Similarity.reembedServe(spark, sf, batch)
      .collect().map(_.toSeq).toSeq
    val saved = spark.conf.getOption(CAP_KEY)
    val noHints =
      try {
        spark.conf.set(CAP_KEY, "0") // every maybeBroadcast falls back
        Similarity.reembedServe(spark, sf, batch)
          .collect().map(_.toSeq).toSeq
      } finally {
        saved match {
          case Some(v) => spark.conf.set(CAP_KEY, v)
          case None => spark.conf.unset(CAP_KEY)
        }
      }
    assert(withHints == noHints,
      "the shuffle-join fallback changed the migration result")
    assert(withHints.nonEmpty, "migration produced no edges")
  }
}
