package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational13, Similarity}

/** The IVF write faces' semantics (r16 verdict #4 — lifecycle
  * symmetry with the graph index's AnnInsert/AnnDelete specs): the
  * frozen-quantizer encode is per-row pure (micro-batch ≡ bulk), the
  * updated inverted file is complete, inserted vectors are actually
  * retrievable, and a tombstoned vector can never be served. The
  * cross-engine equality of the registered s27/s27m/s27d rows is the
  * driver gate's job. */
class IvfWriteSpec extends SparkSpec {

  private lazy val ix = Relational13.materializedIvfBaseIndex(spark, sf)

  private def arrivals = {
    val s = spark
    import s.implicits._
    Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
      .filter(Similarity.arrivalRule($"vec_id"))
  }

  test("s27 encode: micro-batch ≡ bulk (per-row purity under the " +
      "frozen quantizers)") {
    val s = spark
    import s.implicits._
    val bulk = Relational13.ivfEncode(ix, arrivals)
      .collect().map(_.toSeq).toSet
    val merged = (Relational13.ivfEncode(ix, arrivals.filter($"vec_id" % 2 === 0))
        .collect() ++
      Relational13.ivfEncode(ix, arrivals.filter($"vec_id" % 2 =!= 0))
        .collect()).map(_.toSeq).toSet
    assert(bulk == merged,
      "splitting the arrival batch must not change any code row")
    assert(bulk.nonEmpty)
  }

  test("s27 encode: every arrival lands in the inverted file with a " +
      "full code word") {
    val s = spark
    import s.implicits._
    val enc = Relational13.ivfEncode(ix, arrivals)
    val nArr = arrivals.count()
    assert(enc.select("vec_id").distinct().count() == nArr,
      "an arrival is missing from the updated inverted file")
    val perVec = enc.groupBy($"vec_id").count()
      .select(min($"count"), max($"count")).collect()(0)
    assert(perVec.getLong(0) == perVec.getLong(1),
      "ragged code words across arrivals")
    // every assigned cell is one of the trained cells
    val cells = ix.cent.select("cell").collect().map(_.getInt(0)).toSet
    assert(enc.select("cell").distinct().collect()
      .forall(r => cells(r.getInt(0))), "assignment outside trained cells")
  }

  test("s27: inserted vectors are retrievable (arrival neighbors appear " +
      "in served top-k)") {
    val s = spark
    import s.implicits._
    val res = Relational13.s27m(spark, sf).localCheckpoint()
    assert(res.count() > 0)
    val hit = res.filter(Similarity.arrivalRule($"neighbor_id")).count()
    assert(hit > 0,
      "no arrival ever served - the insert face would be a no-op")
  }

  test("s27d: a tombstoned vector is never served, and the tombstones " +
      "actually bite on this fixture") {
    val s = spark
    import s.implicits._
    val del = Relational13.s27d(spark, sf).localCheckpoint()
    assert(del.count() > 0)
    assert(del.filter(Similarity.tombstoneRule($"neighbor_id")).count() == 0L,
      "a deleted vector was served")
    // non-vacuity: the untouched index DOES serve tombstoned ids
    val base = Relational13.s14m(spark, sf)
    assert(base.filter(Similarity.tombstoneRule($"neighbor_id")).count() > 0L,
      "fixture never serves a tombstoned id - the delete test is vacuous")
  }
}
