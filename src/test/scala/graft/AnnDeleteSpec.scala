package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** s22 graph-index delete + local repair: structural invariants of
  * the post-delete graph and the measured repair coverage. The
  * value-level truth is the DuckDB oracle's full replay; these pin
  * what the hash can't express. */
class AnnDeleteSpec extends SparkSpec {

  private val KNN_K = graft.operators.Similarity.KNN_K
  private val DEL_SEED = 23
  private val DEL_MOD = 16

  test("s22 post-delete graph: tombstones gone, degrees capped, repair local") {
    val s = spark
    import s.implicits._
    val tomb = Tables.load(spark, sf, "embeddings")
      .filter(pmod(graft.functions.TextOps.hash64Seeded(DEL_SEED,
        $"vec_id".cast("string")), lit(DEL_MOD)) === 0)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(tomb.size > 5, s"tombstone split too small to test: ${tomb.size}")

    val before = Similarity.s11(spark, sf)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val after = Similarity.s22(spark, sf)
      .select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // no tombstone survives on either side of any edge
    assert(!after.exists(e => tomb(e._1) || tomb(e._2)),
      "a tombstoned node survives in the post-delete edge table")

    // out-degrees stay capped at k
    val degAfter = after.groupBy(_._1).view.mapValues(_.length).toMap
    assert(degAfter.values.forall(_ <= KNN_K),
      "a node's out-degree exceeds k after repair")

    // repair is LOCAL and ADDITIVE: undamaged survivors keep exactly
    // their old edges; damaged survivors keep their surviving edges
    // (repair never rewrites a kept edge)
    val beforeBySrc = before.groupBy(_._1)
    val afterBySrc = after.groupBy(_._1)
    beforeBySrc.foreach { case (src, edges) =>
      if (!tomb(src)) {
        val keptOld = edges.filterNot(e => tomb(e._2)).toSet
        val now = afterBySrc.getOrElse(src, Array.empty).toSet
        assert(keptOld.subsetOf(now),
          s"node $src lost a surviving edge during repair")
        if (keptOld.size == edges.length)
          assert(now == keptOld,
            s"undamaged node $src was rewritten by repair")
      }
    }

    // repair coverage: report how many severed slots were refilled
    val severed = before.count(e => !tomb(e._1) && tomb(e._2))
    val refilled = after.length - before.count(e => !tomb(e._1) && !tomb(e._2))
    info(f"s22 repair coverage: $refilled/$severed severed slots refilled")
    assert(severed > 0 && refilled > 0,
      "the split produced no damage or the repair filled nothing")

    // every repaired edge routes THROUGH the hole: its dst was an
    // out-neighbor of a deleted neighbor of its src in the old graph
    val oldOut = before.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val newEdges = after.toSet -- before.toSet
    newEdges.foreach { case (u, w) =>
      val viaHole = oldOut.getOrElse(u, Set.empty).exists(d =>
        tomb(d) && oldOut.getOrElse(d, Set.empty).contains(w))
      assert(viaHole,
        s"repaired edge ($u,$w) did not come from a deleted neighbor's out-list")
    }
  }
}
