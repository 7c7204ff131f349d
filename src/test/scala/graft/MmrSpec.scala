package graft

/** s17 MMR diversified re-rank vs an in-process brute-force greedy
  * replay (same fold-left double dots, same λ=0.5 arithmetic, same
  * (score DESC, vec_id) tie-break — bit-equal doubles, so the
  * comparison is exact). The DuckDB gate re-checks the unrolled-CTE
  * oracle at sf0.01. */
class MmrSpec extends SparkSpec {

  private val NQ = 5
  private val CAND = 16
  private val K = 5

  test("s17: selections equal the brute-force greedy MMR") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val want = (0L until NQ).flatMap { qid =>
      val qv = byId(qid)
      val cand = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(qv, v) / (nrm(qid) * nrm(id))) }
        .sortBy { case (id, rel) => (-rel, id) }.take(CAND)
      var selected = Vector.empty[(Long, Double, Long)] // (id, score, rank)
      (1 to K).foreach { k =>
        val remaining = cand.filterNot(c => selected.exists(_._1 == c._1))
        val scored = remaining.map { case (id, rel) =>
          val score =
            if (selected.isEmpty) 0.5 * rel
            else {
              val ms = selected.map(s =>
                dot(byId(id), byId(s._1)) / (nrm(id) * nrm(s._1))).max
              0.5 * rel - 0.5 * ms
            }
          (id, score)
        }
        val (pid, pscore) = scored.minBy { case (id, sc) => (-sc, id) }
        selected :+= ((pid, pscore, k.toLong))
      }
      selected.map { case (id, sc, k) =>
        (qid, id, k,
          BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = operators.Similarity.s17(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == want)
  }

  test("s17: selections are distinct and drawn from the s01-style pool") {
    val rows = operators.Similarity.s17(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (q, sel) =>
      assert(sel.length == K)
      assert(sel.map(_._2).distinct.length == K, s"q$q selections must be distinct")
      assert(sel.map(_._3).sorted.toSeq == (1L to K), s"q$q ranks must be 1..$K")
    }
  }
}
