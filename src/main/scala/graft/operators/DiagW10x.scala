package graft.operators

import org.apache.spark.sql.SparkSession

/** TEMPORARY miss-anatomy diagnostic for the walk10x measurement —
  * classifies each s20b/s20h miss at the 20480-vector corpus:
  *   - nn_linked: does the true NN have an undirected edge to any of
  *     the query's true top-8 (i.e. is the NN wired into its own
  *     neighborhood at all — build quality)?
  *   - beam_near: did the final beam contain any of the true top-8
  *     (navigation got to the right region but the last hop failed)?
  * Not registered; run via
  * {{{ sbt 'runMain graft.operators.DiagW10x' }}} */
object DiagW10x {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]").appName("diag-w10x")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dir = Walk10x.dir(s)
      val embs = Similarity.embVectors(s, dir)
      // undirected adjacency of the materialized knn graph
      val edges = Similarity.materializedKnnEdges(s, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val adj = new scala.collection.mutable.HashMap[Long,
        scala.collection.mutable.HashSet[Long]]()
      def link(a: Long, b: Long): Unit =
        adj.getOrElseUpdate(a,
          new scala.collection.mutable.HashSet[Long]()) += b
      edges.foreach { case (a, b) => link(a, b); link(b, a) }
      def served(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
        df.select("q_id", "rank", "found_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      val beamTop = served(Similarity.s20b(s, dir))
      val hierTop = served(Similarity.s20h(s, dir))
      def cosv(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { d += a(i).toDouble * b(i); i += 1 }
        d
      }
      def topK(q: Long, k: Int): Seq[Long] = {
        val qe = embs(q)
        embs.iterator.collect { case (id, v) if id != q => (-cosv(qe, v), id) }
          .toSeq.sorted.take(k).map(_._2)
      }
      val wq = embs.keysIterator.filter(_ % 25 == 0).toSeq.sorted
      var bMiss = 0; var bMissLinked = 0; var bMissNear = 0
      var hMiss = 0; var hMissLinked = 0; var hMissNear = 0
      var nnUnlinked = 0
      wq.foreach { q =>
        val t8 = topK(q, 8)
        val nn = t8.head
        val nbrs = adj.getOrElse(nn, Set.empty[Long])
        val linked = t8.tail.exists(nbrs.contains)
        if (!linked) nnUnlinked += 1
        val bt = beamTop(q)
        if (!bt.contains(nn)) {
          bMiss += 1
          if (linked) bMissLinked += 1
          if (bt.exists(t8.tail.contains)) bMissNear += 1
        }
        val ht = hierTop(q)
        if (!ht.contains(nn)) {
          hMiss += 1
          if (linked) hMissLinked += 1
          if (ht.exists(t8.tail.contains)) hMissNear += 1
        }
      }
      println(s"queries=${wq.size} nn_unlinked_overall=$nnUnlinked")
      println(s"s20b: miss=$bMiss miss_nn_linked=$bMissLinked " +
        s"miss_beam_near=$bMissNear")
      println(s"s20h: miss=$hMiss miss_nn_linked=$hMissLinked " +
        s"miss_beam_near=$hMissNear")
    } finally s.stop()
  }
}
