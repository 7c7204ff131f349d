package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational7}

/** Semantic properties of the seventh tranche (the DuckDB hash oracle
  * covers value equality; these assert the claims the operators
  * make about themselves). */
class Relational7Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("t17 chunks tile every document: contiguous ids, full coverage, fixed stride") {
    val s = spark
    import s.implicits._
    val chunks = Relational7.t17(s, sf)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max($"chunk_id").as("max_id"),
        sum($"n_tok").as("sum_tok"), max($"n_tok").as("max_tok"))
      .collect()
    val nTok = Tables.load(s, sf, "documents")
      .select($"doc_id", size(graft.functions.NativeKernels.word_tokens($"text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val (doc, nc, maxId) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val n = nTok(doc)
      // chunk ids 0..k-1 with one chunk per stride start below n
      assert(maxId == nc - 1, s"doc $doc: ids not contiguous")
      assert(nc == (n + 47) / 48, s"doc $doc: wrong chunk count for $n tokens")
      assert(r.getLong(4) <= 64, s"doc $doc: chunk longer than CHUNK")
      // overlapping tiling covers every token: sum of chunk lengths =
      // n + overlap·(full chunks that have a successor)
      val expected = (0L until nc).map(i => math.min(64L, n - i * 48)).sum
      assert(r.getLong(3) == expected, s"doc $doc: coverage mismatch")
    }
    // zero-token docs are absent
    val docsWithChunks = Relational7.t17(s, sf).select($"doc_id").distinct().count()
    assert(docsWithChunks == nTok.count(_._2 > 0))
  }

  test("t17 survives whitespace-only documents (tab/newline text, zero tokens)") {
    // SQL trim strips only U+0020, so "\t"/"\n" docs pass the cheap
    // pre-filter and tokenize to an empty array — the clamped sequence
    // bound must keep the plan legal and the doc absent from output
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t17-ws")
    dir.toFile.deleteOnExit()
    Seq(
      (1L, "alpha beta gamma delta", "en", "web", 22L),
      (2L, "\t", "en", "web", 1L),
      (3L, "\n \t ", "en", "web", 4L),
      (4L, "", "en", "web", 0L),
      (5L, "solo", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Relational7.t17(s, dir.toString).collect()
    val docs = out.map(_.getLong(0)).toSet
    assert(docs == Set(1L, 5L),
      s"whitespace-only docs must emit no chunks: got $docs")
    assert(out.forall(_.getLong(2) > 0), "no zero-token chunks")
  }

  test("t18 scores rare-token documents above common-token documents") {
    val s = spark
    import s.implicits._
    val scored = Relational7.t18(s, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.values.forall(_ > 0), "NLL must be positive")
    // the doc whose tokens are most corpus-typical must not outscore
    // the most surprising doc (sanity of the direction of the signal)
    assert(scored.values.max > scored.values.min)
    // per-doc token counts agree with the tokenizer
    val n = Relational7.t18(s, sf).agg(sum($"n_tok")).head().getLong(0)
    val total = Tables.load(s, sf, "documents")
      .select(size(graft.functions.NativeKernels.word_tokens($"text")).cast("long").as("k"))
      .agg(sum($"k")).head().getLong(0)
    assert(n == total, "token mass must equal the corpus total")
  }

  test("t19 emits 2-char pairs ranked by weighted frequency") {
    val s = spark
    import s.implicits._
    val rows = Relational7.t19(s, sf).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getString(0).length == 2))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    // hand-check the top pair against a direct two-pass computation
    val direct = Tables.load(s, sf, "documents")
      .select(explode(graft.functions.NativeKernels.word_tokens($"text")).as("w"))
      .filter(length($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"pair").limit(1).head()
    assert(rows.head.getString(0) == direct.getString(0))
    assert(rows.head.getLong(1) == direct.getLong(1))
  }

  test("d10 weights: each near-dup cluster carries unit total mass") {
    val s = spark
    import s.implicits._
    val w = Relational7.d10(s, sf)
    // clustered docs: weight = 1/cluster_size; unclustered: exactly 1.0
    assert(w.filter($"cluster_size" === 1 && $"weight" =!= 1.0).isEmpty)
    val perCluster = w.filter($"cluster_size" > 1)
      .groupBy($"cluster_size").agg(sum($"weight").as("mass"),
        count(lit(1)).as("n"))
      .collect()
    perCluster.foreach { r =>
      val sizeK = r.getLong(0)
      val clusters = r.getLong(2) / sizeK.toDouble
      assert(math.abs(r.getDouble(1) - clusters) < 1e-3,
        s"size-$sizeK clusters sum to ${r.getDouble(1)}, expected ~$clusters")
    }
    // total corpus mass: one unit per cluster + one per unclustered doc
    val docs = Tables.load(s, sf, "documents").count()
    assert(w.count() == docs, "every document must keep a weight row")
  }

  test("t20 weighted sample is deterministic and keeps every full-weight doc") {
    val s = spark
    import s.implicits._
    val a = Relational7.t20(s, sf).collect().map(_.toSeq).toSet
    val b = Relational7.t20(s, sf).collect().map(_.toSeq).toSet
    assert(a == b, "hash-based sampling must be bit-reproducible")
    // u < 1 always, so weight-1.0 (unclustered) docs are all kept
    val full = Relational7.d10(s, sf).filter($"weight" === 1.0).count()
    val keptFull = Relational7.t20(s, sf).filter($"weight" === 1.0).count()
    assert(keptFull == full, "every unclustered doc must survive")
    // and the kept rows all satisfy the acceptance predicate (the
    // emitted u is rounded to 6 digits, so allow that rounding slack)
    assert(Relational7.t20(s, sf).filter($"u" >= $"weight" + 1e-6).isEmpty)
  }

  test("Lloyd iteration: total inertia is monotone non-increasing") {
    val s = spark
    val rounds = graft.operators.Similarity.lloydIterate(s, sf, 4)
      .orderBy("round").collect().map(_.getDouble(1)).toSeq
    assert(rounds.length == 4)
    rounds.zip(rounds.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: $rounds")
    }
    // and it actually improves over the seed assignment
    assert(rounds.last < rounds.head, s"no improvement: $rounds")
  }

  test("d11 equals d02's cross-parity subset with candidate/reference roles") {
    val s = spark
    import s.implicits._
    val cross = Relational7.d11(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromD02 = Dedup.d02(s, sf)
      .filter($"a_id" % 2 =!= $"b_id" % 2)
      .select(
        when($"a_id" % 2 === 1, $"a_id").otherwise($"b_id").as("cand_id"),
        when($"a_id" % 2 === 1, $"b_id").otherwise($"a_id").as("ref_id"),
        $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cross == fromD02,
      s"only-d11=${cross.diff(fromD02).take(3)} only-d02=${fromD02.diff(cross).take(3)}")
    // roles: candidates odd, references even
    assert(cross.forall { case (c, r, _) => c % 2 == 1 && r % 2 == 0 })
  }
}
