package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.pipeline.Sinks
import graft.functions.GroupedTopK
import graft.functions.GroupedTopK.Rec

/** Property-based invariants (SURVEY.md §5.3) — pure-JVM properties of
  * the imperative kernels, where randomized inputs catch what example
  * tests miss:
  *  - sink chunking/splitting preserves the object multiset for every
  *    size distribution and sink limit (the invariant the reference's
  *    recursion maintains at src/Datalake2Anomali.py:126-132);
  *  - the top-k aggregator is a homomorphism: any partition of the
  *    input reduces+merges to the same result as sort-take of the
  *    whole (exactly what distributed partial aggregation assumes).
  *
  * ScalaCheck is driven directly (no scalatest bridge in the offline
  * dependency set): a property passes iff `SCTest.check` reports so.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val objGen: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(0, 120).map(n => s"""{"pad":"${"x" * n}"}"""))

  test("chunking preserves order and multiset under any maxBytes") {
    check(Prop.forAll(objGen, Gen.chooseNum(64L, 512L)) { (objs, maxBytes) =>
      val chunks = Sinks.chunk(objs, maxBytes, overheadBytes = 16L)
      chunks.flatten == objs &&
        chunks.forall(c =>
          c.map(Sinks.utf8Len(_) + 1L).sum + 16L <= maxBytes || c.size == 1)
    })
  }

  test("recursive split: every object is delivered or surfaced as a failure") {
    check(Prop.forAll(objGen.suchThat(_.nonEmpty), Gen.chooseNum(40, 400)) {
      (objs, sinkLimit) =>
        val uploaded = scala.collection.mutable.ListBuffer[String]()
        val sink = new Sinks.IntelSink {
          def upload(p: String): Sinks.UploadResult =
            if (p.length > sinkLimit) Sinks.TooLarge
            else { uploaded += p; Sinks.Accepted }
        }
        val results = Sinks.uploadWithSplit(sink, "{}", objs)
        val delivered = uploaded.toList.flatMap(p =>
          "\\{\"pad\":\"x*\"\\}".r.findAllIn(p).toList)
        val failures = results.count {
          case Sinks.Accepted => false
          case _ => true
        }
        // multi-object TooLarge always splits, so each failure is one
        // single-object payload: counts must account for every object
        delivered.size + failures == objs.size &&
          // and when nothing fails, the multiset is preserved exactly
          (failures > 0 || delivered.sorted == objs.sorted)
    })
  }

  private val recGen: Gen[List[Rec]] = Gen.listOf(for {
    p <- Gen.chooseNum(0.0, 1000.0)
    o <- Gen.chooseNum(0L, 50L)
    l <- Gen.chooseNum(0, 7)
  } yield Rec(p, o, l))

  test("top-k aggregator equals sort-take under any partitioning") {
    val agg = GroupedTopK.TopK(3)
    check(Prop.forAll(recGen, Gen.chooseNum(0, 10)) { (recs, cut) =>
      val expected = recs.sorted(GroupedTopK.ord).take(3)
      val (l, r) = recs.splitAt(math.min(cut, recs.length))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged == expected
    })
  }

  private val wtermGen: Gen[List[GroupedTopK.WTerm]] = Gen.listOf(for {
    w <- Gen.chooseNum(0.0, 10.0)
    t <- Gen.alphaLowerStr.map(_.take(6))
  } yield GroupedTopK.WTerm(w, t))

  test("top-terms aggregator equals sort-take under any partitioning") {
    val agg = GroupedTopK.TopTerms(3)
    check(Prop.forAll(wtermGen, Gen.chooseNum(0, 10)) { (recs, cut) =>
      val expected = recs.sorted(GroupedTopK.wOrd).take(3)
      val (l, r) = recs.splitAt(math.min(cut, recs.length))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged == expected
    })
  }

  // ---- SpaceSaving heavy hitters ----

  private val streamGen: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const(1L),              // a planted frequent item
      3 -> Gen.chooseNum(2L, 6L),      // a mid-weight band
      2 -> Gen.chooseNum(100L, 200L))) // a long tail

  test("SpaceSaving bounds survive any two-way partitioning") {
    val agg = graft.functions.HeavyHitters.SpaceSaving(6)
    check(Prop.forAll(streamGen, Gen.chooseNum(0, 50)) { (xs, cut) =>
      val truth = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val (l, r) = xs.splitAt(math.min(cut, xs.length))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged.length <= 6 &&
        merged.forall { e =>
          val t = truth.getOrElse(e.item, 0L)
          t <= e.count && e.count - e.err <= t
        } &&
        // every item with true frequency > n/k must be reported
        truth.forall { case (item, t) =>
          t <= xs.length / 6 || merged.exists(_.item == item)
        }
    })
  }

  // ---- Winnowing fingerprints ----

  private val tokGen: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum('a', 'z').map(_.toString))

  /** Evaluate the kernel on one JVM row (it is a pure function). */
  private def winnow(tokens: Seq[String]): Set[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.NativeKernels.WinnowedFingerprints(
      Literal(tokens.mkString(" ")), 4, 4)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSet
  }

  test("winnowing guarantee: a shared w+k-1 token run ⇒ shared fingerprint") {
    val runGen = Gen.listOfN(7, Gen.chooseNum('a', 'z').map(_.toString))
    check(Prop.forAll(tokGen, tokGen, tokGen, runGen) { (p1, p2, p3, run) =>
      val d1 = p1 ++ run ++ p2
      val d2 = p3 ++ run
      winnow(d1).intersect(winnow(d2)).nonEmpty
    })
  }

  test("proxy URL parsing extracts host/port under any scheme/creds/path combo") {
    val hostGen = Gen.nonEmptyListOf(Gen.alphaLowerChar)
      .map(_.take(12).mkString)
    check(Prop.forAll(hostGen, Gen.chooseNum(1, 65535),
        Gen.oneOf(true, false), Gen.oneOf(true, false),
        Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (host, port, withScheme, withCreds, withPath, withPort) =>
        val url = (if (withScheme) "http://" else "") +
          (if (withCreds) "user:pa55wd@" else "") +
          host + (if (withPort) s":$port" else "") +
          (if (withPath) "/some/path" else "")
        val cfg = graft.pipeline.ConfigLoader.fromJson(
          s"""{"proxies": {"https": "$url"}}""")
        cfg.proxyHost.contains(host) &&
          cfg.proxyPort == (if (withPort) port else 3128)
    })
  }

  test("proxy parsing accepts underscore hostnames via the host:port fallback") {
    // RFC 3986 reg-names exclude '_' so java.net.URI yields host=null,
    // but docker-style internal proxies ("corp_proxy:3128") are real and
    // Python requests accepts them — the bare-authority fallback must too
    for ((url, host, port) <- Seq(
        ("corp_proxy:3128", "corp_proxy", 3128),
        ("http://corp_proxy:3128", "corp_proxy", 3128),
        ("my_internal_proxy", "my_internal_proxy", 3128),
        ("https://squid_01.internal:8080", "squid_01.internal", 8080))) {
      val cfg = graft.pipeline.ConfigLoader.fromJson(
        s"""{"proxies": {"https": "$url"}}""")
      assert(cfg.proxyHost.contains(host) && cfg.proxyPort == port,
        s"$url -> ${cfg.proxyHost}:${cfg.proxyPort}")
    }
    // entries with a path or userinfo do NOT get the fallback: still loud
    // ports out of TCP range (0, >65535, or beyond Int) are just as loud —
    // no bare NumberFormatException from toInt on an all-digit overflow
    for (bad <- Seq("http://corp_proxy:3128/path", "u:p@corp_proxy:9",
        "corp_proxy:notaport", "corp_proxy:99999999999",
        "corp_proxy:65536", "corp_proxy:0",
        // sign-prefixed ports are malformed even though
        // Integer.parseInt would accept the '+'
        "corp_proxy:+80", "corp_proxy:-80")) {
      intercept[IllegalArgumentException] {
        graft.pipeline.ConfigLoader.fromJson(
          s"""{"proxies": {"https": "$bad"}}""")
      }
    }
  }

  test("KMV sketch is mergeable: any partitioning yields the whole-input buffer") {
    val kmv = graft.functions.KMinValues.KMV(8)
    val hGen = Gen.listOf(Gen.chooseNum(0L, 1L << 60))
    check(Prop.forAll(hGen, hGen, hGen) { (p1, p2, p3) =>
      val whole = (p1 ++ p2 ++ p3).foldLeft(kmv.zero)(kmv.reduce)
      val merged = kmv.merge(kmv.merge(
        p1.foldLeft(kmv.zero)(kmv.reduce),
        p2.foldLeft(kmv.zero)(kmv.reduce)),
        p3.foldLeft(kmv.zero)(kmv.reduce))
      merged == whole &&
        whole == (p1 ++ p2 ++ p3).distinct.sorted.take(8)
    })
  }

  test("bottom-k sample is mergeable and equals sort-take under any partitioning") {
    val bk = graft.functions.Sampling.BottomK(8)
    val hvGen = Gen.listOf(for {
      h <- Gen.chooseNum(0L, 1L << 60)
      v <- Gen.chooseNum(-1000.0, 1000.0)
    } yield graft.functions.Sampling.HV(h, v))
    check(Prop.forAll(hvGen, hvGen, hvGen) { (p1, p2, p3) =>
      val whole = (p1 ++ p2 ++ p3).foldLeft(bk.zero)(bk.reduce)
      val merged = bk.merge(bk.merge(
        p1.foldLeft(bk.zero)(bk.reduce),
        p2.foldLeft(bk.zero)(bk.reduce)),
        p3.foldLeft(bk.zero)(bk.reduce))
      merged == whole &&
        whole == (p1 ++ p2 ++ p3).sorted(graft.functions.Sampling.ord).take(8) &&
        whole.length <= 8
    })
  }

  test("media codec: every writer round-trips through decode for arbitrary dims and payloads") {
    import graft.functions.MediaCodec
    val payloadGen = Gen.chooseNum(0, 2048)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)
    def payloadOf(bytes: Array[Byte], d: MediaCodec.Decoded): Seq[Byte] =
      bytes.slice(d.payloadOff, d.payloadOff + d.payloadLen).toSeq
    check(Prop.forAll(Gen.chooseNum(1, 5000), Gen.chooseNum(1, 5000), payloadGen) {
      (w, h, p) =>
        val d = MediaCodec.decode(MediaCodec.writePng(w, h, p))
        d.kind == "png" && d.width == w && d.height == h &&
          payloadOf(MediaCodec.writePng(w, h, p), d) == p.toSeq
    })
    check(Prop.forAll(Gen.chooseNum(1, 192000), Gen.chooseNum(1, 8), payloadGen) {
      (rate, ch, p) =>
        val d = MediaCodec.decode(MediaCodec.writeWav(rate, ch, p))
        d.kind == "wav" && d.width == rate && d.height == ch &&
          payloadOf(MediaCodec.writeWav(rate, ch, p), d) == p.toSeq
    })
    check(Prop.forAll(Gen.chooseNum(1, 5000), Gen.chooseNum(1, 5000),
      Gen.chooseNum(1, 100000), payloadGen) { (w, h, f, p) =>
        val d = MediaCodec.decode(MediaCodec.writeMp4(w, h, f, p))
        d.kind == "mp4" && d.width == w && d.height == h && d.frames == f &&
          payloadOf(MediaCodec.writeMp4(w, h, f, p), d) == p.toSeq
    })
  }

  test("winnowing selects a subset of the gram hashes, nonempty when grams exist") {
    check(Prop.forAll(tokGen) { toks =>
      val fps = winnow(toks)
      val grams = toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) fps.isEmpty
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val all = grams.map { g =>
          val hex = md.digest(g.getBytes("UTF-8")).map(b => f"$b%02x").mkString
          java.lang.Long.parseLong(hex.substring(0, 15), 16)
        }.toSet
        fps.nonEmpty && fps.subsetOf(all)
      }
    })
  }

  test("transition fold is chunk-associative: any consecutive split of a " +
      "user's sorted events emits the same transition sequence") {
    import graft.streaming.TransitionStream
    // events as (ts, event_id, type): ts/eid random, distinct eids make
    // the (ts, eid) order total — the batch e12 ordering contract
    val evGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 50L), Gen.chooseNum(0, 4).map(i => s"t$i")))
      .map(_.zipWithIndex.map { case ((ts, tp), i) => (ts, i.toLong, tp) })
    check(Prop.forAll(evGen, Gen.chooseNum(0, 6)) { (evs, nCuts) =>
      val sorted = evs.sortBy(r => (r._1, r._2))
      val whole = TransitionStream.advance(7L, None, sorted)._2
      // split into consecutive chunks at deterministic cut points
      val cuts = if (sorted.isEmpty) Seq(0)
        else (0 until nCuts).map(i => (i + 1) * sorted.length / (nCuts + 1))
      val bounds = (Seq(0) ++ cuts ++ Seq(sorted.length)).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => sorted.slice(a, b) }
      val (st, emitted) = chunks.foldLeft(
        (Option.empty[graft.streaming.LastEvent],
          Vector.empty[graft.streaming.TransRow])) {
        case ((prev, acc), chunk) =>
          val (next, out) = TransitionStream.advance(7L, prev, chunk)
          (next, acc ++ out)
      }
      emitted == whole &&
        st.map(_.event_id) == sorted.lastOption.map(_._2)
    })
  }
}
