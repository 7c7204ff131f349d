package graft

import graft.pipeline.ConfigLoader
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends SparkSpec {

  test("native kernels are callable from SQL after install") {
    GraftExtensions.install(spark)
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT vec_dot(embedding, embedding) AS sq, hash64(CAST(vec_id AS STRING)) AS h,
        |       size(word_shingles_3('a b c d')) AS nsh,
        |       simhash_32(word_tokens('hello world')) AS sh,
        |       element_at(minhash_sig_16(word_shingles_3('a b c d e')), 1) AS mh0,
        |       size(winnow_fp_4_4('a b c d e f g h i j')) AS nfp
        |FROM embeddings LIMIT 1""".stripMargin).head()
    assert(r.getDouble(0) > 0)
    assert(r.getLong(1) > 0)
    assert(r.getInt(2) == 2)
    assert(r.getLong(4) > 0)
    assert(r.getInt(5) >= 1 && r.getInt(5) <= 4, "10 tokens → 7 grams → ≤4 minima")
  }

  test("vec_sqdist kernels are bit-equal to the composed HOF folds") {
    // r17: the integer-Lloyd / ADC / rerank hot paths swapped their
    // aggregate(zip_with(...)) distance folds for the fused codegen
    // kernels — this pins the swap to exact equality on real vectors
    // (long arithmetic exactly, double arithmetic to the bit: same
    // left-to-right (x−y)² accumulation)
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.NativeKernels.{vec_sqdist, vec_sqdist_l}
    val e = Tables.load(spark, sf, "embeddings").select($"vec_id", $"embedding")
    val pairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .limit(500)
      .select($"a.embedding".as("ea"), $"b.embedding".as("eb"))
      .select($"ea", $"eb",
        transform($"ea", x => round(x.cast("double") * 1048576L).cast("long")).as("qa"),
        transform($"eb", x => round(x.cast("double") * 1048576L).cast("long")).as("qb"))
    val checked = pairs.select(
      (vec_sqdist_l($"qa", $"qb") ===
        aggregate(zip_with($"qa", $"qb", (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, d) => acc + d)).as("okL"),
      (vec_sqdist($"ea", $"eb") ===
        aggregate(zip_with($"ea", $"eb", (x, y) =>
            (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, d) => acc + d)).as("okD"))
    val bad = checked.filter(!$"okL" || !$"okD").count()
    assert(bad == 0, s"$bad pairs diverge from the HOF folds")
  }

  test("graft_topk3 SQL UDAF matches the window top-3") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.install(spark)
    Tables.load(spark, sf, "lineitem").createOrReplaceTempView("li_topk")
    val viaSql = spark.sql(
      """SELECT l_returnflag, t.price, t.orderkey, t.linenumber
        |FROM (SELECT l_returnflag,
        |        graft_topk3(l_extendedprice, l_orderkey, l_linenumber) AS top
        |      FROM li_topk GROUP BY l_returnflag)
        |LATERAL VIEW explode(top) AS t""".stripMargin)
      .select($"l_returnflag", round($"price", 2).as("price"), $"orderkey",
        $"linenumber".cast("long").as("linenumber"))
    val viaWindow = graft.operators.Relational4.q34(spark, sf)
      .select($"l_returnflag", $"price", $"orderkey", $"linenumber")
    assert(viaSql.except(viaWindow).isEmpty && viaWindow.except(viaSql).isEmpty)
  }

  test("sketch UDAFs (KMV / bottom-k / top-docs) run from SQL and match " +
      "their DataFrame faces") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.install(spark)
    Tables.load(spark, sf, "events").createOrReplaceTempView("ev_sketch")
    // KMV: k smallest hashes per type — compare the k-th min against a
    // direct sort of the same hashes
    val viaSql = spark.sql(
      """SELECT event_type, element_at(ks, -1) AS kth, size(ks) AS n
        |FROM (SELECT event_type,
        |        graft_kmv128(hash64(concat('kmv:', CAST(user_id AS STRING)))) AS ks
        |      FROM ev_sketch GROUP BY event_type)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Tables.load(spark, sf, "events")
      .select($"event_type",
        graft.functions.TextOps.hash64(
          concat(lit("kmv:"), $"user_id".cast("string"))).as("h"))
      .distinct()
      .groupBy($"event_type")
      .agg(sort_array(collect_set($"h")).as("hs"))
      .select($"event_type",
        element_at(slice($"hs", 1, 128), -1).as("kth"),
        least(size($"hs"), lit(128)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaSql == direct, "SQL KMV diverged from the direct bottom-128")
    // bottom-k sample: the sampled hash set is the direct bottom-128
    val bkSql = spark.sql(
      """SELECT event_type, transform(sample, x -> x.h) AS hs
        |FROM (SELECT event_type,
        |        graft_bottomk128(hash64(concat('x08:', CAST(event_id AS STRING))),
        |                         value) AS sample
        |      FROM ev_sketch GROUP BY event_type)""".stripMargin)
      .collect().map(r => (r.getString(0),
        r.getSeq[Long](1).toVector)).toMap
    bkSql.values.foreach(hs => assert(hs == hs.sorted && hs.length <= 128))
    // top-docs: rides the same bounded buffer the t38/e11 queries use
    val tdSql = spark.sql(
      """SELECT event_type, size(graft_topdocs10(value * 1000, event_id, 0L, 0L)) AS n
        |FROM ev_sketch GROUP BY event_type""".stripMargin)
    tdSql.collect().foreach(r => assert(r.getInt(1) <= 10 && r.getInt(1) > 0))
  }

  test("SQL vec_dot equals DataFrame vec_dot") {
    GraftExtensions.install(spark)
    Tables.registerAll(spark, sf)
    import graft.functions.NativeKernels.vec_dot
    val s = spark
    import s.implicits._
    val viaSql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM embeddings ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaDf = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", vec_dot($"embedding", $"embedding").as("d"))
      .orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("vec_dot_q: codegen path equals the JVM reference fold on random inputs") {
    val s = spark
    import s.implicits._
    import graft.functions.NativeKernels.vec_dot_q
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(64)
      val signs = Array.fill(n)(if (rnd.nextBoolean()) 1L else -1L)
      // include negatives, near-half-boundary values, and magnitudes
      // around the embedding scale
      val vals = Array.fill(n)((rnd.nextFloat() - 0.5f) * 4.0f)
      (i.toLong, signs, vals)
    }
    def ref(signs: Array[Long], vals: Array[Float], scale: Int): Long =
      signs.zip(vals).map { case (w, x) =>
        w * math.floor(x.toDouble * scale + 0.5).toLong }.sum
    val got = rows.toDF("id", "signs", "vals")
      .select($"id", vec_dot_q($"signs", $"vals", 10000).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, signs, vals) =>
      assert(got(id) == ref(signs, vals, 10000),
        s"kernel/reference mismatch at row $id")
    }
    // ragged inputs truncate to the shorter length, like vec_dot
    val ragged = Seq((1L, Array(1L, -1L, 1L), Array(2.0f, 3.0f)))
      .toDF("id", "signs", "vals")
      .select(vec_dot_q($"signs", $"vals", 10).as("fp")).head().getLong(0)
    assert(ragged == 20L - 30L)
  }

  test("config loader: reference defaults + overrides + query list") {
    val cfg = ConfigLoader.fromJson(
      """{"anomali_classification": "public", "tags_tlp": "red",
        | "anomali_expiration_period": 3, "add_dtl_tags": true,
        | "default_itype": {"srcip": "bot_ip"},
        | "datalake_queries": [
        |   {"query_hash": "abc", "dataset_name": "ds", "anomali_severity": "high",
        |    "anomali_itype": {"srcip": "c2_ip"}},
        |   {"dataset_name": "broken"}]}""".stripMargin)
    assert(cfg.anomaliClassification == "public")
    assert(cfg.tagsTlp == "red")
    assert(cfg.expirationHours == 3)
    assert(cfg.addDtlTags)
    assert(cfg.defaultItype == Map("srcip" -> "bot_ip"))
    assert(cfg.datalakeQueries.length == 2)
    assert(cfg.datalakeQueries.head.anomali_itype == Map("srcip" -> "c2_ip"))
    assert(cfg.datalakeQueries(1).query_hash == null) // F1 drops it later
    val dflt = ConfigLoader.fromJson("{}")
    assert(dflt.expirationHours == 1 && dflt.tagsTlp == "white" &&
      dflt.defaultItype("md5") == "mal_md5")
  }
}

/** Randomized property tests for the invariants SURVEY §5.3 calls out
  * (seeded, 300 cases each — scalacheck's bridge artifact isn't in the
  * offline cache, so the loops are hand-rolled). */
class SinkPropertiesSpec extends AnyFunSuite {
  import graft.pipeline.Sinks

  private val rnd = new scala.util.Random(42)

  test("chunking preserves the multiset and respects the bound (randomized)") {
    (1 to 300).foreach { _ =>
      val objs = List.fill(rnd.nextInt(60))("x" * (2 + rnd.nextInt(200)))
      val maxBytes = 10L + rnd.nextInt(2000)
      val overhead = rnd.nextInt(100).toLong
      val chunks = Sinks.chunk(objs, maxBytes, overhead)
      assert(chunks.flatten == objs, "multiset/order broken")
      assert(chunks.forall(c =>
        c.map(_.length + 1L).sum + overhead <= maxBytes || c.size == 1),
        s"oversized multi-object chunk (max=$maxBytes overhead=$overhead)")
      assert(chunks.forall(_.nonEmpty))
    }
  }

  test("recursive halving: accepted + failed objects == input (randomized)") {
    (1 to 300).foreach { _ =>
      val objs = List.fill(1 + rnd.nextInt(40))("o" * (1 + rnd.nextInt(80)))
      val limit = 5 + rnd.nextInt(500)
      val uploaded = scala.collection.mutable.ListBuffer[String]()
      val sink = new Sinks.IntelSink {
        def upload(p: String): Sinks.UploadResult =
          if (p.length > limit) Sinks.TooLarge
          else { uploaded += p; Sinks.Accepted }
      }
      val results = Sinks.uploadWithSplit(sink, "{}", objs)
      // count objects inside the array only (the key "objects" itself
      // contains an 'o')
      val okObjs = uploaded.flatMap { p =>
        val body = p.substring(p.indexOf("\"objects\":[") + 11, p.length - 2)
        "o+".r.findAllIn(body).toList
      }.toList
      // a non-Accepted terminal result is always a single-object payload
      val failed = results.count(_ != Sinks.Accepted)
      assert(okObjs.size + failed == objs.size,
        s"objects lost/duplicated: ok=${okObjs.size} failed=$failed in=${objs.size}")
      assert(okObjs.sorted == {
        // accepted multiset must be a sub-multiset of the input
        val in = objs.groupBy(identity).view.mapValues(_.size).toMap
        assert(okObjs.groupBy(identity).forall { case (o, os) => os.size <= in.getOrElse(o, 0) })
        okObjs.sorted
      })
    }
  }
}
