package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextOps.{hash64, sqlHash64}
import graft.functions.NativeKernels.word_tokens

/** Eighteenth tranche — evaluation and graph-structure shapes:
  *
  *  - t44: RETRIEVAL RANKING METRICS (hits, MRR, nDCG) over the t38
  *    BM25 ranking — the eval harness a retrieval stack runs before
  *    trusting an index at 100 TB. Deciding "is this index good
  *    enough to serve" is itself a pipeline stage (TREC-style
  *    qrels → per-query metrics), and the engine computes it from
  *    the ranked table in one small aggregate;
  *  - s18: TRIANGLE COUNT + global clustering coefficient over the
  *    t41 word co-occurrence graph via DEGREE-ORDERED edge
  *    orientation (Chiba–Nishizeki / the MapReduce formulation of
  *    Suri & Vassilvitskii 2011) — wedge checks bounded by O(m^1.5)
  *    regardless of skew, the structure signal (how clustered is
  *    this corpus' co-occurrence graph) next to t41's centrality.
  *
  * The reference ships neither (IOC ETL bridge,
  * `/root/reference/src/Datalake2Anomali.py:1-449`); they extend the
  * SURVEY §7.2 retrieval/graph tiers alongside tranches 1-17.
  */
object Relational18 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---- t44: retrieval ranking metrics ------------------------------

  /** Integer discount weights W(r) = ⌊10⁶ / log2(r + 1)⌋ for ranks
    * 1..5 — PRECOMPUTED LITERALS shared verbatim by the Spark plan
    * and the generated oracle SQL, so no engine ever evaluates a
    * logarithm (the t32/s09 fixed-point discipline applied to nDCG:
    * a float log2 plus round() would gate the hash on ulp agreement
    * between two math libraries). */
  private[graft] val NDCG_W = Seq(1000000L, 630929L, 500000L, 430676L, 386852L)

  /** Graded relevance for (query-term, doc): `hash64(term#doc) % 4`
    * ∈ {0..3} — synthetic-but-deterministic qrels (the fixture
    * convention: the METRIC machinery is the operator under test;
    * a real deployment swaps in a judged qrels table without
    * touching the plan shape). Gain is the standard 2^rel − 1. */
  private def rel(term: Column, doc: Column): Column =
    pmod(hash64(concat(term, lit("#"), doc.cast("string"))), lit(4L))

  /** Per-query ranking quality of the t38 BM25 top-5: relevant hits,
    * MRR, and graded nDCG@5, all in exact integer fixed point
    * (`rr_ppm` = ⌊10⁶/first-relevant-rank⌋, `ndcg_ppm` =
    * ⌊10⁶·DCG/IDCG⌋ with the [[NDCG_W]] literal discounts; IDCG
    * re-ranks the retrieved pool by gain — the within-list nDCG
    * variant, so the metric scores ORDERING quality and is
    * computable without a corpus-wide relevant-set scan). One extra
    * aggregate + two ≤5-row-per-query windows on top of the ranked
    * table: at 100 TB evaluation costs what the ranking it audits
    * costs, nothing more. */
  def t44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ranked = Relational12.t38(s, dir)
      .select($"term", $"doc_id", $"rank")
      .withColumn("rel", rel($"term", $"doc_id"))
      // 2^rel − 1 as a literal lookup (same table as the oracle CASE)
      .withColumn("gain", element_at(
        array(lit(0L), lit(1L), lit(3L), lit(7L)), ($"rel" + 1).cast("int")))
    val w = array(NDCG_W.map(lit): _*)
    val ideal = Window.partitionBy($"term")
      .orderBy($"gain".desc, $"doc_id")
    ranked
      .withColumn("w", element_at(w, $"rank".cast("int")))
      .withColumn("iw", element_at(w, row_number().over(ideal)))
      .groupBy($"term")
      .agg(
        sum(when($"rel" > 0, 1L).otherwise(0L)).as("n_rel"),
        coalesce(max(when($"rel" > 0, expr("1000000 div rank"))), lit(0L))
          .as("rr_ppm"),
        sum($"gain" * $"w").as("dcg"),
        sum($"gain" * $"iw").as("idcg"))
      .withColumn("ndcg_ppm",
        when($"idcg" > 0, expr("(dcg * 1000000) div idcg")).otherwise(0L))
      .orderBy($"term")
  }

  private lazy val t44Oracle = {
    val wCase = NDCG_W.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ")
    s"""WITH base AS (${Relational12.t38Oracle}),
       |g AS (SELECT term, doc_id, rank,
       |    ${sqlHash64("concat(term, '#', CAST(doc_id AS VARCHAR))")} % 4
       |      AS rel
       |  FROM base),
       |g2 AS (SELECT term, doc_id, rank, rel,
       |    CAST(CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
       |      ELSE 7 END AS BIGINT) AS gain,
       |    CAST(CASE rank $wCase END AS BIGINT) AS w
       |  FROM g),
       |g3 AS (SELECT *, CAST(CASE row_number() OVER (PARTITION BY term
       |      ORDER BY gain DESC, doc_id) $wCase END AS BIGINT) AS iw
       |  FROM g2)
       |SELECT term,
       |  CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
       |  CAST(coalesce(max(CASE WHEN rel > 0 THEN 1000000 // rank END), 0)
       |    AS BIGINT) AS rr_ppm,
       |  CAST(sum(gain * w) AS BIGINT) AS dcg,
       |  CAST(sum(gain * iw) AS BIGINT) AS idcg,
       |  CAST(CASE WHEN sum(gain * iw) > 0
       |    THEN (sum(gain * w) * 1000000) // sum(gain * iw)
       |    ELSE 0 END AS BIGINT) AS ndcg_ppm
       |FROM g3 GROUP BY term ORDER BY term""".stripMargin
  }

  // ---- s18: triangle count via degree-ordered orientation ----------

  private val TRI_MIN_SUPPORT = 5L

  /** Triangle count and global clustering coefficient of the word
    * co-occurrence graph (nodes = words, undirected edges = t41's
    * support-≥[[TRI_MIN_SUPPORT]] corpus bigrams, self-loops
    * dropped).
    *
    * The naive adjacency self-join explodes on hubs (a stop-word
    * co-occurring with half the vocabulary contributes deg² wedge
    * candidates). Degree-ordered ORIENTATION is the classic fix:
    * orient every edge from the (degree, id)-smaller endpoint to the
    * larger, so out-degree is bounded by O(√m) for EVERY node —
    * including hubs — and each triangle is generated exactly once as
    * a wedge at its smallest vertex plus one closing-edge hash
    * lookup: O(m^1.5) wedge checks total, independent of skew. The
    * same orientation trick is what keeps the d02/m05 bucket family
    * sub-quadratic: bound the per-key fan-out structurally, then
    * join.
    *
    * Output is one row of exact integers: nodes, edges, wedges
    * (Σ deg·(deg−1)/2), triangles, and the global clustering
    * coefficient ⌊10⁶·3Δ/wedges⌋ in ppm (single integer division —
    * no float gate). The oracle restates the whole derivation from
    * the raw bigrams in SQL.
    *
    * At 100 TB: the graph is vocabulary-sized (the t41 argument), the
    * corpus appears only in the one bigram count; on a graph that is
    * ITSELF huge the plan still holds — degree table, orientation,
    * and the two joins are all equi-joins on node/edge keys, and the
    * ordinal rank is the windowless [[RankOps.globalOrdinal]] (range
    * exchange + zipWithIndex — any strictly monotone total-order
    * ordinal orients identically, so the 0-based index replaces
    * row_number with no single-partition sort even at billion-node
    * scale). */
  def s18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = greatest(size($"tk") - 1, lit(0))
    val und = t(s, dir, "documents")
      .select(word_tokens($"text").as("tk"))
      .select(explode_outer(zip_with(
        slice($"tk", lit(1), n1), slice($"tk", lit(2), n1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .filter($"p".isNotNull)
      .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= TRI_MIN_SUPPORT)
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint() // 3 consumers (deg ×2 via union, wedges) — the t43 lesson
    val deg = und.select($"u".as("w")).unionAll(und.select($"v".as("w")))
      .groupBy($"w").agg(count(lit(1)).as("deg"))
    // total order on nodes: (degree, word) rank — hubs sort LAST so
    // orientation points into them, never out of them; windowless
    // ordinal (range exchange + zipWithIndex), no single-partition sort
    val ord = RankOps.globalOrdinal(deg, Seq($"deg".asc, $"w".asc), "ord")
    val o = und
      .join(ord.select($"w".as("u"), $"ord".as("ou")), Seq("u"))
      .join(ord.select($"w".as("v"), $"ord".as("ov")), Seq("v"))
      .select(least($"ou", $"ov").as("src"), greatest($"ou", $"ov").as("dst"))
    val wedges = o.as("e1").join(o.as("e2"), Seq("src"))
      .filter($"e1.dst" < $"e2.dst")
      .select($"e1.dst".as("src"), $"e2.dst".as("dst"))
    val tri = wedges.join(o, Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_tri"))
    val gstats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum((deg * (deg - 1)) div 2)").as("n_wedges"))
    gstats.crossJoin(tri)
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_tri",
        when($"n_wedges" > 0, expr("(3 * n_tri * 1000000) div n_wedges"))
          .otherwise(0L).as("gcc_ppm"))
  }

  private val s18Oracle =
    s"""WITH d AS (SELECT ${graft.functions.TextOps.sqlTokens("text")} AS tk
       |  FROM documents),
       |big AS (SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS n_ab
       |  FROM (SELECT unnest([{'a': tk[i], 'b': tk[i+1]}
       |      for i in range(1, len(tk))]) AS p FROM d)
       |  GROUP BY p.a, p.b),
       |und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |  FROM big WHERE n_ab >= $TRI_MIN_SUPPORT AND a <> b),
       |deg AS (SELECT w, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS w FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY w),
       |ord AS (SELECT w, deg,
       |    CAST(row_number() OVER (ORDER BY deg, w) AS BIGINT) AS ord
       |  FROM deg),
       |o AS (SELECT least(ou.ord, ov.ord) AS src,
       |    greatest(ou.ord, ov.ord) AS dst
       |  FROM und JOIN ord ou ON ou.w = und.u JOIN ord ov ON ov.w = und.v),
       |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_tri
       |  FROM (SELECT e1.dst AS src, e2.dst AS dst
       |      FROM o e1 JOIN o e2 USING (src) WHERE e1.dst < e2.dst) wd
       |  WHERE EXISTS (SELECT 1 FROM o
       |    WHERE o.src = wd.src AND o.dst = wd.dst)),
       |g AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(deg) // 2 AS BIGINT) AS n_edges,
       |    CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
       |  FROM deg)
       |SELECT n_nodes, n_edges, n_wedges, n_tri,
       |  CAST(CASE WHEN n_wedges > 0
       |    THEN (3 * n_tri * 1000000) // n_wedges
       |    ELSE 0 END AS BIGINT) AS gcc_ppm
       |FROM g CROSS JOIN tri""".stripMargin

  // ---- x10: mergeable quantile-sketch shards -----------------------

  private val X10_K = 128

  /** Per-event-type value quantiles computed by MERGING per-(type,
    * DAY) BottomK sketch states — x09's sketch-table pattern applied
    * to quantiles: the event rows are touched once (the day sharding
    * pass, ~31 shards per type on this corpus — `n_days` rides in
    * the output so the shard structure is itself oracle-checked),
    * after which any rollup period re-aggregates k-row sketch
    * states. The merge operator IS the sketch aggregator re-applied
    * (bottom-k of a union of bottom-k's equals bottom-k of the union
    * — the property-tested [[graft.functions.Sampling.BottomK]]
    * algebra), so the oracle states the result DIRECTLY over each
    * type's raw rows: same fixed salt hash, same k, same lower order
    * statistic — the hash compare PROVES merge ≡ direct, no
    * error-bound trick needed (the x08 determinism argument,
    * surviving a shard-merge round trip). Every output value appears
    * verbatim in the input; no rounding gate anywhere.
    *
    * At 100 TB: day states are k·(hash, value) rows — a sketch TABLE
    * maintained incrementally (the x05/x08 bounded-buffer shape); a
    * month-to-date or trailing-90-day quantile is a merge over ≤ 90
    * such states, never a rescan. */
  def x10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select(
      $"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
      hash64(concat(lit("x10:"), $"event_id".cast("string"))).as("h"),
      $"value")
    val bk = udaf(graft.functions.Sampling.BottomK(X10_K))
    val shards = ev.groupBy($"event_type", $"day")
      .agg(bk($"h", $"value").as("sample"))
    val merged = shards
      .select($"event_type", $"day", explode($"sample").as("s"))
      .groupBy($"event_type")
      .agg(countDistinct($"day").as("n_days"),
        bk($"s.h", $"s.v").as("sample"))
      .select($"event_type", $"n_days",
        array_sort(transform($"sample", x => x.getField("v"))).as("vals"))
    def sidx(q: Double) =
      (floor((size($"vals") - 1).cast("double") * lit(q)) + 1).cast("int")
    merged.select($"event_type", $"n_days",
        size($"vals").cast("long").as("n_sample"),
        element_at($"vals", sidx(0.5)).as("p50_est"),
        element_at($"vals", sidx(0.9)).as("p90_est"),
        element_at($"vals", sidx(0.99)).as("p99_est"))
      .orderBy($"event_type")
  }

  private val x10Oracle =
    s"""WITH ev AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       |    ${sqlHash64("concat('x10:', CAST(event_id AS VARCHAR))")} AS h,
       |    value
       |  FROM events),
       |sk AS (SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY h, value) AS hrn
       |  FROM ev),
       |nd AS (SELECT event_type,
       |    CAST(count(DISTINCT day) AS BIGINT) AS n_days
       |  FROM ev GROUP BY event_type),
       |samp AS (SELECT event_type, list_sort(list(value)) AS vals
       |  FROM sk WHERE hrn <= $X10_K GROUP BY event_type)
       |SELECT samp.event_type, n_days, CAST(len(vals) AS BIGINT) AS n_sample,
       |  vals[CAST(floor((len(vals)-1)*0.5) AS INT)+1] AS p50_est,
       |  vals[CAST(floor((len(vals)-1)*0.9) AS INT)+1] AS p90_est,
       |  vals[CAST(floor((len(vals)-1)*0.99) AS INT)+1] AS p99_est
       |FROM samp JOIN nd ON samp.event_type = nd.event_type
       |ORDER BY samp.event_type""".stripMargin

  // ---- e14: multi-touch attribution --------------------------------

  private val ATTR_LOOKBACK_US = 120L * 60 * 1000000 // 120 min
  private val TOUCHES = Seq("click", "view", "signup")

  /** First- and last-touch conversion attribution: every `purchase`
    * credits the earliest and the latest TOUCH event (click / view /
    * signup — errors never earn credit) in the strictly-preceding
    * 120-minute RANGE frame of its user's timeline, falling back to
    * the 'none' channel when the window holds no touch. Output per
    * channel: last-touch conversions + attributed cents, first-touch
    * conversions — the two classic credit models from ONE window
    * pass (the marketing-analytics face of the event tier, next to
    * e06's funnel and e13's guarded CEP).
    *
    * Shape: one per-user window ordered by event-time micros with a
    * VALUE-based frame (`rangeBetween(−lookback, −1)` — the q37
    * machinery), so credit assignment is per-row state in the window
    * buffer, never a per-purchase self-join; the touch extrema are
    * min/max over a (ts, event_id, channel) struct, making ties at
    * equal micros deterministic by event id in both engines
    * (lexicographic struct comparison — the a01 as-of convention).
    * The two channel aggregates after the window are #channels-sized.
    * At 100 TB this is the w04/e06 economics: one user_id shuffle,
    * then tiny frames. */
  def e14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsus")
      .rangeBetween(-ATTR_LOOKBACK_US, -1)
    val touch = when($"event_type".isin(TOUCHES: _*),
      struct($"tsus".as("ts"), $"event_id".as("id"),
        $"event_type".as("ch")))
    // each purchase explodes into its two credit rows (model,
    // channel, cents), so BOTH models fall out of ONE channel
    // aggregate over ONE window pass — the naive two-groupBy form
    // re-evaluated the user window per model (two user_id exchanges,
    // no ReusedExchange across the differing aliases; caught by
    // `PlanAudit exec:`, the t43 lesson)
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("tsus"))
      .withColumn("lt", max(touch).over(w))
      .withColumn("ft", min(touch).over(w))
      .filter($"event_type" === "purchase")
      .select(explode(array(
        struct(lit("last").as("m"),
          coalesce($"lt.ch", lit("none")).as("channel"),
          round($"value" * 100).cast("long").as("cents")),
        struct(lit("first").as("m"),
          coalesce($"ft.ch", lit("none")).as("channel"),
          lit(0L).as("cents")))).as("r"))
      .groupBy($"r.channel".as("channel"))
      .agg(
        sum(when($"r.m" === "last", 1L).otherwise(0L)).as("n_last"),
        sum(when($"r.m" === "last", $"r.cents").otherwise(0L))
          .as("cents_last"),
        sum(when($"r.m" === "first", 1L).otherwise(0L)).as("n_first"))
      .orderBy($"channel")
  }

  private val e14Oracle =
    s"""WITH ev AS (SELECT user_id, event_id, event_type, value,
       |    epoch_us(ts) AS tsus FROM events),
       |t AS (SELECT *,
       |    max(CASE WHEN event_type IN ('click', 'view', 'signup')
       |      THEN struct_pack(ts := tsus, id := event_id,
       |        ch := event_type) END)
       |      OVER (PARTITION BY user_id ORDER BY tsus
       |        RANGE BETWEEN $ATTR_LOOKBACK_US PRECEDING
       |        AND 1 PRECEDING) AS lt,
       |    min(CASE WHEN event_type IN ('click', 'view', 'signup')
       |      THEN struct_pack(ts := tsus, id := event_id,
       |        ch := event_type) END)
       |      OVER (PARTITION BY user_id ORDER BY tsus
       |        RANGE BETWEEN $ATTR_LOOKBACK_US PRECEDING
       |        AND 1 PRECEDING) AS ft
       |  FROM ev),
       |p AS (SELECT coalesce(lt.ch, 'none') AS last_ch,
       |    coalesce(ft.ch, 'none') AS first_ch,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM t WHERE event_type = 'purchase'),
       |l AS (SELECT last_ch AS channel, CAST(count(*) AS BIGINT) AS n_last,
       |    CAST(sum(cents) AS BIGINT) AS cents_last
       |  FROM p GROUP BY last_ch),
       |f AS (SELECT first_ch AS channel, CAST(count(*) AS BIGINT) AS n_first
       |  FROM p GROUP BY first_ch)
       |SELECT channel, coalesce(n_last, 0) AS n_last,
       |  coalesce(cents_last, 0) AS cents_last,
       |  coalesce(n_first, 0) AS n_first
       |FROM l FULL OUTER JOIN f USING (channel)
       |ORDER BY channel""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t44_ranking_metrics" -> (t44 _),
    "s18_triangle_count" -> (s18 _),
    "x10_quantile_shards" -> (x10 _),
    "e14_touch_attribution" -> (e14 _),
  )

  val oracles: Map[String, String] = Map(
    "t44_ranking_metrics" -> t44Oracle,
    "s18_triangle_count" -> s18Oracle,
    "x10_quantile_shards" -> x10Oracle,
    "e14_touch_attribution" -> e14Oracle,
  )
}
