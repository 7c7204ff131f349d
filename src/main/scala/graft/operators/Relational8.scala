package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextOps.{hash64, sqlHash64, sqlTokens}
import graft.functions.NativeKernels.{word_tokens, word_shingles}

/** Eighth tranche — product-analytics shapes over the event stream and
  * the corpus-statistics steps a data-mixture decision needs, each
  * oracle-checked:
  *
  *  - e06: ordered conversion funnel (view → click → purchase with
  *    strictly increasing per-user stage timestamps — the sequential-
  *    pattern shape every product pipeline runs);
  *  - e07: retention cohorts (users grouped by first-activity day,
  *    activity counted per day offset);
  *  - t23: temperature-scaled source mixture weights (multilingual-
  *    style alpha-sampling at α = 0.5: upsample small sources by
  *    √p, the data-mixture knob for training runs);
  *  - t24: cross-corpus shingle novelty (per incoming doc, the
  *    fraction of its shingles unseen in the frozen reference corpus
  *    — d11's per-document score face; high novelty = genuinely new
  *    content, low = paraphrase-grade duplication);
  *  - t25: lexical diversity per source (type-token ratio + hapax
  *    rate — the vocabulary-health quality signal);
  *  - d13: duplicate-chunk detection over t17's sliding-window chunks
  *    (exact substring dedup at chunk granularity — the Lee et al.
  *    2022 ExactSubstr shape at fixed alignment);
  *  - q52: global decile statistics over per-doc token counts (ntile
  *    — the length-distribution report a packing config reads);
  *  - s08: one quantized-mean k-means update + full reassignment
  *    (the SemDeDup-style cluster-membership table downstream
  *    cluster-balanced sampling joins against);
  *  - x05: KMV distinct sketch — deterministic given the fixed hash,
  *    so the ONLY sketch in the suite that hash-matches a DuckDB
  *    oracle exactly (estimate + exact + relative error);
  *  - t26: effective token mass per source under d10 soft-dedup
  *    weights (the post-dedup input to a t23 mixture decision);
  *  - t27: Zipf rank-frequency fit per source (power-law
  *    vocabulary-health check).
  */
object Relational8 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Ordered funnel: first view, then first click strictly after it,
    * then first purchase strictly after that click — per user, then
    * aggregated to per-stage user counts and mean stage-to-stage
    * latency.
    *
    * Scale: three filtered aggregates and two joins, ALL keyed on
    * user_id — one shuffle partitioning reused end-to-end (AQE sees
    * identical keys; no re-shuffle between stages), then three
    * scalar aggregates. No window over the full event stream, no
    * per-event state: the min-timestamp formulation is associative,
    * so map-side partial aggregation does most of the work before
    * the exchange. */
  def e06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("tv"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"tv")
      .groupBy($"user_id").agg(min($"ts").as("tc"), min($"tv").as("tv"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"tc")
      .groupBy($"user_id").agg(min($"ts").as("tp"), min($"tc").as("tc"))
    val s1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), $"n_users",
        lit(0.0).as("avg_lag_sec"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
        round(avg($"tc".cast("long") - $"tv".cast("long")), 2).as("avg_lag_sec"))
      .select(lit("2_click").as("stage"), $"n_users", $"avg_lag_sec")
    val s3 = p.agg(count(lit(1)).as("n_users"),
        round(avg($"tp".cast("long") - $"tc".cast("long")), 2).as("avg_lag_sec"))
      .select(lit("3_purchase").as("stage"), $"n_users", $"avg_lag_sec")
    s1.union(s2).union(s3).orderBy($"stage")
  }

  // timestamp→long cast truncates to whole seconds exactly like
  // DuckDB date_diff('second', …) counts second boundaries, so the
  // per-user lags are exact integers and their mean is deterministic
  private val e06Oracle =
    """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS tc, min(v.tv) AS tv
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS tp, min(c.tc) AS tc
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
      |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users,
      |  0.0 AS avg_lag_sec FROM v
      |UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT),
      |  round(avg(date_diff('second', tv, tc)), 2) FROM c
      |UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT),
      |  round(avg(date_diff('second', tc, tp)), 2) FROM p
      |ORDER BY stage""".stripMargin

  private val E07_DAYS = 7

  /** Retention cohorts: users bucketed by first-activity day; for
    * each cohort and day offset 0..[[E07_DAYS]], how many cohort
    * members were active. Two aggregates + one user-keyed join —
    * the same single-shuffle-key shape as e06; the distinct-user
    * count shuffles (cohort_day, day_offset, user) once, which at
    * 100 TB is the standard two-phase count-distinct (partial
    * dedup map-side first). */
  def e07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val coh = e.groupBy($"user_id")
      .agg(date_trunc("day", min($"ts")).as("cohort_day"))
    e.join(coh, "user_id")
      .select($"cohort_day", $"user_id",
        datediff(to_date($"ts"), to_date($"cohort_day")).cast("long").as("day_offset"))
      .filter($"day_offset" <= E07_DAYS)
      .groupBy($"cohort_day", $"day_offset")
      .agg(countDistinct($"user_id").cast("long").as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  private val e07Oracle =
    s"""WITH coh AS (SELECT user_id,
       |  CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
       |  FROM events GROUP BY user_id)
       |SELECT cohort_day,
       |  CAST(date_diff('day', CAST(cohort_day AS DATE), CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
       |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
       |FROM events e JOIN coh USING (user_id)
       |WHERE date_diff('day', CAST(cohort_day AS DATE), CAST(e.ts AS DATE)) <= $E07_DAYS
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Temperature-scaled source mixture at α = 0.5: each source's
    * sampling share q_i ∝ √p_i (p_i = its share of corpus tokens),
    * `boost` = q_i/p_i — the factor by which small sources are
    * upsampled (multilingual training's standard mixture knob;
    * α = 0.5 specifically so the weight is `sqrt`, which IEEE
    * requires correctly rounded — `pow(p, 0.3)` could differ by an
    * ulp between libm implementations). Weights are quantized to
    * integers (floor(√p·1e9 + 0.5)) before the normalizing sum so
    * the cross-source total is EXACT integer arithmetic — a double
    * sum would be summation-order-dependent across engines.
    *
    * Scale: one documents scan → 20-row aggregate; everything after
    * is arithmetic on a frame the size of the source list. */
  def t23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dt = t(s, dir, "documents")
      .select($"source", size(word_tokens($"text")).cast("long").as("k"))
      .groupBy($"source").agg(sum($"k").as("n_tok"))
    val tot = dt.agg(sum($"n_tok").as("total"))
    val w = dt.crossJoin(tot)
      .select($"source", $"n_tok",
        ($"n_tok".cast("double") / $"total").as("p"),
        floor(sqrt($"n_tok".cast("double") / $"total") * lit(1.0e9) + lit(0.5)).as("wq"))
    val ws = w.agg(sum($"wq").as("wqs"))
    w.crossJoin(ws)
      .select($"source", $"n_tok",
        round($"p", 6).as("p"),
        round($"wq".cast("double") / $"wqs", 6).as("q"),
        round(($"wq".cast("double") / $"wqs") / $"p", 4).as("boost"))
      .orderBy($"source")
  }

  private val t23Oracle =
    s"""WITH docs AS (SELECT source, ${sqlTokens("text")} AS tk FROM documents),
       |dt AS (SELECT source, CAST(sum(len(tk)) AS BIGINT) AS n_tok FROM docs GROUP BY source),
       |tot AS (SELECT sum(n_tok) AS total FROM dt),
       |w AS (SELECT source, n_tok, CAST(n_tok AS DOUBLE) / total AS p,
       |  CAST(floor(sqrt(CAST(n_tok AS DOUBLE) / total) * 1e9 + 0.5) AS BIGINT) AS wq
       |  FROM dt CROSS JOIN tot),
       |ws AS (SELECT sum(wq) AS wqs FROM w)
       |SELECT source, n_tok, round(p, 6) AS p,
       |  round(CAST(wq AS DOUBLE) / wqs, 6) AS q,
       |  round((CAST(wq AS DOUBLE) / wqs) / p, 4) AS boost
       |FROM w CROSS JOIN ws ORDER BY source""".stripMargin

  /** Cross-corpus shingle novelty: for each incoming document (odd
    * doc_ids, the d11 convention), the fraction of its distinct
    * shingles absent from the frozen reference corpus (even ids).
    * The per-document score face of d11's pair detection: a
    * contamination/freshness signal per doc rather than a match
    * list.
    *
    * Scale: one scan builds all shingle rows; the reference side
    * reduces to a distinct shingle set (dictionary-sized, far
    * smaller than the corpus); the join is shingle-keyed — the same
    * single-key shuffle as the d02 bucket build, with map-side
    * partial aggregation on both the distinct and the count side. */
  def t24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .select($"doc_id", explode(word_shingles($"text", Dedup.N)).as("s"))
    val ref = sh.filter($"doc_id" % 2 === 0).select($"s").distinct()
      .withColumn("hit", lit(1))
    sh.filter($"doc_id" % 2 === 1)
      .join(ref, Seq("s"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_shingles"),
        sum(when($"hit".isNull, 1L).otherwise(0L)).cast("long").as("n_novel"))
      .select($"doc_id", $"n_shingles", $"n_novel",
        round($"n_novel".cast("double") / $"n_shingles", 4).as("novelty"))
      .orderBy($"doc_id")
  }

  private val t24Oracle =
    s"""WITH ${Dedup.sqlShingleRows},
       |ref AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0)
       |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  round(CAST(sum(CASE WHEN r.s IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS novelty
       |FROM sh LEFT JOIN ref r ON r.s = sh.s
       |WHERE sh.doc_id % 2 = 1
       |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  /** Lexical diversity per source: token mass, vocabulary size
    * (types), hapax legomena count, type-token ratio, hapax share —
    * the vocabulary-health panel corpus curation reads per source
    * (a source whose TTR collapses is boilerplate; one whose hapax
    * share explodes is noise/OCR garbage).
    *
    * Scale: one scan → (source, token) partial-aggregated counts →
    * source-level rollup; both aggregates combine map-side. All
    * ratios are exact-integer divisions evaluated identically on
    * both engines. */
  def t25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dt = t(s, dir, "documents")
      .select($"source", explode(word_tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("m"))
    dt.groupBy($"source")
      .agg(sum($"m").cast("long").as("n_tok"),
        count(lit(1)).cast("long").as("n_types"),
        sum(when($"m" === 1, 1L).otherwise(0L)).cast("long").as("n_hapax"))
      .select($"source", $"n_tok", $"n_types", $"n_hapax",
        round($"n_types".cast("double") / $"n_tok", 4).as("ttr"),
        round($"n_hapax".cast("double") / $"n_types", 4).as("hapax_ratio"))
      .orderBy($"source")
  }

  private val t25Oracle =
    s"""WITH docs AS (SELECT source, ${sqlTokens("text")} AS tk FROM documents),
       |tok AS (SELECT source, unnest(tk) AS tok FROM docs),
       |dt AS (SELECT source, tok, count(*) AS m FROM tok GROUP BY 1, 2)
       |SELECT source, CAST(sum(m) AS BIGINT) AS n_tok,
       |  CAST(count(*) AS BIGINT) AS n_types,
       |  CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       |  round(CAST(count(*) AS DOUBLE) / sum(m), 4) AS ttr,
       |  round(CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS hapax_ratio
       |FROM dt GROUP BY source ORDER BY source""".stripMargin

  /** Duplicate-chunk detection: t17's 64-token chunk hashes that
    * occur in MORE THAN ONE document — exact substring duplication
    * at chunk alignment (the cheap fixed-stride face of Lee et al.
    * 2022's ExactSubstr; a shared 111-token run is guaranteed to
    * contain a shared aligned chunk, stride 48 + chunk 64).
    *
    * Scale: chunking is embarrassingly parallel (t17), the
    * duplicate scan is one groupBy on a 64-bit hash — partial
    * counts map-side, and the output is only the duplicated tail of
    * the hash distribution. This is the table a chunk-level dedup
    * pass anti-joins against. */
  def d13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Relational7.t17Chunks(s, dir)
      .groupBy($"chunk_hash")
      .agg(countDistinct($"doc_id").cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_occ"))
      .filter($"n_docs" > 1)
      .orderBy($"chunk_hash")
  }

  private val d13Oracle =
    s"""WITH ${Relational7.t17ChunkCte}
       |SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_occ
       |FROM chunks GROUP BY chunk_hash
       |HAVING count(DISTINCT doc_id) > 1
       |ORDER BY chunk_hash""".stripMargin

  /** Global token-count deciles: documents ranked by length into 10
    * equal buckets, with per-bucket count/min/max/total — the length
    * histogram a sequence-packing configuration (t12/t13) is tuned
    * against. `ntile` needs a TOTAL order: (n_tok, doc_id) pins the
    * bucket boundary deterministically on both engines.
    *
    * Scale note: a global ntile is a single-partition sort by
    * construction (the same gate-mandated shape as t12); the sharded
    * alternative is quantile cut-points from approx_percentile and a
    * map-side bucket assignment — t13's pattern, which q27 already
    * demonstrates for percentiles. The decile REPORT is 10 rows; the
    * cost is the sort, acceptable for a per-corpus diagnostic. */
  def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = t(s, dir, "documents")
      .select($"doc_id", size(word_tokens($"text")).cast("long").as("n_tok"))
    n.withColumn("decile",
        ntile(10).over(Window.orderBy($"n_tok", $"doc_id")).cast("long"))
      .groupBy($"decile")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"),
        sum($"n_tok").cast("long").as("sum_tok"))
      .orderBy($"decile")
  }

  private val q52Oracle =
    s"""WITH n AS (SELECT doc_id, CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |d AS (SELECT n_tok, CAST(ntile(10) OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS decile FROM n)
       |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
       |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
       |  CAST(sum(n_tok) AS BIGINT) AS sum_tok
       |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  /** ntile's bucket for 1-based global rank `rr` over `n` rows split
    * 10 ways: the first `r0 = n % 10` buckets hold `q+1` rows
    * (`q = n / 10`), the rest hold `q`. */
  private def decileOf(rr: Column, q: Column, r0: Column): Column =
    when(q === 0, rr).otherwise(
      when(rr <= (q + 1) * r0, floor((rr - 1) / (q + 1)) + 1)
        .otherwise(r0 + floor((rr - 1 - (q + 1) * r0) / q) + 1))

  /** q52's decile report WITHOUT the global row sort (VERDICT r7 #5,
    * the SCALING.md sharded path, now a registered query): per-decile
    * count/min/max/sum depend only on the MULTISET of token counts
    * (tied docs carry equal n_tok, so how ntile splits a tie across
    * buckets never moves the stats) — so aggregate rows to a
    * (n_tok, cnt) frequency table first, and run the rank arithmetic
    * there. Same oracle as q52, row-for-row.
    *
    * Scale: the only row-level operation is a map-side-combinable
    * groupBy(n_tok); everything after — cumulative ranks, ntile
    * bucket-boundary arithmetic, the ≤ 10-way span explode — runs on
    * a frame with one row per DISTINCT length (bounded by the
    * longest document, not the corpus). The single-partition window
    * over that tiny frame is the t12 stance; the 100 TB row set is
    * never sorted. */
  def q52s(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val freq = t(s, dir, "documents")
      .select(size(word_tokens($"text")).cast("long").as("n_tok"))
      .groupBy($"n_tok").agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy($"n_tok")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = freq
      .withColumn("hi", sum($"cnt").over(wcum))
      .withColumn("lo", $"hi" - $"cnt" + 1)
    cum.crossJoin(broadcast(freq.agg(sum($"cnt").as("n_total"))))
      .withColumn("q", floor($"n_total" / 10).cast("long"))
      .withColumn("r0", ($"n_total" % 10).cast("long"))
      .select($"n_tok", $"lo", $"hi", $"q", $"r0",
        explode(sequence(
          decileOf($"lo", $"q", $"r0").cast("long"),
          decileOf($"hi", $"q", $"r0").cast("long"))).as("decile"))
      .withColumn("start_d",
        ($"decile" - 1) * $"q" + least($"decile" - 1, $"r0") + 1)
      .withColumn("end_d", $"decile" * $"q" + least($"decile", $"r0"))
      .withColumn("overlap",
        least($"hi", $"end_d") - greatest($"lo", $"start_d") + 1)
      .filter($"overlap" > 0)
      .groupBy($"decile")
      .agg(sum($"overlap").cast("long").as("n_docs"),
        min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"),
        sum($"n_tok" * $"overlap").cast("long").as("sum_tok"))
      .orderBy($"decile")
  }

  private val S08_K = 8    // clusters (the s07 seed convention)
  private val S08_DIM = 64 // embedding dimensionality

  /** Squared L2 between two array columns, fold-left in index order
    * (the s04/s07 accumulation convention — bit-equal to DuckDB's
    * list_sum over a comprehension). */
  private def sqDist(v: Column, c: Column): Column =
    aggregate(zip_with(v, c,
      (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)

  /** One full k-means update + reassignment, emitting the
    * cluster-membership table (s07 emits only per-cluster stats):
    * assign every vector to its nearest seed centroid, recompute
    * centroids as per-cluster per-dimension means, re-assign. The
    * membership table is what cluster-balanced sampling and
    * SemDeDup-style semantic dedup join against.
    *
    * Determinism across engines: per-dimension means are computed
    * over QUANTIZED components (floor(x·10⁴ + 0.5) as int64) so the
    * cross-row sum is exact integer arithmetic — a double sum's
    * value would depend on row order. float→double, ×10⁴, floor,
    * int sum, and the final two divisions are all IEEE-identical on
    * both engines; distances then fold in index order.
    *
    * Scale: centroids (K·DIM) broadcast both directions, so the
    * corpus is never on the build side of anything; the argmin is
    * `min(struct(dist, cluster))` — an AGGREGATE, not a window, so
    * the K distances per vector collapse map-side and only n rows
    * (not n·K) cross the one vec_id exchange. The update aggregates
    * (cluster, dim) cells (K·DIM rows) with map-side partials. The
    * struct min orders (dist, cluster) lexicographically — exactly
    * the row_number tie-break the oracle uses. */
  def s08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
    val seeds = e.filter($"vec_id" < S08_K)
      .select($"vec_id".as("cluster"), $"embedding".as("cvec"))
    val assign0 = e.crossJoin(broadcast(seeds))
      .select($"vec_id", $"embedding", $"cluster",
        sqDist($"embedding", $"cvec").as("dist"))
      .groupBy($"vec_id")
      .agg(min(struct($"dist", $"cluster")).as("m"),
        first($"embedding").as("embedding"))
      .select($"vec_id", $"embedding", $"m.cluster".as("cluster"))
    val dims = assign0
      .select($"cluster", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"cluster", $"pos")
      .agg(sum(floor($"x".cast("double") * lit(10000.0) + lit(0.5))).as("qs"),
        count(lit(1)).as("n"))
    val cent = dims.groupBy($"cluster")
      .agg(transform(
        sort_array(collect_list(struct($"pos",
          ($"qs".cast("double") / $"n" / lit(10000.0)).as("c")))),
        x => x.getField("c")).as("cvec"))
    e.crossJoin(broadcast(cent))
      .select($"vec_id", $"cluster", sqDist($"embedding", $"cvec").as("dist"))
      .groupBy($"vec_id")
      .agg(min(struct($"dist", $"cluster")).as("m"))
      .select($"vec_id", $"m.cluster".as("cluster"),
        round($"m.dist", 4).as("dist"))
      .orderBy($"vec_id")
  }

  private val s08Oracle =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |seeds AS (SELECT vec_id AS cluster, embedding AS cvec
       |  FROM embeddings WHERE vec_id < $S08_K),
       |d0 AS (SELECT e.vec_id, s.cluster,
       |  list_sum([(CAST(e.embedding[i] AS DOUBLE) - CAST(s.cvec[i] AS DOUBLE))
       |          * (CAST(e.embedding[i] AS DOUBLE) - CAST(s.cvec[i] AS DOUBLE))
       |    for i in range(1, ${S08_DIM + 1})]) AS dist
       |  FROM e CROSS JOIN seeds s),
       |a0 AS (SELECT vec_id, cluster,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |  FROM d0),
       |mem AS (SELECT vec_id, cluster FROM a0 WHERE rn = 1),
       |dims AS (SELECT m.cluster, g.i,
       |  sum(CAST(floor(CAST(e.embedding[g.i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS qs,
       |  count(*) AS n
       |  FROM mem m JOIN e ON e.vec_id = m.vec_id
       |  CROSS JOIN generate_series(1, $S08_DIM) AS g(i)
       |  GROUP BY m.cluster, g.i),
       |cent AS (SELECT cluster, list(CAST(qs AS DOUBLE) / n / 10000.0 ORDER BY i) AS cvec
       |  FROM dims GROUP BY cluster),
       |d1 AS (SELECT e.vec_id, c.cluster,
       |  list_sum([(CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
       |          * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
       |    for i in range(1, ${S08_DIM + 1})]) AS dist
       |  FROM e CROSS JOIN cent c),
       |a1 AS (SELECT vec_id, cluster, dist,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |  FROM d1)
       |SELECT vec_id, cluster, round(dist, 4) AS dist
       |FROM a1 WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** Zipf rank-frequency fit per source: least-squares slope and
    * intercept of ln(freq) against ln(rank) over the source's token
    * frequency table — the power-law health check (natural text sits
    * near slope −1; template/boilerplate corpora flatten, noise
    * steepens). Ranks come from a deterministic (count desc, token)
    * order; the fit is the closed-form simple regression over the
    * (ln rank, ln count) points.
    *
    * Determinism: the Σx/Σy/Σxy/Σx² sums are doubles, so round(4)
    * absorbs summation-order ulps (t06/e04 convention); the log
    * inputs themselves are integer-valued, evaluated identically per
    * row on both engines (the t18 ln precedent).
    *
    * Scale: one (source, token) aggregate, one per-source rank
    * window (vocabulary-sized partitions, not corpus-sized), one
    * source rollup. */
  def t27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dt = t(s, dir, "documents")
      .select($"source", explode(word_tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    val ranked = dt.withColumn("r", row_number().over(
      Window.partitionBy($"source").orderBy($"c".desc, $"tok")).cast("long"))
    val pts = ranked.select($"source",
      log($"r".cast("double")).as("x"), log($"c".cast("double")).as("y"))
    pts.groupBy($"source")
      .agg(count(lit(1)).cast("long").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"source", $"n".as("n_types"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx"), 4).as("slope"),
        round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 4).as("intercept"))
      .orderBy($"source")
  }

  private val t27Oracle =
    s"""WITH docs AS (SELECT source, ${sqlTokens("text")} AS tk FROM documents),
       |tok AS (SELECT source, unnest(tk) AS tok FROM docs),
       |dt AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
       |ranked AS (SELECT source, c,
       |  CAST(row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS BIGINT) AS r
       |  FROM dt),
       |pts AS (SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM ranked),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |  sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM pts GROUP BY source)
       |SELECT source, n AS n_types,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
       |FROM agg ORDER BY source""".stripMargin

  /** Bigram-LM quality score: per-document mean negative
    * log-likelihood under the corpus's own bigram MLE, P(b|a) =
    * c(a,b)/ctx(a) with ctx(a) = Σ_b c(a,b) — t18's unigram signal
    * upgraded one order (word-order salad that unigram NLL can't see
    * scores high here). Normalizing by the CONTEXT count (not the
    * raw unigram count) makes Σ_b P(b|a) = 1 exactly, so NLL is
    * always ≥ 0.
    *
    * Shape: bigrams come from an IN-PLAN array zip (slice + zip_with
    * — no posexplode self-join, no second tokenize); the bigram
    * vocabulary and the context totals both derive from the one
    * (doc, a, b) aggregate, the t18 exchange-reuse discipline. Docs
    * with < 2 tokens have no bigrams and are absent by construction
    * on both engines — the slice length clamps at 0, so no t17-style
    * crash path exists. */
  def t28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bg = t(s, dir, "documents")
      .select($"doc_id", word_tokens($"text").as("tk"))
      .select($"doc_id", explode(zip_with(
        slice($"tk", lit(1), greatest(size($"tk") - 1, lit(0))),
        slice($"tk", lit(2), greatest(size($"tk") - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select($"doc_id", $"p.a".as("a"), $"p.b".as("b"))
      // zip_with's conservative nullability makes the join inject
      // isnotnull filters; stating them ONCE here keeps the three dt
      // consumers' subtrees canonically identical so the exchange is
      // planned once and reused (the t18 single-scan discipline)
      .filter($"a".isNotNull && $"b".isNotNull)
    val dt = bg.groupBy($"doc_id", $"a", $"b").agg(count(lit(1)).as("m"))
    val cb = dt.groupBy($"a", $"b").agg(sum($"m").as("c"))
    val cc = cb.groupBy($"a").agg(sum($"c").as("ctx"))
    dt.join(cb, Seq("a", "b")).join(cc, Seq("a"))
      .groupBy($"doc_id")
      .agg(sum($"m").cast("long").as("n_bigrams"),
        round(sum($"m" * (log($"ctx") - log($"c"))) / sum($"m"), 4).as("nll"))
      .orderBy($"doc_id")
  }

  private val t28Oracle =
    s"""WITH docs AS (SELECT doc_id, ${sqlTokens("text")} AS tk FROM documents),
       |bg AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS a, unnest(tk[2:len(tk)]) AS b
       |  FROM docs WHERE len(tk) >= 2),
       |dt AS (SELECT doc_id, a, b, count(*) AS m FROM bg GROUP BY 1, 2, 3),
       |cb AS (SELECT a, b, sum(m) AS c FROM dt GROUP BY a, b),
       |cc AS (SELECT a, sum(c) AS ctx FROM cb GROUP BY a)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |  round(sum(m * (ln(ctx) - ln(cb.c))) / sum(m), 4) AS nll
       |FROM dt JOIN cb USING (a, b) JOIN cc USING (a)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val KMV_K = 64

  /** KMV distinct-user estimate per event type — the oracle-checked
    * sketch: because the hash is fixed and the estimator is the k-th
    * smallest order statistic, the estimate is a DETERMINISTIC
    * function of the input set, so DuckDB reproduces it bit-for-bit
    * (x01/x03/x04's HLL/GK/SpaceSaving cannot be oracle'd this way —
    * their state depends on engine internals). Exact distinct rides
    * along so the output doubles as the error report.
    *
    * Scale: the typed [[graft.functions.KMinValues.KMV]] aggregator
    * carries ≤ k longs per (partition, type) into the shuffle — the
    * GroupedTopK/SpaceSaving bounded-state discipline; the estimator
    * never materializes the distinct set. */
  def x05(s: SparkSession, dir: String): DataFrame =
    kmvDistinct(s, t(s, dir, "events"), "event_type", "user_id")

  /** KMV face of x01's distinct-count (VERDICT r7 #4): the same
    * question x01's HLL answers — distinct orders per return flag —
    * through the deterministic-estimator sketch, so the ESTIMATE
    * itself is oracle-checked bit-for-bit, not just its error flag.
    * A pipeline keeps both: HLL for constant tiny state, KMV when
    * the estimate must be auditable/mergeable across engines. */
  def x01k(s: SparkSession, dir: String): DataFrame =
    kmvDistinct(s, t(s, dir, "lineitem"), "l_returnflag", "l_orderkey")

  /** Shared KMV distinct-count estimator: hash the value column with
    * the fixed engine-portable hash, keep the k smallest per group
    * (the [[graft.functions.KMinValues.KMV]] aggregator registered as
    * a `udaf` inside a relational `groupBy` — ≤ k longs per
    * (partition, group) cross the shuffle, and the aggregate input
    * stays on the codegen'd columnar path instead of the typed
    * `groupByKey` encoder path, the same form the streaming face
    * uses at [[graft.streaming.EventStreams.kmvDistinctStream]]),
    * estimate (k−1)·2^60 / kth-min, ride the exact count along as
    * the error report. */
  private def kmvDistinct(s: SparkSession, df: DataFrame,
      group: String, value: String): DataFrame = {
    import s.implicits._
    val kmvU = udaf(graft.functions.KMinValues.KMV(KMV_K))
    val kmv = df.select(col(group),
        hash64(concat(lit("kmv:"), col(value).cast("string"))).as("h"))
      .groupBy(col(group))
      .agg(kmvU($"h").as("ks"))
    val exact = df.groupBy(col(group))
      .agg(countDistinct(col(value)).cast("long").as("exact_distinct"))
    kmv.select(col(group), size($"ks").cast("long").as("n_h"),
        element_at($"ks", -1).as("kth"))
      .join(exact, group)
      .select(col(group), $"n_h",
        round(when($"n_h" < KMV_K, $"n_h".cast("double"))
          .otherwise(lit((KMV_K - 1).toDouble) * lit(1152921504606846976.0) / $"kth"),
          2).as("est_distinct"),
        $"exact_distinct")
      .withColumn("rel_err",
        round(abs($"est_distinct" - $"exact_distinct") / $"exact_distinct", 4))
      .orderBy(col(group))
  }

  private def kmvOracle(table: String, group: String, value: String) =
    s"""WITH h AS (SELECT DISTINCT $group,
       |    ${sqlHash64(s"concat('kmv:', CAST($value AS VARCHAR))")} AS h
       |  FROM $table),
       |r AS (SELECT $group, h,
       |  row_number() OVER (PARTITION BY $group ORDER BY h) AS rn FROM h),
       |kk AS (SELECT $group, CAST(count(*) AS BIGINT) AS n_h, max(h) AS kth
       |  FROM r WHERE rn <= $KMV_K GROUP BY $group),
       |ex AS (SELECT $group, CAST(count(DISTINCT $value) AS BIGINT) AS exact_distinct
       |  FROM $table GROUP BY $group),
       |est AS (SELECT kk.$group, n_h,
       |  round(CASE WHEN n_h < $KMV_K THEN CAST(n_h AS DOUBLE)
       |    ELSE CAST(${KMV_K - 1} AS DOUBLE) * 1152921504606846976 / kth END, 2) AS est_distinct,
       |  exact_distinct
       |  FROM kk JOIN ex ON ex.$group = kk.$group)
       |SELECT $group, n_h, est_distinct, exact_distinct,
       |  round(abs(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_err
       |FROM est ORDER BY $group""".stripMargin

  private val x05Oracle = kmvOracle("events", "event_type", "user_id")
  private val x01kOracle = kmvOracle("lineitem", "l_returnflag", "l_orderkey")

  /** KMV SET OPERATIONS (x07): estimated distinct-user overlap for
    * every event-type pair — |A∩B| without ever materializing either
    * distinct set. The audience-overlap question every funnel/reach
    * dashboard asks, answered from the same per-type KMV sketches x05
    * maintains:
    *
    *   union k-min  U = first k of sort(distinct(ksₐ ∪ ks_b))
    *   Jaccard est  J = |{h ∈ U : h ∈ ksₐ ∧ h ∈ ks_b}| / |U|
    *   |A∪B| est      = x05's estimator on U
    *   |A∩B| est      = J · |A∪B|est       (Beyer et al. 2007)
    *
    * Every step is a deterministic function of the input sets under
    * the fixed hash, so — like x05/x06 and unlike HLL — the sketch
    * quantities hash-match a DuckDB oracle exactly. The OUTPUT is
    * deliberately all exact integers: `shared`, `n_u`, the union's
    * k-th min `kth_u`, and a fixed-point `j_ppm` = ⌊10⁶·shared/n_u⌋
    * (integer floor division — no HALF_UP-vs-scaled-rounding hazard;
    * the r9 s09 lesson). The consumer derives J = shared/n_u,
    * |A∪B|est = (k−1)·2⁶⁰/kth_u, |A∩B|est = J·|A∪B|est — divisions
    * on exact integers, never gated on a rounded double near a tie.
    * The exact intersection rides along as the error report; the
    * spec re-derives the double estimates and checks the envelope.
    *
    * Sketch frames are #types rows; the pair join is trivially
    * broadcast. At 100 TB the sketches merge across partitions/days
    * by the same k-min merge, and pair overlap costs O(k) per pair
    * instead of a distinct-set join. */
  def x07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val kmvU = udaf(graft.functions.KMinValues.KMV(KMV_K))
    val sk = ev.select($"event_type",
        hash64(concat(lit("kmv:"), $"user_id".cast("string"))).as("h"))
      .groupBy($"event_type")
      .agg(kmvU($"h").as("ks"))
    val pairs = sk.as("x").join(sk.as("y"),
        col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("a_type"), col("y.event_type").as("b_type"),
        col("x.ks").as("aks"), col("y.ks").as("bks"))
      .withColumn("u",
        slice(array_sort(array_union($"aks", $"bks")), 1, KMV_K))
      .withColumn("shared", size(filter($"u",
        h => array_contains($"aks", h) && array_contains($"bks", h))).cast("long"))
    val dt = ev.select($"event_type", $"user_id").distinct()
    val exact = dt.as("p").join(dt.as("q"),
        col("p.user_id") === col("q.user_id") &&
          col("p.event_type") < col("q.event_type"))
      .groupBy(col("p.event_type").as("a_type"), col("q.event_type").as("b_type"))
      .agg(count(lit(1)).as("exact_intersect"))
    pairs
      .join(exact, Seq("a_type", "b_type"), "left")
      .select($"a_type", $"b_type",
        size($"u").cast("long").as("n_u"),
        $"shared",
        expr("(shared * 1000000L) DIV size(u)").as("j_ppm"),
        element_at($"u", -1).as("kth_u"),
        coalesce($"exact_intersect", lit(0L)).as("exact_intersect"))
      .orderBy($"a_type", $"b_type")
  }

  private val x07Oracle =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |    ${sqlHash64("concat('kmv:', CAST(user_id AS VARCHAR))")} AS h
       |  FROM events),
       |r AS (SELECT event_type, h,
       |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |sk AS (SELECT event_type, list(h ORDER BY h) AS ks
       |  FROM r WHERE rn <= $KMV_K GROUP BY event_type),
       |p AS (SELECT x.event_type AS a_type, y.event_type AS b_type,
       |    x.ks AS aks, y.ks AS bks
       |  FROM sk x JOIN sk y ON x.event_type < y.event_type),
       |c AS (SELECT a_type, b_type, aks, bks,
       |  list_sort(list_distinct(list_concat(aks, bks)))[1:$KMV_K] AS u FROM p),
       |e AS (SELECT a_type, b_type, u,
       |  CAST(len(list_filter(u, x -> list_contains(aks, x) AND list_contains(bks, x)))
       |    AS BIGINT) AS shared
       |  FROM c),
       |dt AS (SELECT DISTINCT event_type, user_id FROM events),
       |ex AS (SELECT p.event_type AS a_type, q.event_type AS b_type,
       |    CAST(count(*) AS BIGINT) AS exact_intersect
       |  FROM dt p JOIN dt q
       |    ON p.user_id = q.user_id AND p.event_type < q.event_type
       |  GROUP BY 1, 2)
       |SELECT e.a_type, e.b_type, CAST(len(u) AS BIGINT) AS n_u,
       |  shared,
       |  CAST((shared * 1000000) // len(u) AS BIGINT) AS j_ppm,
       |  u[-1] AS kth_u,
       |  coalesce(exact_intersect, 0) AS exact_intersect
       |FROM e LEFT JOIN ex USING (a_type, b_type)
       |ORDER BY a_type, b_type""".stripMargin

  /** Effective token mass per source after soft dedup: each
    * document's tokens weighted by its d10 soft-dedup weight
    * (1/near-dup-cluster size), rolled up per source — the number a
    * data-mixture decision actually consumes (t23's input after
    * dedup), and the per-source answer to "how much of this source
    * survives deduplication". `retention` = effective/raw.
    *
    * Scale: d10's label-table-sized join (the labels are
    * materialized pipeline state) + one source rollup; the weighted
    * sum is double arithmetic, so it rounds at 2 decimals — the
    * t06/e04 summation-order convention. */
  def t26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Relational7.d10(s, dir).select($"doc_id", $"weight")
    t(s, dir, "documents")
      .select($"doc_id", $"source",
        size(word_tokens($"text")).cast("long").as("n"))
      .join(w, "doc_id")
      .groupBy($"source")
      .agg(sum($"n").cast("long").as("n_tok"),
        round(sum($"weight" * $"n"), 2).as("eff_tok"))
      .select($"source", $"n_tok", $"eff_tok",
        round($"eff_tok" / $"n_tok", 4).as("retention"))
      .orderBy($"source")
  }

  private val t26Oracle =
    s"""${Relational4.ccOraclePrefix},
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id),
       |cl AS (SELECT comp.id, sizes.cluster_size FROM comp JOIN sizes USING (cluster_id)),
       |wt AS (SELECT d.doc_id, d.source,
       |  CAST(len(${sqlTokens("d.text")}) AS BIGINT) AS n,
       |  round(CAST(1 AS DOUBLE) / coalesce(cl.cluster_size, 1), 6) AS weight
       |  FROM documents d LEFT JOIN cl ON cl.id = d.doc_id),
       |agg AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tok,
       |  round(sum(weight * n), 2) AS eff_tok FROM wt GROUP BY source)
       |SELECT source, n_tok, eff_tok, round(eff_tok / n_tok, 4) AS retention
       |FROM agg ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e06_funnel" -> (e06 _),
    "e07_retention" -> (e07 _),
    "t23_temperature_mix" -> (t23 _),
    "t24_shingle_novelty" -> (t24 _),
    "t25_lexical_diversity" -> (t25 _),
    "d13_dup_chunks" -> (d13 _),
    "q52_token_deciles" -> (q52 _),
    "q52s_token_deciles_sharded" -> (q52s _),
    "s08_kmeans_assign" -> (s08 _),
    "x05_kmv_distinct" -> (x05 _),
    "x07_kmv_setops" -> (x07 _),
    "x01k_kmv_distinct" -> (x01k _),
    "t26_effective_tokens" -> (t26 _),
    "t27_zipf_fit" -> (t27 _),
    "t28_bigram_nll" -> (t28 _),
  )

  val oracles: Map[String, String] = Map(
    "e06_funnel" -> e06Oracle,
    "e07_retention" -> e07Oracle,
    "t23_temperature_mix" -> t23Oracle,
    "t24_shingle_novelty" -> t24Oracle,
    "t25_lexical_diversity" -> t25Oracle,
    "d13_dup_chunks" -> d13Oracle,
    "q52_token_deciles" -> q52Oracle,
    "q52s_token_deciles_sharded" -> q52Oracle,
    "s08_kmeans_assign" -> s08Oracle,
    "x05_kmv_distinct" -> x05Oracle,
    "x07_kmv_setops" -> x07Oracle,
    "x01k_kmv_distinct" -> x01kOracle,
    "t26_effective_tokens" -> t26Oracle,
    "t27_zipf_fit" -> t27Oracle,
    "t28_bigram_nll" -> t28Oracle,
  )
}
