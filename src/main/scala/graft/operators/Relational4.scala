package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GroupedTopK

/** Fourth tranche: grouping sets (CUBE), a typed top-k Aggregator,
  * analytic window functions (lead/lag/ntile/percent_rank), the SQL
  * surface with correlated subqueries, RANGE window frames, bloom-
  * filter join pruning, time-spine gap fill, and connected-component
  * duplicate clustering. Each entry has a DuckDB oracle with identical
  * arithmetic and aliases.
  */
object Relational4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** CUBE + grouping_id over (priority, order month): all four
    * grouping combinations in one pass — Spark expands the cube into a
    * partial-aggregated union, one shuffle (SURVEY §2.5 extension of
    * q20's rollup). Nulls from the cube are labeled 'ALL' so ordering
    * is total across engines. */
  def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderpriority", month($"o_orderdate").cast("long").as("mon"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"mon", lit(0L)).as("mon"), $"gid", $"n", $"total")
      .orderBy($"gid", $"priority", $"mon")
  }

  /** Grouped top-k via the typed bounded-buffer Aggregator
    * ([[GroupedTopK]]): top-3 lineitems by extendedprice per
    * returnflag. The map side reduces every partition to ≤3 rows per
    * group before the shuffle — the window formulation (the oracle)
    * shuffles and sorts the whole table. */
  def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topk = udaf(GroupedTopK.TopK(3))
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(topk($"l_extendedprice", $"l_orderkey", $"l_linenumber").as("top"))
      .select($"l_returnflag", posexplode($"top").as(Seq("pos", "r")))
      .select($"l_returnflag", ($"pos" + 1).cast("long").as("rank"),
        round($"r.price", 2).as("price"), $"r.orderkey".as("orderkey"),
        $"r.linenumber".cast("long").as("linenumber"))
      .orderBy($"l_returnflag", $"rank")
  }

  /** Analytic window functions per user event stream: lag/lead value
    * deltas, quartile (ntile), percent_rank, cume_dist. Ordering key
    * (ts, event_id) is total, and every emitted double is either a
    * single IEEE subtraction or an integer-ratio division — identical
    * bit patterns on both engines, no rounding needed. */
  def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .withColumn("prev_delta", $"value" - lag($"value", 1).over(w))
      .withColumn("next_delta", lead($"value", 1).over(w) - $"value")
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select($"event_id", $"user_id", $"prev_delta", $"next_delta",
        $"quartile", $"pct_rank", $"cume")
      .orderBy($"event_id")
  }

  /** Correlated EXISTS + scalar subquery, exercised through the SQL
    * surface (`spark.sql` over the registered views — SURVEY §7.2.6).
    * The same SQL text runs verbatim on DuckDB as the oracle; the
    * threshold uses max() (order-independent), never avg (whose
    * summation order differs across engines).
    *
    * Orders is deliberately scanned twice (VERDICT r3 stretch #8
    * evaluated and declined): the scalar-subquery scan is pruned to
    * the single o_totalprice column — at 100 TB that's a cheap
    * columnar stats-ish pass — while any true single-scan plan would
    * need orders cached/materialized (a far larger cost than the
    * 1-column re-scan) or a global-window max (all rows to one
    * partition). Two scans IS the plan you'd want. */
  private val q36Sql =
    """SELECT c_custkey, count(*) AS n_big, round(sum(o_totalprice), 2) AS spend
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE o.o_totalprice > 0.5 * (SELECT max(o_totalprice) FROM orders)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  def q36(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q36Sql)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE, new engine surface):
    * month spine from the orders date range — the anchor row is the
    * first month, the recursive member steps +1 month to the max —
    * left-joined to the per-month aggregate so empty months would
    * zero-fill. IDENTICAL SQL text runs on DuckDB as the oracle
    * (dialect-shared: date_trunc cast to TIMESTAMP per the q16
    * convention, `INTERVAL 1 MONTH` literal both engines accept).
    * Recursion depth = #months (~80 for the TPC-H date range), within
    * Spark's default recursion limit. The sequence()+explode form
    * (e02) is the preferred spine at scale — this registers the
    * recursion ENGINE as covered surface, not a recommendation. */
  private val q41Sql =
    """WITH RECURSIVE bounds AS (
      |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
      |         CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP) AS hi
      |  FROM orders),
      |spine AS (
      |  SELECT lo AS month, hi FROM bounds
      |  UNION ALL
      |  SELECT CAST(month + INTERVAL 1 MONTH AS TIMESTAMP) AS month, hi
      |  FROM spine WHERE month < hi),
      |m AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |        count(*) AS n, round(sum(o_totalprice), 2) AS total
      |      FROM orders GROUP BY 1)
      |SELECT s.month, CAST(coalesce(m.n, 0) AS BIGINT) AS n,
      |  coalesce(m.total, 0.0) AS total
      |FROM (SELECT month FROM spine) s LEFT JOIN m ON s.month = m.month
      |ORDER BY s.month""".stripMargin

  def q41(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q41Sql)
  }

  /** RANGE window frame: trailing 30-minute per-user frame (count and
    * max — order-independent aggregates only). Frame bound is in
    * epoch MICROseconds on both engines so tie handling is identical
    * (a seconds-granularity cast would merge distinct instants). */
  def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-1800000000L, Window.currentRow)
    t(s, dir, "events")
      .withColumn("n_30m", count(lit(1)).over(w))
      .withColumn("max_30m", max($"value").over(w))
      .select($"event_id", $"user_id", $"n_30m", $"max_30m")
      .orderBy($"event_id")
  }

  /** Bloom-filter join pruning (the runtime-filter pattern Spark's own
    * InjectRuntimeFilter applies to shuffle joins): build a bloom
    * filter over the small side's keys, prune the fact table with it
    * BEFORE the shuffle, then exact-semi-join the survivors. Bloom
    * filters have no false negatives, so the result is exactly the
    * plain semi join (the oracle); false positives only cost a little
    * post-filter work. At 100 TB the bloom prune drops most of the
    * fact-table shuffle volume; at this SF the bloom is ~61 KB. */
  def x02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey")
    // driver-side build of the runtime-filter pair Spark's own
    // InjectRuntimeFilter derives for shuffle joins: a bloom probe
    // (codegen'd BloomFilterMightContain, deserialized once) plus a
    // min/max key range — the range is a plain literal predicate, so
    // it pushes to the parquet scan (row-group stats pruning) where
    // the bloom itself can't. Both actions run on the *small* side.
    // the min/max job also counts the keys, so the bloom is sized from
    // the REAL key count at any scale factor (a fixed capacity would
    // silently degrade fpp toward 1 as the data grows — ADVICE r4)
    val mm = high.agg(min($"o_orderkey"), max($"o_orderkey"),
      count($"o_orderkey")).head()
    val (lo, hi, n) =
      if (mm.isNullAt(0)) (0L, -1L, 0L)
      else (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    val bloom = high.stat.bloomFilter("o_orderkey", math.max(n, 64L), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val pruned = t(s, dir, "lineitem")
      .filter($"l_orderkey".between(lo, hi) &&
        graft.functions.NativeKernels.bloom_might_contain(bos.toByteArray, $"l_orderkey"))
    pruned.join(high, pruned("l_orderkey") === high("o_orderkey"), "left_semi")
      .select($"l_orderkey".as("o_orderkey"), $"l_partkey",
        round($"l_extendedprice", 2).as("price"))
      .orderBy($"o_orderkey", $"l_partkey", $"price")
  }

  /** Minute-spine gap fill: zero-fill per-(event_type, minute) counts
    * over the full [min, max] minute range — the resample/regularize
    * step a time-series feature pipeline runs before windowed models.
    * The spine is sequence()+explode (no driver loop); the count join
    * is one shuffle and the spine side stays tiny. */
  /** Dense (minute × event_type) grid over the events' full minute
    * range — shared spine of e02/e03. */
  private def minuteGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    ev.agg(
        date_trunc("minute", min($"ts")).as("mn"),
        date_trunc("minute", max($"ts")).as("mx"))
      .select(explode(sequence($"mn", $"mx", expr("interval 1 minute"))).as("minute"))
      .crossJoin(ev.select($"event_type").distinct())
  }

  def e02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "events")
      .groupBy(date_trunc("minute", $"ts").as("minute"), $"event_type")
      .agg(count(lit(1)).as("n"))
    minuteGrid(s, dir).join(counts, Seq("minute", "event_type"), "left")
      .select($"minute", $"event_type", coalesce($"n", lit(0L)).as("n"))
      .orderBy($"minute", $"event_type")
  }

  /** Forward-fill resample (composing the e02 spine with q38's IGNORE
    * NULLS navigation): each (minute, type) cell carries the value of
    * the latest event at or before it — the last-observation-carried-
    * forward regularization a feature pipeline runs before windowed
    * models. Within-minute "latest" is max_by(event_id) (unique id =
    * deterministic); the fill is last_value IGNORE NULLS over the
    * minute order, so the emitted doubles pass through untouched. */
  def e03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mvals = t(s, dir, "events")
      .groupBy(date_trunc("minute", $"ts").as("minute"), $"event_type")
      .agg(max_by($"value", $"event_id").as("v"))
    val w = Window.partitionBy($"event_type").orderBy($"minute")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    minuteGrid(s, dir).join(mvals, Seq("minute", "event_type"), "left")
      .select($"minute", $"event_type",
        last($"v", ignoreNulls = true).over(w).as("filled"))
      // rows before a type's first observation have nothing to carry
      // forward — dropped (null cells also trip engines' null-ordering
      // differences in the comparison gate)
      .filter($"filled".isNotNull)
      .orderBy($"minute", $"event_type")
  }

  /** Connected-component duplicate clustering over the d02 near-dup
    * pairs: the step that turns pairwise matches into dedup groups.
    * Iterative min-label propagation to a fixpoint — each round is
    * one join + one aggregate, with `localCheckpoint` cutting lineage
    * so plans don't grow with iterations (the standard Spark iterative
    * shape; converges in O(diameter) rounds, and near-dup clusters
    * have tiny diameters). Deterministic: labels are min doc_ids. */
  def d06(s: SparkSession, dir: String,
      pairsIn: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    // the pair table is injectable: a real pipeline materializes the
    // d02 detection output once and feeds detection→clustering→apply
    // from it, instead of re-evaluating the pair plan per stage
    val pairs = pairsIn.getOrElse(Dedup.d02(s, dir)).select($"a_id", $"b_id")
    // partitioned by dst — the key every round's label-propagation
    // join probes (guide §2.4). r18 (VERDICT r17 #5 — the r17 claim
    // did not hold): the keyless-count repartition($"dst") was
    // AQE-coalescible, so the captured layout never matched the label
    // side and each round still paid 4 exchanges + a SortMergeJoin
    // (plans/r18/d06_dup_clusters_before.txt). The snapshot now pins
    // hash(dst, p) with the literal conf partition count
    // (REPARTITION_BY_NUM is exempt from AQE coalescing), the label
    // seed pins hash(id, p), and the round's joins are
    // SHUFFLE_HASH-hinted: the propagation join and the carry join
    // both plan with zero exchanges — rounds exchange only the
    // min-label aggregate (map-side partials kept) plus a
    // label-sized realign of its output.
    val p = s.sessionState.conf.numShufflePartitions
    val edges = pairs.union(pairs.select($"b_id", $"a_id"))
      .toDF("src", "dst").repartition(p, $"dst").localCheckpoint()
    // seed with the one-hop minimum (min of self and direct
    // neighbors) — the result of what would otherwise be round 1
    var labels = edges.groupBy($"src")
      .agg(least(min($"dst"), $"src").as("comp"))
      .select($"src".as("id"), $"comp")
      .repartition(p, $"id").localCheckpoint()
    var converged = false
    while (!converged) {
      val prop = edges.join(labels.hint("shuffle_hash"), $"dst" === $"id")
        .groupBy($"src").agg(min($"comp").as("ncomp"))
      // carry the changed flag inside the checkpointed frame: one
      // materializing action per round instead of a second join+count
      val next = labels.join(prop.hint("shuffle_hash"), $"id" === $"src", "left")
        .select($"id",
          least($"comp", coalesce($"ncomp", $"comp")).as("comp"),
          (coalesce($"ncomp", $"comp") < $"comp").as("chg"))
        .localCheckpoint()
      converged = next.agg(max($"chg")).head().getAs[Any](0) != true
      labels = next.drop("chg")
    }
    val sizes = labels.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("comp"))
      .select($"id".as("doc_id"), $"comp".as("cluster_id"), $"cluster_size")
      .orderBy($"doc_id")
  }

  /** Cluster-aware dedup apply: keep exactly one document (the min
    * doc_id = the cluster label) per connected near-dup cluster. This
    * is the correct closure of d05's pairwise rule — pairwise
    * drop-the-higher-id can orphan a transitive chain (a~b, b~c drops
    * b and c even though c never paired with the survivor a; with
    * clusters, c is dropped *because* it is reachable from a). */
  def d07(s: SparkSession, dir: String,
      pairsIn: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val clusters = d06(s, dir, pairsIn)
    val drops = clusters.filter($"doc_id" =!= $"cluster_id").select($"doc_id")
    t(s, dir, "documents")
      .join(drops, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the published edge-contraction alternative to d06's
    * min-label propagation, over the same pairs and with the same
    * output (and oracle). Registered because the two have different
    * 100 TB failure modes: label propagation runs O(component
    * DIAMETER) rounds — fine for blob-shaped near-dup clusters,
    * unbounded for chain-shaped graphs — while star rounds contract
    * paths doubly-exponentially (O(log²) rounds regardless of
    * diameter) and never materialize a per-node label table until the
    * end, only the shrinking edge set.
    *
    * large-star: every node re-hangs its STRICTLY LARGER neighbors
    * under the minimum of its closed neighborhood; small-star re-hangs
    * the smaller ones. Each phase is ONE window-min shuffle on node id
    * (see the in-loop comment for why not groupBy+join). The fixpoint
    * is a star forest rooted at component minima, detected by a direct
    * structural test per round (`isStarForest` — one tiny groupBy job)
    * rather than an edge-set-signature compare, which would pay a full
    * extra round to observe "nothing changed". */
  def d09(s: SparkSession, dir: String,
      pairsIn: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val pairs = pairsIn.getOrElse(Dedup.d02(s, dir)).select($"a_id", $"b_id")
    var edges = pairs
      .select(greatest($"a_id", $"b_id").as("hi"), least($"a_id", $"b_id").as("lo"))
      .filter($"hi" =!= $"lo").distinct().localCheckpoint()
    // node set pinned from the INITIAL edge snapshot: contraction
    // preserves endpoints' components but the final labels need every
    // original node, and deriving it from `pairs` at the end re-ran
    // the whole d02 detection plan a second time (measured: the final
    // count exec re-paid ~1.5 s of shingle/minhash work at sf0.1).
    // Self-loop-free pairs make edge endpoints ≡ pair endpoints.
    val nodes = edges.select($"hi".as("id"))
      .union(edges.select($"lo".as("id"))).distinct().localCheckpoint()
    /** The fixpoint is testable DIRECTLY: the edge set is a star
      * forest iff no node has two parents (appears as `hi` twice) and
      * no node is both a child and a root (appears as `hi` and as
      * `lo`) — and a star forest is exactly the algorithm's fixpoint
      * (sufficiency: both phases map a star to itself; necessity: the
      * paper's). Contraction preserves the original components and
      * every edge keeps hi > lo, so each star's root is its
      * component's minimum. Testing this per round — one tiny
      * groupBy job over the checkpointed edges — stops at the TRUE
      * fixpoint round; an edge-set-signature comparison would need
      * one extra full confirm round to observe that nothing changed. */
    def isStarForest(e: org.apache.spark.sql.DataFrame): Boolean =
      e.select($"hi".as("n"), lit(1L).as("h"))
        .union(e.select($"lo".as("n"), lit(0L).as("h")))
        .groupBy($"n").agg(sum($"h").as("hc"), count(lit(1)).as("c"))
        .filter($"hc" > 1 || ($"hc" >= 1 && $"c" > $"hc"))
        .limit(1).isEmpty
    while (!isStarForest(edges)) {
      // Each star phase is ONE window-min over its partition key —
      // not the groupBy-min + join-back formulation, which shuffles
      // the full adjacency TWICE per phase (once partially-aggregated
      // for the min table, once again to join it back) and pays an
      // AQE join re-plan per round. The window shuffles the adjacency
      // once and evaluates the min in place; per-node key skew is the
      // same in both forms (that skew is what the large/small-star
      // alternation itself bounds, per the paper).
      //
      // large-star: symmetrized adjacency; m(u) = min(Γ(u) ∪ {u});
      // each undirected edge is emitted once, from its smaller
      // endpoint u, as (v, m(u)) with v > u ≥ m(u)
      val sym = edges.select($"hi".as("u"), $"lo".as("v"))
        .union(edges.select($"lo".as("u"), $"hi".as("v")))
      val ls = sym
        .withColumn("m", least(min($"v").over(Window.partitionBy($"u")), $"u"))
        .filter($"v" > $"u")
        .select($"v".as("hi"), $"m".as("lo"))
      // small-star: edges already point large→small, so min(lo) over
      // the node's edges IS the closed-neighborhood minimum. Each row
      // emits its re-hung edge (lo, m) plus the root edge (hi, m) in
      // one explode pass — self-loops (where an emitted pair's ends
      // coincide) are filtered in the same expression, duplicate
      // (hi, m) copies collapse in the end-of-round distinct that the
      // fixpoint signature needs anyway.
      val next = ls
        .withColumn("m", min($"lo").over(Window.partitionBy($"hi")))
        .select(explode(filter(
          array(
            struct($"hi", $"m".as("lo")),
            struct($"lo".as("hi"), $"m".as("lo"))),
          e => e("hi") =!= e("lo"))).as("e"))
        .select($"e.hi".as("hi"), $"e.lo".as("lo"))
        .distinct().localCheckpoint()
      // next is materialized (localCheckpoint is eager), so the
      // superseded round's blocks are dead — drop them NOW instead of
      // waiting for the driver GC + ContextCleaner to notice the old
      // DataFrame is unreachable. Block memory per round is small
      // (the shrinking edge set), but unbounded rounds of retained
      // generations inside a long bench suite is exactly the
      // GC-pressure shape the r7 verdict asked to rule out. NB this
      // must go through CheckpointOps: Dataset.unpersist is a
      // plan-cache operation and leaves checkpoint blocks in place.
      graft.functions.CheckpointOps.freeLocalCheckpoint(edges)
      edges = next
    }
    // fixpoint = star forest: every non-root has exactly one edge, to
    // its component's minimum; roots (and only roots) appear as `lo`
    val labels = nodes
      .join(edges.select($"hi".as("id"), $"lo".as("c")), Seq("id"), "left")
      .select($"id", coalesce($"c", $"id").as("comp"))
    val sizes = labels.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("comp"))
      .select($"id".as("doc_id"), $"comp".as("cluster_id"), $"cluster_size")
      .orderBy($"doc_id")
  }

  /** Materialized pipeline state, keyed per (session, dir): a real
    * pipeline runs near-dup detection ONCE, materializes the pair
    * table, runs clustering ONCE, materializes the label table, and
    * feeds downstream stages (d06m sizes, d07m apply) from those — the
    * un-suffixed d06/d07 registrations instead re-evaluate the d02
    * plan per query, which is the right *correctness* harness shape
    * but overstates pipeline cost at bench granularity (VERDICT r2/r3).
    * `localCheckpoint` materializes eagerly and cuts lineage.
    *
    * Cache keys hold the SparkSession reference itself (reference
    * equality — SparkSession doesn't override equals), and a
    * session-end listener evicts, so a stopped session's checkpoint
    * blocks are released and an identity-hash collision can never
    * serve a stale frame bound to a dead session (ADVICE r3). */
  private val pairCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val labelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val embLabelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val slotCache =
    scala.collection.concurrent.TrieMap.empty[(String, SparkSession, String), DataFrame]
  private val hooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())
  private def evictOnStop(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          pairCache.keys.filter(_._1 eq s).foreach(pairCache.remove)
          labelCache.keys.filter(_._1 eq s).foreach(labelCache.remove)
          embLabelCache.keys.filter(_._1 eq s).foreach(embLabelCache.remove)
          slotCache.keys.filter(_._2 eq s).foreach(slotCache.remove)
          hooked.remove(s)
        }
      })
    }
  /** Generic named slot in the per-(session, dir) materialized-state
    * cache — same lifecycle (eager localCheckpoint by the builder,
    * eviction on session end) for operators outside this file that
    * need pipeline state (e.g. [[Relational7.materializedCrossPairs]]). */
  private[operators] def materialized(slot: String, s: SparkSession,
      dir: String)(build: => DataFrame): DataFrame = {
    evictOnStop(s)
    slotCache.getOrElseUpdate((slot, s, dir), build)
  }

  def materializedPairs(s: SparkSession, dir: String): DataFrame = {
    evictOnStop(s)
    // full d02 schema (a_id, b_id, jaccard): the clustering consumers
    // re-select (a_id, b_id), while the t29m leakage audit needs the
    // score — one detection pass feeds both (VERDICT r7 #2)
    pairCache.getOrElseUpdate((s, dir),
      Dedup.d02(s, dir).localCheckpoint())
  }

  /** Materialized cluster-label table `(id, comp)` — the d06 fixpoint
    * run once per (session, dir) from the materialized pairs. d06m
    * derives sizes from it; d07m anti-joins it — neither re-runs the
    * iterative clustering (VERDICT r3 #5: d07m cost ≈ d06m + one
    * anti-join, not a second fixpoint). */
  def materializedLabels(s: SparkSession, dir: String): DataFrame = {
    evictOnStop(s)
    labelCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      d06(s, dir, Some(materializedPairs(s, dir)))
        .select($"doc_id".as("id"), $"cluster_id".as("comp"))
        .localCheckpoint()
    })
  }

  /** Materialized semantic-cluster labels `(id, comp)` — d08's
    * pipeline-state form: the s03 thresholded pair set detected once,
    * the CC fixpoint run once per (session, dir) (mirror of
    * [[materializedLabels]] over embedding-space pairs). */
  def materializedEmbLabels(s: SparkSession, dir: String): DataFrame = {
    evictOnStop(s)
    embLabelCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      d06(s, dir, Some(Similarity.d08Pairs(s, dir).localCheckpoint()))
        .select($"doc_id".as("id"), $"cluster_id".as("comp"))
        .localCheckpoint()
    })
  }

  /** d08 output shape from the materialized semantic labels. */
  private def d08FromLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = materializedEmbLabels(s, dir)
    val sizes = labels.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("comp"))
      .select($"id".as("vec_id"), $"comp".as("cluster_id"), $"cluster_size")
      .orderBy($"vec_id")
  }

  /** d06 output shape from a materialized label table: sizes + order. */
  private def d06FromLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = materializedLabels(s, dir)
    val sizes = labels.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("comp"))
      .select($"id".as("doc_id"), $"comp".as("cluster_id"), $"cluster_size")
      .orderBy($"doc_id")
  }

  /** d07 output shape from a materialized label table: one anti-join. */
  private def d07FromLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val drops = materializedLabels(s, dir)
      .filter($"id" =!= $"comp").select($"id".as("doc_id"))
    t(s, dir, "documents")
      .join(drops, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"n_chars")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_cube" -> (q33 _),
    "q34_grouped_topk" -> (q34 _),
    "q35_lead_lag" -> (q35 _),
    "q36_exists_subquery" -> (q36 _),
    "q41_recursive_spine" -> (q41 _),
    "q37_range_frame" -> (q37 _),
    "x02_bloom_prune" -> (x02 _),
    "e02_gap_fill" -> (e02 _),
    "e03_forward_fill" -> (e03 _),
    "d06_dup_clusters" -> ((s, d) => d06(s, d)),
    "d07_cluster_apply" -> ((s, d) => d07(s, d)),
    // the materialized-pipeline forms: identical results (same oracle
    // SQL), detection + clustering cost paid once outside the
    // per-stage plans ([[materializedPairs]]/[[materializedLabels]])
    "d06m_clusters_materialized" -> (d06FromLabels _),
    "d07m_apply_materialized" -> (d07FromLabels _),
    "d09_cc_largestar" -> ((s, d) => d09(s, d)),
    "d08m_semantic_materialized" -> (d08FromLabels _),
  )

  val oracles: Map[String, String] = Map(
    "q33_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        | coalesce(CAST(month(o_orderdate) AS BIGINT), 0) AS mon,
        | CAST(grouping(o_orderpriority) * 2 + grouping(month(o_orderdate)) AS BIGINT) AS gid,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, month(o_orderdate))
        |ORDER BY gid, priority, mon""".stripMargin,
    "q34_grouped_topk" ->
      """SELECT l_returnflag, rank, price, orderkey, linenumber FROM (
        | SELECT l_returnflag,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rank,
        |  round(l_extendedprice, 2) AS price,
        |  l_orderkey AS orderkey,
        |  CAST(l_linenumber AS BIGINT) AS linenumber
        | FROM lineitem)
        |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin,
    "q35_lead_lag" ->
      """SELECT event_id, user_id,
        | value - lag(value, 1) OVER w AS prev_delta,
        | lead(value, 1) OVER w - value AS next_delta,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,
    "q36_exists_subquery" -> q36Sql,
    "q41_recursive_spine" -> q41Sql,
    "q37_range_frame" ->
      """SELECT event_id, user_id,
        | count(*) OVER w AS n_30m,
        | max(value) OVER w AS max_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "x02_bloom_prune" ->
      """SELECT l.l_orderkey AS o_orderkey, l.l_partkey, round(l.l_extendedprice, 2) AS price
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000.0)
        |ORDER BY o_orderkey, l_partkey, price""".stripMargin,
    "e02_gap_fill" ->
      """WITH b AS (SELECT CAST(date_trunc('minute', min(ts)) AS TIMESTAMP) AS mn,
        |    CAST(date_trunc('minute', max(ts)) AS TIMESTAMP) AS mx FROM events),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 minute)) AS minute FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT minute, event_type FROM spine CROSS JOIN types),
        |counts AS (SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT g.minute, g.event_type, coalesce(c.n, 0) AS n
        |FROM grid g LEFT JOIN counts c USING (minute, event_type)
        |ORDER BY minute, event_type""".stripMargin,
    "e03_forward_fill" ->
      """WITH b AS (SELECT CAST(date_trunc('minute', min(ts)) AS TIMESTAMP) AS mn,
        |    CAST(date_trunc('minute', max(ts)) AS TIMESTAMP) AS mx FROM events),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 minute)) AS minute FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT minute, event_type FROM spine CROSS JOIN types),
        |mvals AS (SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
        |    event_type, arg_max(value, event_id) AS v
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT g.minute, g.event_type, m.v
        |  FROM grid g LEFT JOIN mvals m USING (minute, event_type))
        |SELECT minute, event_type, filled FROM (
        | SELECT minute, event_type,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY minute
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        | FROM j)
        |WHERE filled IS NOT NULL
        |ORDER BY minute, event_type""".stripMargin,
    "d06_dup_clusters" ->
      s"""$ccOraclePrefix,
         |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
         |SELECT comp.id AS doc_id, comp.cluster_id, sizes.cluster_size
         |FROM comp JOIN sizes USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "d07_cluster_apply" ->
      s"""$ccOraclePrefix
         |SELECT d.doc_id, d.n_chars FROM documents d
         |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
         |ORDER BY doc_id""".stripMargin,
    // an alternative CC algorithm over the same pairs — same ground truth
    "d09_cc_largestar" ->
      s"""$ccOraclePrefix,
         |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
         |SELECT comp.id AS doc_id, comp.cluster_id, sizes.cluster_size
         |FROM comp JOIN sizes USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    // materialized semantic clusters — same ground truth as d08
    "d08m_semantic_materialized" -> Similarity.oracles("d08_semantic_clusters"),
    // materialized forms compute the same result — same ground truth
    "d06m_clusters_materialized" ->
      s"""$ccOraclePrefix,
         |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
         |SELECT comp.id AS doc_id, comp.cluster_id, sizes.cluster_size
         |FROM comp JOIN sizes USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "d07m_apply_materialized" ->
      s"""$ccOraclePrefix
         |SELECT d.doc_id, d.n_chars FROM documents d
         |WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
         |ORDER BY doc_id""".stripMargin,
  )

  /** Shared recursive-CTE prefix computing connected components of the
    * d02 near-dup pairs: `comp(id, cluster_id)` = min reachable id. */
  private[operators] lazy val ccOraclePrefix: String =
    s"""WITH RECURSIVE
       |pairs AS (SELECT a_id, b_id FROM (${Dedup.oracles("d02_ngram_jaccard")})),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT e.src AS id, rc.r FROM reach rc JOIN edges e ON e.dst = rc.id),
       |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin
}
