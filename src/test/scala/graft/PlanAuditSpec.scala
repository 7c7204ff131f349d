package graft

import graft.operators.{Relational, Relational4}

/** Physical-plan audits (the "is this the plan you'd want at 100 TB"
  * checks, asserted so they can't silently regress):
  *  - filters reach the parquet scan (PushedFilters) and the scan reads
  *    only referenced columns (ReadSchema pruning);
  *  - small dimension joins are broadcast, not shuffled;
  *  - aggregations are partial (map-side combine) before the shuffle;
  *  - the typed top-k aggregator partial-aggregates too (its whole
  *    point: ≤ k rows per group cross the wire).
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates push down and the scan prunes columns") {
    val plan = planOf(Relational.q02(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate range must reach the scan")
    // scan must not read the full 11-column lineitem schema
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"),
      s"unreferenced columns must be pruned: $readSchema")
  }

  test("q04: dimension joins broadcast, no shuffle of the dims") {
    val plan = planOf(Relational.q04(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!plan.contains("CartesianProduct"), "no cartesian products")
  }

  test("q01: aggregation is partial before the shuffle") {
    val plan = planOf(Relational.q01(spark, sf))
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, plan:\n${plan.take(1500)}")
    assert(plan.contains("partial_"), "map-side combine must run")
  }

  test("d04: banded simhash plan has no all-pairs join") {
    val plan = planOf(graft.operators.Dedup.d04(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded simhash must not plan an all-pairs join:\n${plan.take(2000)}")
  }

  test("s03: bucketed near-dup plan has no all-pairs join") {
    val plan = planOf(graft.operators.Similarity.s03(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed candidates must not plan an all-pairs join:\n${plan.take(2000)}")
  }

  test("t13: sharded packing window is partitioned, t12's is global") {
    val sharded = planOf(graft.operators.Relational5.t13(spark, sf))
    assert(sharded.contains("hashpartitioning(shard"),
      s"sharded packing must sort per shard, not globally:\n${sharded.take(2000)}")
    val global = planOf(graft.operators.Relational5.t12(spark, sf))
    assert(global.contains("SinglePartition"),
      "the global form is the single-stream (one-partition-sort) baseline")
  }

  test("q34: typed top-k aggregator partial-aggregates") {
    val plan = planOf(Relational4.q34(spark, sf))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.contains("partial_"),
      "the aggregator's map side must reduce groups to k rows before the shuffle")
  }
}
