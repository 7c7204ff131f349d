package graft

import graft.operators.Relational24

/** s25's decision semantics: the pure composition over all 8 breach
  * combinations, the registered report's self-consistency (its
  * decision row must equal the pure composition over its own metric
  * rows), and the fixture's non-triviality (a MIXED decision — one
  * metric quiet, two breached — so both branches of every CASE are
  * exercised under the oracle hash). */
class Relational24Spec extends SparkSpec {

  test("decideActions composes breaches in severity order") {
    assert(Relational24.decideActions(false, false, false) == "noop")
    assert(Relational24.decideActions(true, false, false) == "rebuild")
    assert(Relational24.decideActions(false, true, false) == "fold_inserts")
    assert(Relational24.decideActions(false, false, true) == "repair_deletes")
    assert(Relational24.decideActions(true, true, false) ==
      "rebuild,fold_inserts")
    assert(Relational24.decideActions(true, false, true) ==
      "rebuild,repair_deletes")
    assert(Relational24.decideActions(false, true, true) ==
      "fold_inserts,repair_deletes")
    assert(Relational24.decideActions(true, true, true) ==
      "rebuild,fold_inserts,repair_deletes")
    // the r17 quantizer-staleness axis composes LAST (lowest urgency:
    // frozen-codebook inserts degrade gracefully)
    assert(Relational24.decideActions(false, false, false, cbBreach = true) ==
      "retrain_quantizers")
    assert(Relational24.decideActions(true, true, true, cbBreach = true) ==
      "rebuild,fold_inserts,repair_deletes,retrain_quantizers")
    assert(Relational24.decideActions(false, true, false, cbBreach = true) ==
      "fold_inserts,retrain_quantizers")
  }

  test("report decision row equals the pure composition of its metrics") {
    val rows = Relational24.s25(spark, sf).collect()
      .map(r => r.getAs[String]("metric") ->
        (r.getAs[Boolean]("breached"), r.getAs[String]("action"))).toMap
    val expected = Relational24.decideActions(
      rows("delete_frac")._1, rows("insert_frac")._1,
      rows("damaged_edge_frac")._1, rows("codebook_staleness")._1)
    assert(rows("decision")._2 == expected)
    assert(rows("decision")._1 ==
      (rows("delete_frac")._1 || rows("insert_frac")._1 ||
        rows("damaged_edge_frac")._1 || rows("codebook_staleness")._1))
  }

  test("the fixture yields a mixed decision (both CASE branches live)") {
    val rows = Relational24.s25(spark, sf).collect()
      .map(r => r.getAs[String]("metric") ->
        (r.getAs[Boolean]("breached"), r.getAs[String]("action"))).toMap
    assert(!rows("delete_frac")._1 && rows("delete_frac")._2 == "none")
    assert(rows("insert_frac")._1 && rows("insert_frac")._2 == "fold_inserts")
    assert(rows("damaged_edge_frac")._1 &&
      rows("damaged_edge_frac")._2 == "repair_deletes")
    // the ~1/8 hash arrival share sits between the 10% fold bar and
    // the 20% retrain bar — staleness visible but quiet, both CASE
    // branches of the new row exercised across the two thresholds
    assert(!rows("codebook_staleness")._1 &&
      rows("codebook_staleness")._2 == "none")
    assert(rows("decision")._2 == "fold_inserts,repair_deletes")
  }
}
