package graft

import graft.operators.Fuzz

/** The differential-fuzz generator's contract: purity (same seed →
  * same artifact, across calls and across the Spark/SQL renderers'
  * shared AST), feature coverage across the committed 12 seeds, and
  * executability of every generated plan. The cross-engine EQUALITY
  * itself is the driver gate's job — these rows are ordinary oracle
  * rows there. */
class FuzzSpec extends SparkSpec {

  test("generator is a pure function of the seed") {
    (1 to 12).foreach { i =>
      assert(Fuzz.describe(i) == Fuzz.describe(i))
      assert(Fuzz.sqlFor(i) == Fuzz.sqlFor(i))
    }
  }

  test("the committed seeds cover the algebra's feature axes") {
    val descs = (1 to 12).map(Fuzz.describe)
    assert(descs.exists(_.contains("join=true")), "no join shape")
    assert(descs.exists(_.contains("join=false")), "no single-table shape")
    assert(descs.exists(_.contains("keys=[]")), "no global-aggregate shape")
    assert(descs.exists(d => !d.contains("keys=[]")), "no grouped shape")
    assert(descs.exists(_.contains("having=Some")), "no HAVING shape")
    assert(descs.exists(_.contains("preds=[]")), "no filterless shape")
    assert(descs.exists(d => d.contains("QtyLe") || d.contains("KeyMod") ||
      d.contains("ShipGe") || d.contains("FlagNe")), "no predicates at all")
  }

  test("every generated plan executes and the renderers agree on columns") {
    Fuzz.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val sparkCols = df.columns.toSet
      val sql = Fuzz.oracles(name).toLowerCase
      // every Spark output column must appear as an alias or bare key
      // in the SQL text (the gate compares by sorted column name)
      sparkCols.foreach(c =>
        assert(sql.contains(c.toLowerCase), s"$name: column $c missing in SQL"))
      df.collect() // must execute without error (rows may legally be 0)
    }
  }
}
