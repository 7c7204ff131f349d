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
    (1 to 44).foreach { i =>
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
    // the ADVICE-r14 widening: at least one committed KeyMod carries a
    // NON-ZERO remainder (the modulo-residue surface was never hit
    // when the remainder was pinned to 0)
    val all = (1 to 20).map(Fuzz.describe)
    assert(all.exists(d => "KeyMod\\((\\d+),([1-9]\\d*)\\)".r
      .findFirstIn(d).isDefined), "no non-zero KeyMod remainder committed")
  }

  test("the nullable seeds (fz13-fz20) cover the null-semantics axes") {
    val descs = (13 to 20).map(Fuzz.describe)
    assert(descs.forall(_.contains("leftjoin")), "null axis must LEFT JOIN")
    assert(descs.exists(_.contains("nullPred=1")), "no IS NULL shape")
    assert(descs.exists(_.contains("nullPred=2")), "no IS NOT NULL shape")
    assert(descs.exists(_.contains("nullPred=0")), "no unfiltered-null shape")
    assert(descs.exists(_.contains("keyPri=true")),
      "no GROUP BY nullable-key shape")
    assert(descs.exists(_.contains("minYear=true")),
      "no MIN-over-nullable shape")
    // every nullable output column is coalesced in the SQL renderer —
    // the gate sorts rows as Python tuples, where None is unordered
    (13 to 20).map(Fuzz.sqlFor).foreach { sql =>
      if (sql.contains("AS k_pri")) assert(sql.contains("coalesce(o_orderpriority"))
      if (sql.contains("AS mn_year")) assert(sql.contains("coalesce(min(o_year)"))
    }
  }

  test("the string seeds (fz21-fz28) cover the string-semantics axes") {
    val descs = (21 to 28).map(Fuzz.describe)
    assert(descs.forall(_.contains("strjoin")), "string axis joins customer")
    assert(descs.exists(_.contains("keyKind=0")), "no global shape")
    assert((1 to 4).exists(k => descs.exists(_.contains(s"keyKind=$k"))),
      "no string GROUP BY key shape")
    assert(descs.exists(_.contains("min=true")), "no string MIN shape")
    assert(descs.exists(_.contains("max=true")), "no string MAX/concat shape")
    assert(descs.exists(d => d.contains("(0,") || d.contains("(1,") ||
      d.contains("(2,")), "no LIKE predicate committed")
  }

  test("the timestamp seeds (fz29-fz36) cover the date-arithmetic axes") {
    val descs = (29 to 36).map(Fuzz.describe)
    assert(descs.forall(_.contains("tsjoin")), "ts axis joins orders")
    assert(descs.exists(_.contains("keyKind=1")),
      "no date_trunc GROUP BY shape")
    assert(descs.exists(_.contains("keyKind=4")),
      "no datediff-bucket key shape (the argument-order trap)")
    assert(descs.exists(_.contains("minTs=true")), "no timestamp MIN shape")
    assert(descs.exists(_.contains("maxIv=true")),
      "no interval-arithmetic measure shape")
    assert(descs.exists(_.contains("lag=true")),
      "no two-date difference measure shape")
  }

  test("the multi-way seeds (fz37-fz44) cover the join-plan axes") {
    val descs = (37 to 44).map(Fuzz.describe)
    assert(descs.forall(_.contains("mjoin")), "mj axis must be 3-table")
    assert(descs.exists(_.contains("lo=left")), "no LEFT l→o shape")
    assert(descs.exists(_.contains("lo=inner")), "no INNER l→o shape")
    assert(descs.exists(_.contains("c=left")), "no LEFT →customer shape")
    assert(descs.exists(_.contains("c=inner")), "no INNER →customer shape")
    assert(descs.exists(_.contains("assoc=0")) &&
      descs.exists(_.contains("assoc=1")),
      "both association orders must be committed")
    assert(descs.exists(d => d.contains("keyKind=1") ||
      d.contains("keyKind=2") || d.contains("keyKind=4")),
      "no nullable GROUP BY key shape")
    assert(descs.exists(_.contains("min=true")),
      "no nullable MIN measure shape")
    // every nullable output is coalesced in BOTH renderers (the fz13
    // tuple-sort rule)
    (37 to 44).map(Fuzz.sqlFor).foreach { sql =>
      if (sql.contains("AS k_seg")) assert(sql.contains("coalesce(c_mktsegment"))
      if (sql.contains("AS k_pri")) assert(sql.contains("coalesce(o_orderpriority"))
      if (sql.contains("AS mn")) assert(sql.contains("coalesce(min(o_orderkey)"))
    }
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
