package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational22

/** q81's signed retraction algebra, proven on data: the maintained
  * view equals an independent Spark recompute over the post-change
  * tables; the bilinear CROSS TERM is load-bearing (the linear-only
  * expansion provably diverges on this changelog — i.e. the fixture
  * actually exercises double-retraction); and the changelog hits
  * every sign product. */
class Relational22Spec extends SparkSpec {

  import spark.implicits._

  /** Post-change tables restated directly (the oracle's logic, in
    * Spark): the truth q81's state ⊕ delta must reproduce. */
  private def recompute(): DataFrame = {
    val shift = Relational22.RETRACT_SHIFT
    val o = Tables.load(spark, sf, "orders")
    val l = Tables.load(spark, sf, "lineitem")
    val cents = round($"l_extendedprice" * (lit(1) - $"l_discount") *
      lit(100)).cast("long")
    val o2 = o.filter($"o_orderkey" % 13 =!= Relational22.DEL_O_RES)
      .select($"o_orderkey", $"o_orderpriority",
        year($"o_orderdate").cast("long").as("o_year"))
      .unionByName(o.filter($"o_orderkey" % 13 === Relational22.INS_O_RES)
        .select(($"o_orderkey" + shift).as("o_orderkey"),
          $"o_orderpriority", year($"o_orderdate").cast("long").as("o_year")))
    val l2 = l.filter(!($"l_returnflag" === "R" && $"l_orderkey" % 7 === 2))
      .select($"l_orderkey", cents.as("cents"))
      .unionByName(l.filter($"l_orderkey" % 13 === Relational22.INS_O_RES)
        .select(($"l_orderkey" + shift).as("l_orderkey"),
          (cents + 11L).as("cents")))
    o2.join(l2, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority", $"o_year")
      .agg(sum($"cents").as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority", $"o_year")
  }

  private def rows(df: DataFrame): Seq[(String, Long, Long, Long)] =
    df.select($"o_orderpriority", $"o_year", $"revenue_cents", $"n_items")
      .as[(String, Long, Long, Long)].collect().toSeq

  test("q81 state + signed delta equals direct recompute") {
    val got = rows(operators.Relational22.q81(spark, sf))
    val want = rows(recompute())
    assert(got.nonEmpty && got == want)
  }

  test("the bilinear cross term is load-bearing on this changelog") {
    val (oOld, lOld, dO, dL) = Relational22.sides(spark, sf)
    def j(a: DataFrame, b: DataFrame) =
      a.join(b, a("o_orderkey") === b("l_orderkey"))
        .withColumn("m", col("mo") * col("ml"))
    // linear legs only — misses ΔO⋈ΔL, so a join row retracted by
    // BOTH an order delete and a lineitem delete goes out twice
    val linearOnly = Relational22.viewAgg(
      j(oOld, lOld).unionByName(j(dO, lOld)).unionByName(j(oOld, dL)))
      .groupBy($"o_orderpriority", $"o_year")
      .agg(sum($"revenue_cents").as("revenue_cents"),
        sum($"n_items").as("n_items"))
      .filter($"n_items" > 0)
    assert(rows(linearOnly.orderBy($"o_orderpriority", $"o_year"))
      != rows(recompute()),
      "fixture fails to exercise double-retraction — the cross term " +
        "would be untested")
  }

  test("the changelog exercises every sign product") {
    val (oOld, lOld, dO, dL) = Relational22.sides(spark, sf)
    def j(a: DataFrame, b: DataFrame) =
      a.join(b, a("o_orderkey") === b("l_orderkey"))
        .select((col("mo") * col("ml")).as("m"))
    val cross = j(dO, dL).groupBy($"m").count()
      .as[(Long, Long)].collect().toMap
    assert(cross.getOrElse(1L, 0L) > 0,
      "no (+1)(+1) product: inserted orders have no inserted lineitems")
    assert(cross.getOrElse(-1L, 0L) == 0,
      "mixed-sign cross pairs would mean an inserted row joined a " +
        "deleted one — the shift failed its isolation job")
    val doubleDel = j(dO.filter($"mo" === -1L), dL.filter($"ml" === -1L))
      .count()
    assert(doubleDel > 0,
      "no (-1)(-1) product: no order delete overlaps a lineitem delete")
  }
}
