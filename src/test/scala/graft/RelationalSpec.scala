package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("q01 aggregates match a hand check") {
    import org.apache.spark.sql.functions._
    val got = Relational.q01(spark, sf).collect()
    val li = Tables.load(spark, sf, "lineitem")
    val expectTotal = li.filter(col("l_shipdate") <= to_timestamp(lit("1999-12-31 00:00:00"))).count()
    assert(got.map(_.getAs[Long]("count_order")).sum == expectTotal)
  }

  test("q07 merge routing covers all orders") {
    val got = Relational.q07(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.load(spark, sf, "orders").count()
    assert(got.values.sum == orders)
  }

  test("q10 topk is sorted descending") {
    val prices = Relational.q10(spark, sf).collect().map(_.getDouble(2))
    assert(prices.length == 20)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }
}
