package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.RankOps

/** The windowless global-ordinal kernel behind e16's exact ntile and
  * s18's degree orientation: pins bit-equality against the
  * single-partition window forms it replaces, including the awkward
  * `n % k != 0` and `n < k` tile boundaries. */
class RankOpsSpec extends SparkSpec {

  import spark.implicits._

  test("globalOrdinal equals row_number() over the global window") {
    // scrambled keys incl. duplicates on the first key (tie-break on id)
    val df = spark.range(0, 997)
      .select($"id", pmod(hash($"id".cast("string")).cast("long"),
        lit(113L)).as("k"))
    val got = RankOps.globalOrdinal(df, Seq($"k".asc, $"id".asc), "idx",
        partitions = 7)
      .select($"id", $"idx")
    val want = df.select($"id",
      (row_number().over(Window.orderBy($"k", $"id")) - 1)
        .cast("long").as("idx"))
    assert(got.join(want, Seq("id"))
      .filter(got("idx") =!= want("idx")).count() == 0)
    assert(got.count() == 997)
    // descending keys too (the e16 freq/cents direction)
    val gotD = RankOps.globalOrdinal(df, Seq($"k".desc, $"id".asc), "idx",
        partitions = 7)
      .select($"id", $"idx".as("gidx"))
    val wantD = df.select($"id",
      (row_number().over(Window.orderBy($"k".desc, $"id")) - 1)
        .cast("long").as("widx"))
    assert(gotD.join(wantD, Seq("id"))
      .filter($"gidx" =!= $"widx").count() == 0)
  }

  test("tileOf equals ntile for awkward n (remainders, n < k)") {
    for (n <- Seq(1L, 3L, 5L, 7L, 100L, 101L, 104L)) {
      val df = spark.range(0, n).select($"id".as("idx"))
      val got = df.select($"idx",
        RankOps.tileOf(n, 5)($"idx").as("tile"))
      val want = df.select($"idx",
        ntile(5).over(Window.orderBy($"idx")).cast("long").as("wtile"))
      val bad = got.join(want, Seq("idx"))
        .filter($"tile" =!= $"wtile").count()
      assert(bad == 0, s"tileOf diverges from ntile at n=$n")
    }
  }
}
