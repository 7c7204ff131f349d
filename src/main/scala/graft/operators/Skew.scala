package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SCALING.md): at 100 TB a handful of hot
  * keys (the empty document, a bot user_id, a stop-shingle) can pin a
  * single reducer for hours. Two standard remedies, engine-provided:
  *
  *  - AQE skew-join splitting is on by default in Bench and handles
  *    sort-merge joins transparently;
  *  - [[saltedJoin]] is the explicit form for aggregations/joins AQE
  *    cannot split (e.g. a shuffled join against a medium dimension
  *    that is too big to broadcast): the big side scatters each key
  *    across `factor` salt buckets, the small side replicates each row
  *    `factor` times, and the join key becomes (key, salt). Result
  *    rows are identical to the unsalted join — only the partitioning
  *    changes.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `factor` ways.
    *
    * Restricted to join types where replicating the small side is
    * result-preserving: under right_outer/full_outer an unmatched
    * small-side row would surface once per salt replica (`factor`
    * copies instead of one), so those types are rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports $allowed; '$joinType' would duplicate " +
        "unmatched replicated small-side rows")
    val salted = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop(replicated(key)).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * aggregate per (key, salt) first, then merge the partials — the
    * manual form of map-side combine for agg functions Spark cannot
    * partially aggregate automatically inside one shuffle. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(col(valueCol), monotonically_increasing_id()), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))
}
