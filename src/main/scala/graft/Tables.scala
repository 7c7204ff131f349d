package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for the driver-generated test tables (TESTDATA.md,
  * FIXTURES.md §5). All queries load through here so the scan path is
  * uniform: parquet with Catalyst pushdown (column pruning + predicate
  * pushdown reach the scan automatically — verified via
  * `.explain("formatted")` PushedFilters/ReadSchema).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loader stays the single seam where `spark.read.parquet` would become
  * a catalog lookup.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read
      // natively; read nanos as LONG and truncate to micros (exactly what
      // DuckDB's TIMESTAMP_NS → TIMESTAMP cast does, keeping the oracle
      // comparable). `div` keeps the arithmetic integral — a double
      // division would lose precision above 2^53 ns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
