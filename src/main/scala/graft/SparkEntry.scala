package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions, §7.2) registers a `queries` entry; SQL-expressible ones
  * also register a DuckDB oracle with identical column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5 shape: fact-fact shuffle joins + broadcast dims + agg. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ EventWindows.queries ++ Relational2.queries ++ AsOfJoin.queries ++ Relational3.queries ++ Curation.queries ++ Relational4.queries ++ Relational5.queries ++ Relational6.queries ++ Relational7.queries ++ Relational8.queries ++ Relational9.queries ++ Relational10.queries ++ Relational11.queries ++ Relational12.queries ++ Relational13.queries ++ Relational14.queries ++ Relational15.queries ++ Relational16.queries ++ Relational17.queries ++ Relational18.queries ++ Relational19.queries ++ Relational20.queries ++ Relational21.queries ++ Relational22.queries ++ Relational23.queries ++ Relational24.queries ++ Relational25.queries ++ Fuzz.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ EventWindows.oracles ++ Relational2.oracles ++ AsOfJoin.oracles ++ Relational3.oracles ++ Curation.oracles ++ Relational4.oracles ++ Relational5.oracles ++ Relational6.oracles ++ Relational7.oracles ++ Relational8.oracles ++ Relational9.oracles ++ Relational10.oracles ++ Relational11.oracles ++ Relational12.oracles ++ Relational13.oracles ++ Relational14.oracles ++ Relational15.oracles ++ Relational16.oracles ++ Relational17.oracles ++ Relational18.oracles ++ Relational19.oracles ++ Relational20.oracles ++ Relational21.oracles ++ Relational22.oracles ++ Relational23.oracles ++ Relational24.oracles ++ Relational25.oracles ++ Fuzz.oracles
}
