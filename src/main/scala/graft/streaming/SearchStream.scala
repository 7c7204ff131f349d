package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One arriving keyword query: an id and its term set. */
case class TermQuery(q_id: Long, terms: Seq[String])

/** Streaming face of the KEYWORD retrieval tier (t45's serving side —
  * the AnnStream pattern applied to text): conjunctive term-set
  * queries arrive as a stream, a replay guard admits each q_id
  * AT MOST ONCE (8 B of keyed state per served query; a re-delivered
  * or duplicated query is a no-op), and the trigger-side refresh runs
  * the admitted queries through the EXACT batch serving body
  * ([[graft.operators.Relational23.conjunctiveServe]] — posting
  * semi-join, AND-aggregate, bounded top-k), so the answer for query
  * set Q equals batch t45 restricted to Q row for row. One scoring
  * body, structural parity — never a streaming reimplementation.
  *
  * At 100 TB: the per-refresh cost is the admitted queries' posting
  * lists (document-frequency-sized); the corpus-sized index build is
  * paid once and maintained live by [[IndexStream]] (df/cf
  * statistics) — a production deployment materializes the (doc,
  * term, tf) postings as a table asset the refresh reads instead of
  * re-deriving (the s12m/knn_edges convention); the replay-guard
  * state is one flag per query ever served. */
object SearchStream {

  val querySchema: StructType = StructType(Seq(
    StructField("q_id", LongType),
    StructField("terms", ArrayType(StringType))))

  /** Arriving term-set queries from a parquet directory feed. */
  def queryStream(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(querySchema).options(options).parquet(dir)

  /** The at-most-once replay guard (the AnnStream shape): admit each
    * q_id's first arrival, drop every replay.
    *
    * CONTRACT (ADVICE r14): replay identity is the q_id ALONE — the
    * state is one Boolean per served id, and a re-delivered q_id is
    * dropped even if it arrives with a DIFFERENT term set (q_id is
    * the query's identity; re-issuing changed terms under the same id
    * is a producer bug, and "which version wins" within one batch
    * follows file/row order exactly as any at-most-once dedup does).
    * A deployment that wants changed-terms detection stores a terms
    * hash in this state and alerts on mismatch — not silently
    * re-serving, which would break the at-most-once guarantee the
    * guard exists to give. */
  def admittedOnce(q: DataFrame): Dataset[TermQuery] = {
    val spark = q.sparkSession
    import spark.implicits._
    q.as[TermQuery].groupByKey(_.q_id)
      .flatMapGroupsWithState[Boolean, TermQuery](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[TermQuery], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }

  /** Trigger-side serving: the admitted queries through the batch
    * conjunctive body. Terms are de-duplicated defensively (the AND
    * count compares against n_terms, so a duplicated term would
    * otherwise demand itself twice). */
  def serveRefresh(spark: SparkSession, dir: String,
      admitted: DataFrame): DataFrame = {
    val qt = admitted
      .select(col("q_id"), array_distinct(col("terms")).as("terms"))
      .select(col("q_id"), size(col("terms")).cast("long").as("n_terms"),
        explode(col("terms")).as("term"))
      .localCheckpoint()
    graft.operators.Relational23.conjunctiveServe(spark, dir, qt)
  }

  /** Trigger-side PHRASE serving (t46's live face — r14 verdict #7):
    * admitted queries whose `terms` is an exact-phrase token sequence
    * go through the SAME batch phrase body
    * ([[graft.operators.Relational25.phraseServe]] — per-row array
    * sweep over a broadcast phrase table), so the answer for phrase
    * set Q equals batch t46 restricted to Q row for row. The replay
    * guard is [[admittedOnce]] UNCHANGED — a phrase query is a
    * TermQuery whose term order is significant; only the serving body
    * differs. Arrivals that are not exactly PHRASE_LEN tokens are
    * dropped (the fixed-length phrase is t46's contract; a variable-
    * length face would be a different operator, not a laxer parse). */
  def phraseRefresh(spark: SparkSession, dir: String,
      admitted: DataFrame): DataFrame = {
    val phLen = graft.operators.Relational25.PHRASE_LEN
    // projection derived from PHRASE_LEN (ADVICE r15: a hardcoded
    // t1..t3 would silently truncate if the phrase length ever moved)
    val termCols = (0 until phLen).map(i =>
      col("terms").getItem(i).as(s"t${i + 1}"))
    val ph = admitted
      .filter(size(col("terms")) === phLen)
      .select(col("q_id") +: termCols: _*)
      .localCheckpoint()
    graft.operators.Relational25.phraseServe(spark, dir, ph)
  }
}
