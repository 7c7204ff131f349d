package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NativeKernels.word_tokens

/** Streaming inverted-index statistics maintenance — the live face of
  * the t38 retrieval family: as documents arrive, keep the per-term
  * (df, cf) table current (df = documents containing the term, cf =
  * total occurrences). These are the statistics BM25's idf and every
  * dictionary-driven operator (t18's NLL vocab, t22's OOV table) read;
  * a crawler-fed corpus maintains them incrementally, not by
  * re-scanning the corpus per refresh.
  *
  * Shape: the per-document term frequencies are computed STATELESSLY
  * per row ([[termTfPairs]] — a run-length fold over the sorted token
  * array, no aggregate), so the whole query needs exactly ONE
  * stateful operator: a complete-mode groupBy(term) over (df += 1,
  * cf += tf) increments. Spark forbids chained streaming aggregations
  * — the naive explode → groupBy(doc, term) → groupBy(term) form is
  * unplannable — and both counters are SUMS, so any arrival order and
  * any micro-batch split produce the identical table (the
  * countMinStream argument; parity with the batch aggregate is
  * spec-asserted). Assumes the file-source's exactly-once delivery:
  * re-delivered documents would double-count, the trade every
  * counter-sum index accepts (the dedup-first topology composes
  * [[CorpusStream]] in front when the feed is at-least-once).
  *
  * At 100 TB: state is one (df, cf) pair per DISTINCT TERM —
  * vocabulary-bounded, never corpus-bounded; each micro-batch
  * shuffles its own (term, tf) pairs only. */
object IndexStream {

  /** Per-row (term, tf) pairs of a token-array column: runs of equal
    * tokens in the sorted array, fold-free and aggregate-free so a
    * streaming query can apply it before its single stateful operator.
    * Empty/whitespace-only docs yield an empty array (guarded —
    * `sequence(1, 0)` would DESCEND, the t17 clamp lesson). */
  def termTfPairs(tk: Column): Column = {
    val st = array_sort(tk)
    val n = size(st)
    val starts = filter(sequence(lit(1), n),
      i => (i === 1) || (element_at(st, i) =!= element_at(st, i - 1)))
    val ends = concat(
      slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
      array(n + 1))
    when(n > 0,
      zip_with(starts, ends, (s, e) =>
        struct(element_at(st, s).as("term"), (e - s).cast("long").as("tf"))))
      .otherwise(array().cast("array<struct<term:string,tf:bigint>>"))
  }

  /** The live (term, df, cf) table over a documents stream (needs a
    * `text` column). Complete output mode: each trigger emits the
    * full current table. */
  def tfIndexStream(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(termTfPairs(word_tokens($"text"))).as("p"))
      .groupBy($"p.term".as("term"))
      .agg(count(lit(1)).as("df"), sum($"p.tf").as("cf"))
  }

  /** Batch equivalent over a static documents frame — literally the
    * same frame-builder applied to a static input (the plan is
    * identical modulo the source), so the parity spec measures the
    * streaming machinery (micro-batching, state, output mode) and the
    * two faces can never drift (ADVICE r10). */
  def tfIndexBatch(docs: DataFrame): DataFrame = tfIndexStream(docs)
}
