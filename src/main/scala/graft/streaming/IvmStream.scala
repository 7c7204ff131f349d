package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One signed join-row delta — what Δ(O⋈L) emits batch-side
  * ([[graft.operators.Relational22.signedDelta]]) and what a
  * database's CDC feed emits for a join view's base rows: the group
  * key, the measure, and a multiplicity (+1 insert / −1 retract). */
case class SignedJoinRow(o_orderpriority: String, o_year: Long,
    cents: Long, m: Long)

/** Running signed view state per group: n = Σm, revenue = Σ m·cents.
  * `upd` is the batch ordinal (the ProfileStream convention: an
  * append log's last emission per key is current). */
case class ViewState(upd: Long, n: Long, revenue_cents: Long)

/** One emitted view row; `live` = the group currently has members —
  * a group whose multiplicities cancel to zero must read as ABSENT
  * (q81's `n_items > 0` filter), and the state face additionally
  * FREES its state. */
case class ViewRow(o_orderpriority: String, o_year: Long, upd: Long,
    revenue_cents: Long, n_items: Long, live: Boolean)

/** One emitted extrema row from the retraction-safe min/max face
  * ([[IvmStream.minmaxTws]]) — batch q82's columns plus q83's
  * n_distinct (the same surviving-entry scan yields both), the
  * emission ordinal and the tombstone flag. */
case class ExtremaRow(o_orderpriority: String, o_year: Long, upd: Long,
    min_cents: Long, max_cents: Long, n_distinct: Long, n_items: Long,
    live: Boolean)

/** Streaming face of q81's retractable join-view maintenance (the
  * DBSP consumption contract): GIVEN a signed join-row changelog,
  * keeping the view current is ONE mergeable aggregate — every
  * maintained statistic is a sum weighted by multiplicity, so any
  * arrival order and any micro-batch split fold to the identical
  * view (StreamIvmSpec feeds the full signed history, old rows and
  * deltas interleaved, and asserts bit parity with batch q81).
  *
  * Two faces, both reading the SAME signed-sum definition as the
  * batch query (the ProfileStream convention — the faces cannot
  * drift):
  *
  *  - [[viewAgg]]: one complete-mode groupBy whose state IS the view
  *    (view-sized, the cheapest face);
  *  - [[view]]: flatMapGroupsWithState keyed by group with explicit
  *    [[ViewState]], whose retraction-specific behavior the
  *    aggregate face can't show: a group whose membership cancels to
  *    zero has its state REMOVED (not kept as a zero row) — at
  *    100 TB a churn-heavy changelog otherwise accretes dead groups
  *    forever.
  *
  * The honest boundary (stated at q81 too): only SIGNED-SUM
  * statistics maintain at constant per-group state. A min/max under
  * retraction needs the full value multiset — batch q82 maintains
  * exactly that (a two-level aggregate whose level-1 state is the
  * signed multiset), and [[minmaxTws]] (r15 verdict #5) is its live
  * face: a transformWithState processor whose MapState IS q82's
  * level-1 state keyed (group → value → signed multiplicity), with
  * zero-multiplicity entries freed on the spot (the tombstone-face
  * state discipline) and the extrema AND the exact distinct count
  * (batch q83 — one multiset, three statistics) re-derived per batch
  * from the surviving entries only — never from the base tables. The
  * per-group state is value-domain-sized, q82's documented price;
  * the sum-only faces above stay the constant-state tier.
  *
  * At 100 TB: state is live-group-sized (sum faces) or live-(group ×
  * distinct-value)-sized (extrema face); each micro-batch shuffles
  * its own delta rows once on the group key. Deletes cost what
  * inserts cost. */
object IvmStream {

  /** The view as a streaming aggregate (complete mode) — DELEGATES to
    * `Relational22.viewAgg` (ADVICE r14: the anti-drift claim must be
    * structural, the SearchStream/conjunctiveServe pattern — a copy
    * here could silently diverge from the batch definition); works
    * identically on a batch frame (the parity twin). Read with
    * `n_items > 0`. */
  def viewAgg(deltas: DataFrame): DataFrame =
    graft.operators.Relational22.viewAgg(deltas)

  /** Fold one batch of signed rows into a group's running state —
    * the shared pure core. Commutative and associative across any
    * batch split. */
  def foldSigned(prev: ViewState, upd: Long,
      rows: Iterator[SignedJoinRow]): ViewState =
    rows.foldLeft(prev.copy(upd = upd)) { (p, r) =>
      p.copy(n = p.n + r.m, revenue_cents = p.revenue_cents + r.m * r.cents)
    }

  private val empty = ViewState(-1L, 0L, 0L)

  /** flatMapGroupsWithState face: (priority, year) → running signed
    * state; emits the updated view row each batch and REMOVES the
    * state of a group whose membership cancelled to zero (emitting
    * one final `live = false` tombstone row so a downstream sink can
    * retract its copy). */
  def view(deltas: Dataset[SignedJoinRow]): Dataset[ViewRow] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val s = deltas.sparkSession
    import s.implicits._
    deltas.groupByKey(r => (r.o_orderpriority, r.o_year))
      .flatMapGroupsWithState[ViewState, ViewRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[SignedJoinRow],
            state: GroupState[ViewState]) =>
          val prev = state.getOption.getOrElse(empty)
          val next = foldSigned(prev, prev.upd + 1, rows)
          if (next.n == 0L) state.remove() else state.update(next)
          Iterator(ViewRow(key._1, key._2, next.upd,
            next.revenue_cents, next.n, next.n != 0L))
      }
  }

  /** RETRACTION-SAFE MIN/MAX face (r15 verdict #5) — batch q82's
    * two-level algebra live: MapState holds the level-1 signed value
    * multiset (value → multiplicity; negative allowed — a retraction
    * arriving BEFORE the row it cancels must be remembered so the
    * later insert annihilates it, the q81 any-order property one
    * level finer). An entry folding to zero is REMOVED — on a
    * churn-heavy changelog the freed entries are the difference
    * between value-domain-sized and ever-growing state. Level 2
    * re-derives (min, max, n) per batch from the SURVIVING positive
    * entries only — a MapState scan of this group's live values,
    * never a base-table read (the q82 contract). A group whose
    * positive membership empties emits a `live = false` tombstone;
    * its zero-multiplicity entries are freed, while entries with
    * OUTSTANDING NEGATIVE multiplicity (early retractions) are
    * correctly retained until their matching inserts annihilate
    * them, and only those plus the 8-byte emission ordinal survive
    * (so a returning group's emissions stay monotone — the ordinal
    * is not the state cliff).
    * StreamIvmSpec replays the chunked signed history, retractions
    * interleaved before their inserts, and asserts the settled face
    * equals batch q82 exactly. */
  class MinMaxProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (String, Long), SignedJoinRow, ExtremaRow] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var mult: MapState[Long, Long] = _
    @transient private var upd: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      mult = getHandle.getMapState[Long, Long]("mult",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      upd = getHandle.getValueState[Long]("upd",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: (String, Long),
        rows: Iterator[SignedJoinRow],
        tv: TimerValues): Iterator[ExtremaRow] = {
      rows.foreach { r =>
        val cur = if (mult.containsKey(r.cents)) mult.getValue(r.cents) else 0L
        val next = cur + r.m
        if (next == 0L) mult.removeKey(r.cents) // freed, not zeroed
        else mult.updateValue(r.cents, next)
      }
      val u = (if (upd.exists()) upd.get() else -1L) + 1L
      upd.update(u)
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var n = 0L
      var nd = 0L // q83: distinct = surviving-entry count, same scan
      mult.keys().foreach { v =>
        val m = mult.getValue(v)
        if (m > 0L) { // q82's `mult > 0` filter
          if (v < mn) mn = v
          if (v > mx) mx = v
          n += m
          nd += 1L
        }
      }
      if (n == 0L) Iterator(ExtremaRow(key._1, key._2, u, 0L, 0L, 0L, 0L,
        live = false))
      else Iterator(ExtremaRow(key._1, key._2, u, mn, mx, nd, n,
        live = true))
    }
  }

  /** The extrema face as a streaming transform — see
    * [[MinMaxProcessor]]. */
  def minmaxTws(deltas: Dataset[SignedJoinRow]): Dataset[ExtremaRow] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s = deltas.sparkSession
    import s.implicits._
    deltas.groupByKey(r => (r.o_orderpriority, r.o_year))
      .transformWithState(new MinMaxProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
