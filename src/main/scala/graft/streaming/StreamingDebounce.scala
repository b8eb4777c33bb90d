package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q56's event debounce: collapse each
  * (user, type) stream's bursts to their FIRST event AT INGEST.
  *
  * The state is deliberately the last SEEN timestamp, not the last
  * KEPT one — the two differ and only the former matches the batch
  * gaps-and-islands semantics: for events at 0 h, 0.5 h, 1.2 h with a
  * 1 h gap, the batch operator sees one burst (each gap < 1 h) and
  * keeps only the first, while a last-KEPT rate limiter would re-emit
  * the 1.2 h event (1.2 h since the kept one). A burst is extended by
  * every arrival; an event opens a new burst — and is kept — exactly
  * when it arrives ≥ `gapMicros` after the previous arrival.
  * `StreamingDebounceSpec` pins the parity against the shared batch
  * derivation, including the burst-chain case above and chains
  * crossing micro-batch boundaries.
  *
  * Scale shape: one long of state per live (user, type) key; the
  * stateful shuffle partitions by key; each event costs O(1). Events
  * must arrive per-key in event-time order across triggers (the
  * StreamingGapFill contract — feed from a watermarked, ordered
  * upstream; within a micro-batch rows are sorted here). Cross-batch
  * violations are DETECTED, not silently absorbed: a row whose event
  * time precedes the key's last seen arrival comes back with
  * `late=true` (and `kept=false`, without rewinding the state), so
  * the divergence from the batch reference is observable.
  */
object StreamingDebounce {

  case class Ev(key: String, event_id: Long, eus: Long)

  /** `late` = the event arrived in a later micro-batch with an
    * event time BEFORE the key's last seen arrival — a violation of
    * the cross-batch ordering contract. Such rows are never kept
    * (their gap is ill-defined) and never rewind the state, but they
    * are flagged instead of silently folded into `kept=false`, so a
    * caller can alert on `late=true` counts rather than discover the
    * divergence from the batch reference by accident.
    */
  case class Verdict(
      key: String, event_id: Long, eus: Long, kept: Boolean,
      late: Boolean)
  case class DebounceState(lastSeenEus: Long)

  def debounce(
      ev: Dataset[Ev],
      gapMicros: Long = 3600000000L): Dataset[Verdict] = {
    require(gapMicros > 0, s"gapMicros must be positive: $gapMicros")
    val session = ev.sparkSession
    import session.implicits._
    ev.groupByKey(_.key)
      .flatMapGroupsWithState[DebounceState, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          // (eus, event_id) order makes within-batch processing
          // deterministic (micro-batch row order is not)
          val sorted = rows.toSeq.sortBy(r => (r.eus, r.event_id))
          var lastSeen = state.getOption.map(_.lastSeenEus)
          val out = sorted.map { r =>
            // within a batch the sort guarantees order, so lateness
            // can only come from a prior batch's state
            val isLate = lastSeen.exists(l => r.eus < l)
            val keep = !isLate && lastSeen.forall(l => r.eus - l >= gapMicros)
            // max(): a late row must not rewind the state, or the
            // NEXT on-time event could be wrongly kept
            lastSeen = Some(lastSeen.fold(r.eus)(math.max(_, r.eus)))
            Verdict(key, r.event_id, r.eus, keep, isLate)
          }
          lastSeen.foreach(l => state.update(DebounceState(l)))
          out.iterator
      }
  }

  /** The batch gaps-and-islands derivation (q56's shape) over
    * (key, event_id, eus) — ONE definition of the expected verdicts
    * for the parity spec.
    */
  def batchReference(
      df: DataFrame, gapMicros: Long = 3600000000L): DataFrame = {
    val wOrd = Window.partitionBy("key").orderBy("eus", "event_id")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    df.withColumn("gap", col("eus") - lag("eus", 1).over(wOrd))
      .withColumn("new_burst",
        when(col("gap").isNull || col("gap") >= gapMicros, 1L)
          .otherwise(0L))
      .withColumn("burst_id", sum("new_burst").over(wCum))
      // a burst's kept row IS its starting row (q56's simplification)
      .withColumn("kept", col("new_burst") === 1L)
      .select("key", "event_id", "eus", "kept")
  }
}
