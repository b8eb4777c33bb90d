package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of m10's silence segmentation — VAD AT INGEST, and
  * the first multimodal streaming operator: decoded PCM frame
  * energies arrive as a stream and maximal VOICED segments (runs of
  * frames with energy ≥ τ) emit as soon as they close.
  *
  * A segment closes on the first SILENT frame after it — or on the
  * media's LAST frame, which the decoder marks (`last=true`): the
  * frame source knows the payload length at decode time, so
  * end-of-media is data, not a timeout heuristic, and the streamed
  * segments are byte-equal to the batch gaps-and-islands derivation
  * with no "open tail" ambiguity.
  *
  * Frames must arrive per-media in frame order across triggers (the
  * StreamingGapFill/Debounce ordering contract; within a micro-batch
  * rows are sorted here). Cross-batch violations are DETECTED, not
  * silently absorbed (the StreamingDebounce treatment, escalated to
  * a named error because a disordered frame corrupts every later
  * segment of the media, not just its own row): the state tracks the
  * last processed frame_index plus a closed marker, and a frame that
  * regresses — or arrives after the media's last frame — raises
  * `IllegalStateException` naming the media and indices instead of
  * silently re-opening or splitting runs.
  *
  * State per live media: the open run's (start, last) plus the
  * last-seen index — three ints. A closed media keeps a TOMBSTONE (so
  * post-close frames are a named error, not a phantom re-open of a
  * "new" media). By default tombstones are retained like
  * StreamingDebounce's per-key state — three ints per media ever
  * seen; pass `tombstoneMs = Some(ms)` to garbage-collect them with a
  * processing-time timeout at production scale. The default stays
  * `NoTimeout` because processing-time timeouts re-trigger empty
  * micro-batches indefinitely, which `processAllAvailable()`-style
  * test harnesses (and the parity spec) cannot settle against.
  * `StreamingSilenceSpec` pins parity against the shared batch
  * derivation across wave boundaries and the disorder contract.
  */
object StreamingSilence {

  case class Frame(
      media_id: Long, frame_index: Int, energy: Long, last: Boolean)
  case class Segment(
      media_id: Long, start_frame: Int, end_frame: Int, n_frames: Int)

  /** `start == -1` ⇔ no open run; `closed` ⇔ the media's last frame
    * was processed and the state is a GC-pending tombstone. */
  case class RunState(
      start: Int, lastIdx: Int, lastSeen: Int, closed: Boolean)

  def segments(
      frames: Dataset[Frame], tau: Long,
      tombstoneMs: Option[Long] = None): Dataset[Segment] = {
    val session = frames.sparkSession
    import session.implicits._
    val timeoutConf =
      if (tombstoneMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    frames.groupByKey(_.media_id)
      .flatMapGroupsWithState[RunState, Segment](
        OutputMode.Append, timeoutConf) {
        case (media, rows, state) =>
          if (state.hasTimedOut) { // tombstone GC
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.frame_index)
            var st = state.getOption
              .getOrElse(RunState(-1, -1, Int.MinValue, closed = false))
            val out = scala.collection.mutable.Buffer[Segment]()
            sorted.foreach { f =>
              if (st.closed)
                throw new IllegalStateException(
                  s"media $media: frame ${f.frame_index} arrived AFTER " +
                    s"the media's last frame (${st.lastSeen}) — " +
                    "ordering-contract violation")
              if (f.frame_index <= st.lastSeen)
                throw new IllegalStateException(
                  s"media $media: frame ${f.frame_index} regresses " +
                    s"behind last processed frame ${st.lastSeen} — " +
                    "ordering-contract violation")
              st = st.copy(lastSeen = f.frame_index)
              if (f.energy >= tau) {
                st =
                  if (st.start >= 0) st.copy(lastIdx = f.frame_index)
                  else st.copy(start = f.frame_index,
                    lastIdx = f.frame_index)
              } else if (st.start >= 0) {
                out += Segment(media, st.start, st.lastIdx,
                  st.lastIdx - st.start + 1)
                st = st.copy(start = -1, lastIdx = -1)
              }
              if (f.last) {
                if (st.start >= 0) {
                  out += Segment(media, st.start, st.lastIdx,
                    st.lastIdx - st.start + 1)
                  st = st.copy(start = -1, lastIdx = -1)
                }
                st = st.copy(closed = true)
              }
            }
            state.update(st)
            if (st.closed)
              tombstoneMs.foreach(ms => state.setTimeoutDuration(ms))
            out.iterator
          }
      }
  }

  /** The batch gaps-and-islands derivation of the SAME segments (m10's
    * shape, kept as segment rows instead of per-media counts) — ONE
    * definition of the expected output for the parity spec.
    */
  def batchReference(frames: DataFrame, tau: Long): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("frame_index")
    frames
      .withColumn("voiced", col("energy") >= tau)
      .withColumn("new_run",
        when(col("voiced") &&
          coalesce(!lag(col("voiced"), 1).over(w), lit(true)), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum("new_run").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("voiced"))
      .groupBy("media_id", "run_id")
      .agg(min("frame_index").as("start_frame"),
        max("frame_index").as("end_frame"),
        count(lit(1)).cast("int").as("n_frames"))
      .select("media_id", "start_frame", "end_frame", "n_frames")
  }
}
