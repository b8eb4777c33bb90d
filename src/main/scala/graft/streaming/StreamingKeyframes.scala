package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of m11's keyframe selection — top-3 frames by
  * consecutive-frame delta AT INGEST, completing the multimodal
  * streaming pair started by StreamingSilence: frame deltas arrive as
  * a stream and each media's 3 highest-delta frames (ties to the
  * smaller index, exactly the batch rank) emit the moment the media's
  * LAST delta arrives — which the decoder marks (`last=true`; it
  * knows the frame count at decode time), so closure is data, not a
  * timeout heuristic, and the streamed keyframes are row-equal to the
  * batch window derivation.
  *
  * State per live media: a BOUNDED 3-slot best list plus the
  * last-seen index — top-k needs no frame history because insertion
  * into a k-slot list is associative over arrivals. Frames must
  * arrive per-media in frame order across triggers (the
  * StreamingSilence/Debounce contract; within a micro-batch rows are
  * sorted here), and violations are DETECTED, not absorbed: a
  * regressing frame index (which under at-least-once delivery means
  * a duplicate that would corrupt the rank) or a post-close frame
  * raises `IllegalStateException` naming the media and indices. A
  * closed media keeps a tombstone; pass `tombstoneMs = Some(ms)` for
  * processing-time GC at production scale (default NoTimeout — see
  * the StreamingSilence note on `processAllAvailable` harnesses).
  */
object StreamingKeyframes {

  case class Delta(
      media_id: Long, frame_index: Int, diff_bytes: Int, last: Boolean)
  case class Keyframe(
      media_id: Long, frame_index: Long, diff_bytes: Long, rk: Long)

  /** `top` holds at most k (diff_bytes, frame_index) pairs, best
    * first under (diff desc, index asc); `closed` ⇔ tombstone. */
  case class TopState(
      top: Seq[(Int, Int)], lastSeen: Int, closed: Boolean)

  def keyframes(
      deltas: Dataset[Delta], k: Int = 3,
      tombstoneMs: Option[Long] = None): Dataset[Keyframe] = {
    require(k >= 1, s"k must be positive: $k")
    val session = deltas.sparkSession
    import session.implicits._
    val timeoutConf =
      if (tombstoneMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    deltas.groupByKey(_.media_id)
      .flatMapGroupsWithState[TopState, Keyframe](
        OutputMode.Append, timeoutConf) {
        case (media, rows, state) =>
          if (state.hasTimedOut) { // tombstone GC
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.frame_index)
            var st = state.getOption
              .getOrElse(TopState(Nil, Int.MinValue, closed = false))
            var out: List[Keyframe] = Nil
            sorted.foreach { f =>
              if (st.closed)
                throw new IllegalStateException(
                  s"media $media: delta ${f.frame_index} arrived AFTER " +
                    s"the media's last delta (${st.lastSeen}) — " +
                    "ordering-contract violation")
              if (f.frame_index <= st.lastSeen)
                throw new IllegalStateException(
                  s"media $media: delta ${f.frame_index} regresses " +
                    s"behind last processed delta ${st.lastSeen} — a " +
                    "duplicate would corrupt the rank")
              // k-slot insert: order by (diff desc, index asc), cut
              val top = ((f.diff_bytes, f.frame_index) +: st.top)
                .sortBy { case (d, i) => (-d, i) }
                .take(k)
              st = TopState(top, f.frame_index, closed = false)
              if (f.last) {
                out = st.top.zipWithIndex.map { case ((d, i), r) =>
                  Keyframe(media, i.toLong, d.toLong, r + 1L)
                }.toList
                st = st.copy(top = Nil, closed = true)
              }
            }
            state.update(st)
            if (st.closed)
              tombstoneMs.foreach(ms => state.setTimeoutDuration(ms))
            out.iterator
          }
      }
  }

  /** The batch window derivation of the SAME keyframes (m11's shape)
    * — ONE definition of the expected output for the parity spec.
    */
  def batchReference(deltas: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("media_id")
      .orderBy(col("diff_bytes").desc, col("frame_index"))
    deltas
      .select(col("media_id"),
        col("frame_index").cast("long").as("frame_index"),
        col("diff_bytes").cast("long").as("diff_bytes"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
