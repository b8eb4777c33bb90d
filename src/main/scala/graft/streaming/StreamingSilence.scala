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
  * State per live media: the open run's (start, last) — two ints,
  * dropped the moment the media's last frame arrives. Frames must
  * arrive per-media in frame order across triggers (the
  * StreamingGapFill/Debounce ordering contract; within a micro-batch
  * rows are sorted here). `StreamingSilenceSpec` pins parity against
  * the shared batch derivation across wave boundaries.
  */
object StreamingSilence {

  case class Frame(
      media_id: Long, frame_index: Int, energy: Long, last: Boolean)
  case class Segment(
      media_id: Long, start_frame: Int, end_frame: Int, n_frames: Int)
  case class RunState(start: Int, lastIdx: Int)

  def segments(
      frames: Dataset[Frame], tau: Long): Dataset[Segment] = {
    val session = frames.sparkSession
    import session.implicits._
    frames.groupByKey(_.media_id)
      .flatMapGroupsWithState[RunState, Segment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (media, rows, state) =>
          val sorted = rows.toSeq.sortBy(_.frame_index)
          var open: Option[RunState] = state.getOption
          val out = scala.collection.mutable.Buffer[Segment]()
          var done = false
          sorted.foreach { f =>
            if (f.energy >= tau) {
              open = open match {
                case Some(r) => Some(RunState(r.start, f.frame_index))
                case None => Some(RunState(f.frame_index, f.frame_index))
              }
            } else {
              open.foreach(r => out += Segment(media, r.start, r.lastIdx,
                r.lastIdx - r.start + 1))
              open = None
            }
            if (f.last) {
              open.foreach(r => out += Segment(media, r.start, r.lastIdx,
                r.lastIdx - r.start + 1))
              open = None
              done = true
            }
          }
          if (done) state.remove()
          else open match {
            case Some(r) => state.update(r)
            case None => state.remove()
          }
          out.iterator
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
