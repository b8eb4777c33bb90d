package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.multimodal.MediaPipeline
import graft.streaming.StreamingSilence
import graft.streaming.StreamingSilence.{Frame, Segment}

/** Streamed VAD must emit exactly the batch gaps-and-islands voiced
  * segments (m10's shape): runs crossing micro-batch boundaries, a
  * run closed by the media's LAST frame (end-of-media is decoder
  * data, not a timeout), and full parity on the real PCM fixture
  * corpus split across waves.
  */
class StreamingSilenceSpec extends SparkSpecBase {

  private val Tau = 360000000L

  test("hand golden: runs close on silence or on the last frame, and " +
      "survive micro-batch boundaries") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Frame]
    val q = StreamingSilence.segments(input.toDS(), tau = 10L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("vad_out")
      .start()
    try {
      // media 1: voiced(0,1) | silent(2) | voiced(3...) — run 0-1
      // closes on the silent frame; the 3-run stays OPEN across the
      // batch boundary
      input.addData(
        Frame(1L, 0, 50L, last = false), Frame(1L, 1, 60L, last = false),
        Frame(1L, 2, 1L, last = false), Frame(1L, 3, 70L, last = false))
      q.processAllAvailable()
      var got = spark.table("vad_out").as[Segment].collect().toSet
      assert(got == Set(Segment(1L, 0, 1, 2)))
      // wave 2 extends the open run and the LAST frame closes it
      input.addData(
        Frame(1L, 4, 80L, last = false), Frame(1L, 5, 90L, last = true))
      q.processAllAvailable()
      got = spark.table("vad_out").as[Segment].collect().toSet
      assert(got == Set(Segment(1L, 0, 1, 2), Segment(1L, 3, 5, 3)))
      // a media ending on a silent last frame emits nothing extra
      input.addData(Frame(2L, 0, 99L, last = false),
        Frame(2L, 1, 0L, last = true))
      q.processAllAvailable()
      got = spark.table("vad_out").as[Segment].collect().toSet
      assert(got == Set(Segment(1L, 0, 1, 2), Segment(1L, 3, 5, 3),
        Segment(2L, 0, 0, 1)))
    } finally q.stop()
  }

  test("a cross-batch regressing frame raises a named ordering error " +
      "instead of silently splitting runs") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Frame]
    val q = StreamingSilence.segments(input.toDS(), tau = 10L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("vad_disorder")
      .start()
    try {
      input.addData(Frame(1L, 0, 50L, last = false),
        Frame(1L, 1, 60L, last = false))
      q.processAllAvailable()
      // frame 1 again, one batch later: regression must be loud
      input.addData(Frame(1L, 1, 5L, last = false))
      val ex = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("regresses")), ex.getMessage)
    } finally q.stop()
  }

  test("a frame after the media's last frame raises instead of " +
      "phantom-reopening the media") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Frame]
    val q = StreamingSilence.segments(input.toDS(), tau = 10L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("vad_postclose")
      .start()
    try {
      input.addData(Frame(1L, 0, 50L, last = false),
        Frame(1L, 1, 60L, last = true))
      q.processAllAvailable()
      assert(spark.table("vad_postclose").as[Segment].collect().toSet ==
        Set(Segment(1L, 0, 1, 2)))
      // the tombstone remembers the close: frame 2 is a named error,
      // not a fresh run for a "new" media
      input.addData(Frame(1L, 2, 70L, last = false))
      val ex = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("AFTER")), ex.getMessage)
    } finally q.stop()
  }

  test("streamed segments equal the batch derivation on the real PCM " +
      "fixtures, split across three waves") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // decode the real fixtures once; mark each media's last frame
    // (the decoder knows payload length, so this is data)
    val fe = MediaPipeline.pcmFrameEnergies(
        MediaPipeline.pcmFixtures(spark, "/root/testdata/sf0.001"))
      .collect()
    val lastIdx = fe.groupBy(_.media_id)
      .view.mapValues(_.map(_.frame_index).max).toMap
    val frames = fe.map(f => Frame(f.media_id, f.frame_index, f.energy,
      f.frame_index == lastIdx(f.media_id)))
      .sortBy(f => (f.media_id, f.frame_index))

    val input = MemoryStream[Frame]
    val q = StreamingSilence.segments(input.toDS(), Tau)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("vad_corpus")
      .start()
    try {
      // waves split on frame_index — per-media order holds across
      // batches (the ordering contract)
      val waves = Seq(
        frames.filter(_.frame_index == 0),
        frames.filter(f => f.frame_index >= 1 && f.frame_index <= 2),
        frames.filter(_.frame_index > 2))
      waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }

      val streamed = spark.table("vad_corpus").as[Segment].collect()
        .map(s => (s.media_id, s.start_frame, s.end_frame, s.n_frames))
        .toSet
      val batch = StreamingSilence.batchReference(
          frames.toSeq.toDF("media_id", "frame_index", "energy", "last"),
          Tau)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
