package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.multimodal.MediaPipeline
import graft.streaming.StreamingKeyframes
import graft.streaming.StreamingKeyframes.{Delta, Keyframe}

/** Streamed keyframe selection must emit exactly the batch
  * top-3-by-delta rows (m11's shape): bounded 3-slot state across
  * micro-batch boundaries, closure on the decoder-marked last delta,
  * full parity on the real frame-delta corpus split across waves, and
  * the disorder contract (regression and post-close are named
  * errors).
  */
class StreamingKeyframesSpec extends SparkSpecBase {

  test("hand golden: 3-slot insert with deterministic ties, closure " +
      "on the last delta, state bounded across waves") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Delta]
    val q = StreamingKeyframes.keyframes(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("kf_out")
      .start()
    try {
      // wave 1: nothing emits while the media is open
      input.addData(
        Delta(1L, 0, 10, last = false), Delta(1L, 1, 50, last = false),
        Delta(1L, 2, 50, last = false), Delta(1L, 3, 7, last = false))
      q.processAllAvailable()
      assert(spark.table("kf_out").as[Keyframe].collect().isEmpty)
      // wave 2: frame 4 displaces frame 3 from the 3-slot list; the
      // last delta closes and emits ranks — tie 50/50 breaks to the
      // smaller index, exactly the batch window order
      input.addData(Delta(1L, 4, 40, last = false),
        Delta(1L, 5, 1, last = true))
      q.processAllAvailable()
      val got = spark.table("kf_out").as[Keyframe].collect()
        .map(kf => (kf.media_id, kf.frame_index, kf.diff_bytes, kf.rk))
        .toSet
      assert(got == Set((1L, 1L, 50L, 1L), (1L, 2L, 50L, 2L),
        (1L, 4L, 40L, 3L)))
      // a short media (< 3 deltas) emits what it has
      input.addData(Delta(2L, 0, 9, last = true))
      q.processAllAvailable()
      assert(spark.table("kf_out").as[Keyframe].collect()
        .count(_.media_id == 2L) == 1)
    } finally q.stop()
  }

  test("disorder contract: a regressing delta and a post-close delta " +
      "both raise named errors") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    def expectRaise(waves: Seq[Seq[Delta]], needle: String): Unit = {
      val input = MemoryStream[Delta]
      val q = StreamingKeyframes.keyframes(input.toDS())
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(s"kf_err_${needle.take(4)}")
        .start()
      try {
        waves.init.foreach { w =>
          input.addData(w: _*); q.processAllAvailable()
        }
        input.addData(waves.last: _*)
        val ex = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] { q.processAllAvailable() }
        assert(causes(ex).exists(c =>
          c.isInstanceOf[IllegalStateException] &&
            c.getMessage.contains(needle)), ex.getMessage)
      } finally q.stop()
    }
    expectRaise(Seq(
      Seq(Delta(1L, 0, 5, last = false), Delta(1L, 1, 6, last = false)),
      Seq(Delta(1L, 1, 6, last = false))), "regresses")
    expectRaise(Seq(
      Seq(Delta(2L, 0, 5, last = true)),
      Seq(Delta(2L, 1, 6, last = false))), "AFTER")
  }

  test("streamed keyframes equal the batch m11 derivation on the real " +
      "frame-delta corpus, split across three waves") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the m11 pipeline's deltas, with each media's last delta marked
    // (the decoder knows the frame count, so this is data)
    val fd = MediaPipeline.frameDeltas(
        MediaPipeline.fromDocuments(spark, "/root/testdata/sf0.001"))
      .collect()
    val lastIdx = fd.groupBy(_.media_id)
      .view.mapValues(_.map(_.frame_index).max).toMap
    val deltas = fd.map(d => Delta(d.media_id, d.frame_index,
        d.diff_bytes, d.frame_index == lastIdx(d.media_id)))
      .sortBy(d => (d.media_id, d.frame_index))

    val input = MemoryStream[Delta]
    val q = StreamingKeyframes.keyframes(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("kf_corpus")
      .start()
    try {
      val waves = Seq(
        deltas.filter(_.frame_index == 0),
        deltas.filter(d => d.frame_index >= 1 && d.frame_index <= 2),
        deltas.filter(_.frame_index > 2))
      waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }

      val streamed = spark.table("kf_corpus").as[Keyframe].collect()
        .map(kf => (kf.media_id, kf.frame_index, kf.diff_bytes, kf.rk))
        .toSet
      val batch = StreamingKeyframes.batchReference(
          deltas.toSeq.toDF("media_id", "frame_index", "diff_bytes",
            "last"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
