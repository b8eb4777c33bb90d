package graft

import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline._

/** Typed-API specs for the multimodal pipeline: stub decode features,
  * frame sampling fan-out, and checksum determinism (the parts the SQL
  * oracle can't cover).
  */
class MediaPipelineSpec extends SparkSpecBase {

  private def media(id: Long, kind: String, bytes: Array[Byte]) =
    MediaFile(id, kind, bytes)

  test("image features derive from the payload deterministically") {
    val session = spark
    import session.implicits._
    val payload = Array.tabulate(130)(i => (i % 256).toByte)
    val ds = spark.createDataset(Seq(media(7L, "image", payload)))
    val got = MediaPipeline.extractImageFeatures(ds).collect().toSeq
    // width = 130 % 64 + 1 = 3; height = (130/64) % 64 + 1 = 3
    assert(got.map(f => (f.media_id, f.width, f.height, f.channels))
      == Seq((7L, 3, 3, 3)))
    val mean = payload.map(_ & 0xff).sum.toDouble / payload.length
    assert(math.abs(got.head.mean_byte - mean) < 1e-12)
    assert(got.head.byte_entropy_q == math.round(mean / 16.0))
  }

  test("frame sampling takes every 4th 256-byte frame of video payloads") {
    val session = spark
    import session.implicits._
    val payload = Array.tabulate(256 * 9 + 100)(i => (i % 251).toByte)
    val ds = spark.createDataset(Seq(
      media(1L, "video", payload),
      media(2L, "image", payload))) // non-video rows are skipped
    val got = MediaPipeline.sampleFrames(ds).collect().toSeq
      .sortBy(_.frame_index)
    assert(got.map(f => (f.media_id, f.frame_index, f.offset, f.frame_bytes))
      == Seq((1L, 0, 0L, 256), (1L, 4, 1024L, 256), (1L, 8, 2048L, 256)))
    // checksum is a pure function of the slice → stable across runs
    val again = MediaPipeline.sampleFrames(ds).collect().toSeq
      .sortBy(_.frame_index)
    assert(got.map(_.frame_checksum) == again.map(_.frame_checksum))
    assert(got.map(_.frame_checksum).distinct.size == 3)
  }

  test("resize subsamples every 4th byte and fingerprints the result") {
    val session = spark
    import session.implicits._
    val payload = "abcdefghij".getBytes("UTF-8")
    val ds = spark.createDataset(Seq(media(3L, "image", payload)))
    val got = MediaPipeline.resize(ds).collect().toSeq
    val expected = "aei".getBytes("UTF-8") // indices 0, 4, 8
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(expected).map("%02x".format(_)).mkString.take(8)
    assert(got == Seq(MediaPipeline.ResizedMedia(3L, 3, fp)))
  }

  test("empty payload does not divide by zero") {
    val session = spark
    import session.implicits._
    val ds = spark.createDataset(Seq(media(9L, "image", Array.empty[Byte])))
    val got = MediaPipeline.extractImageFeatures(ds).collect().toSeq
    assert(got.head.mean_byte == 0.0)
    assert(got.head.width == 1 && got.head.height == 1)
  }
}
