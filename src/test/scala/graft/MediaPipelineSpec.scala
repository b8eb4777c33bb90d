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

  test("batch inference groups rows to batchSize, initializes the model " +
      "once per non-empty partition, and matches the stub fingerprint") {
    val session = spark
    import session.implicits._
    InstrumentedModel.reset()
    val rows = (1 to 100).map(i =>
      media(i.toLong, "image", s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(rows).repartition(4)
    val got = MediaPipeline.batchInference(ds, batchSize = 16,
        modelFactory = () => new InstrumentedModel)
      .collect().sortBy(_.media_id)

    assert(got.length == 100)
    // per-row output identical to the stub (batching must not reorder
    // or cross-wire payloads within a batch)
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { r =>
      md.reset()
      val exp = md.digest(s"payload-${r.media_id}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      assert(r.embedding_fp == exp, s"row ${r.media_id} fingerprint")
    }
    // model loaded once per non-empty partition, not once per batch/row
    assert(InstrumentedModel.inits.get() == 4,
      s"expected 4 model inits, got ${InstrumentedModel.inits.get()}")
    // every batch bounded by batchSize; one full batch + one tail per
    // partition (~25 rows each, batchSize 16), nothing lost
    val sizes = InstrumentedModel.batchSizes
    assert(sizes.forall(_ <= 16), s"oversized batch: $sizes")
    assert(sizes.sum == 100 && sizes.length == 8 &&
      sizes.count(_ == 16) == 4, s"unexpected batch shape: $sizes")
  }

  /** A real encoded PNG: solid `rgb` fill at the given size. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes genuine PNG bytes: real header dimensions " +
      "and decoded-pixel mean, through the same partitioned plumbing") {
    val session = spark
    import session.implicits._
    val ds = spark.createDataset(Seq(
      media(1L, "image", pngBytes(17, 5, 0x0a141e)),   // R10 G20 B30
      media(2L, "image", pngBytes(64, 32, 0x646464)))) // gray 100
    val got = MediaPipeline
      .extractImageFeatures(ds, () => new ImageIoDecoder)
      .collect().sortBy(_.media_id).toSeq
    assert(got.map(f => (f.media_id, f.width, f.height, f.channels))
      == Seq((1L, 17, 5, 3), (2L, 64, 32, 3)))
    // PNG is lossless: the decoded-sample means are exact
    assert(math.abs(got(0).mean_byte - 20.0) < 1e-12, got(0))
    assert(math.abs(got(1).mean_byte - 100.0) < 1e-12, got(1))
    // the stub derives "dims" from payload LENGTH — parsing the real
    // header is what separates the two decoders behind the same SPI
    val stub = MediaPipeline.extractImageFeatures(ds)
      .collect().sortBy(_.media_id).toSeq
    assert(stub.map(f => (f.width, f.height))
      != got.map(f => (f.width, f.height)))
  }

  test("boxResize golden: exact integer 2x block means over a real " +
      "PNG gradient, ragged edge cropped, channels interleaved") {
    val session = spark
    import session.implicits._
    // 5x4 gray gradient v = x*10 + y: 2x2 blocks mean to 5, 25, 7, 27
    // (sum/4 truncating); the ragged x=4 column is cropped
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5) {
      val v = x * 10 + y
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = spark.createDataset(Seq(media(7L, "image", bos.toByteArray)))
    val got = MediaPipeline.boxResize(ds, factor = 2).collect().toSeq
    assert(got.map(r => (r.media_id, r.out_w, r.out_h, r.channels))
      == Seq((7L, 2, 2, 3)))
    assert(got.head.samples.toSeq ==
      Seq(5, 5, 5, 25, 25, 25, 7, 7, 7, 27, 27, 27))
    // an image narrower than the factor resizes to the empty raster,
    // not an error (the caller's size gate is policy)
    val tiny = spark.createDataset(Seq(media(8L, "image",
      pngBytes(1, 3, 0x646464))))
    val t = MediaPipeline.boxResize(tiny, factor = 2).collect().head
    assert(t.out_w == 0 && t.out_h == 1 && t.samples.isEmpty)
  }

  test("ImageIoDecoder averages pixel INTENSITIES for indexed/palette " +
      "images, not palette indices") {
    // A 2-color palette GIF, all pixels white: the raster's single band
    // holds palette index 1 everywhere, so averaging raw samples would
    // report mean≈1 — the component expansion must report ≈255 on the
    // same 3 channels the ColorModel advertises.
    // (16x16, not smaller: the JDK GIF codec corrupts the last row of
    // an 8x4 single-color frame — a round-trip LZW edge case, verified
    // independently of this decoder)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
      new java.awt.image.IndexColorModel(1, 2,
        Array[Byte](0, -1), Array[Byte](0, -1), Array[Byte](0, -1)))
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, 16, 16)
    } finally g.dispose()
    assert(img.getRaster.getSample(0, 0, 0) == 1) // index, not intensity
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val dec = new ImageIoDecoder
    val ((w, h, c), mean) = dec.decodeFeatures(bos.toByteArray)
    assert((w, h, c) == (16, 16, 3), s"dims ($w,$h,$c)")
    assert(math.abs(mean - 255.0) < 1e-12, s"mean_byte $mean")
    assert(math.abs(dec.meanByte(bos.toByteArray) - 255.0) < 1e-12)
  }

  test("pngFixtures round-trip: decoding the synthesized PNGs through " +
      "ImageIoDecoder reproduces the pixel formula exactly") {
    val fixtures = MediaPipeline.pngFixtures(spark, "/root/testdata/sf0.001")
    val feats = MediaPipeline
      .extractImageFeatures(fixtures, () => new ImageIoDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.media_id
      val (w, h) = ((8 + id % 16).toInt, (8 + (id / 7) % 16).toInt)
      assert((f.width, f.height, f.channels) == (w, h, 3), f)
      // lossless codec: the decoded-sample sum is the formula's sum,
      // bit-exactly (each RGB pixel carries 3 identical gray samples)
      val expectSum = (for { y <- 0 until h; x <- 0 until w }
        yield (id * 31 + x * 7 + y * 13) % 256).sum * 3
      val gotSum = math.round(f.mean_byte * w * h * 3)
      assert(gotSum == expectSum, s"media $id: $gotSum != $expectSum")
    }
  }

  test("ImageIoDecoder rejects an undecodable payload with a clear error") {
    val dec = new ImageIoDecoder
    val e = intercept[IllegalArgumentException] {
      dec.decodeDims("definitely not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("pcmEnergy decodes 16-bit LE samples: energy over full frames " +
      "only, peak over all samples, trailing odd byte ignored") {
    val session = spark
    import session.implicits._
    // samples: 3, -2, 100, -300, 7 — frameSamples=2 → 2 full frames
    // (first 4 samples); the 5th contributes to peak only. A stray
    // trailing byte must not shift the decode or count as a sample.
    val samples = Seq[Short](3, -2, 100, -300, 7)
    val buf = java.nio.ByteBuffer.allocate(samples.size * 2 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(buf.putShort)
    buf.put(0x7f.toByte)
    val ds = spark.createDataset(Seq(media(5L, "audio", buf.array())))
    val got = MediaPipeline.pcmEnergy(ds, frameSamples = 2).collect()
    assert(got.length == 1)
    val f = got.head
    assert(f.n_samples == 5, f)
    assert(f.n_frames == 2, f)
    assert(f.energy_sum == 3L * 3 + 2 * 2 + 100 * 100 + 300 * 300, f)
    assert(f.peak_abs == 300, f)
  }

  test("pcmFrameEnergies emits one exact energy per full frame and " +
      "sums to pcmEnergy's total") {
    val session = spark
    import session.implicits._
    // samples: 3, -2, 100, -300, 7 — frameSamples=2 → frames
    // (3,-2)=13 and (100,-300)=100000; the trailing 7 is dropped
    val samples = Seq[Short](3, -2, 100, -300, 7)
    val buf = java.nio.ByteBuffer.allocate(samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(buf.putShort)
    val ds = spark.createDataset(Seq(media(6L, "audio", buf.array())))
    val got = MediaPipeline.pcmFrameEnergies(ds, frameSamples = 2)
      .collect().sortBy(_.frame_index)
    assert(got.map(f => (f.media_id, f.frame_index, f.energy)).toSeq ==
      Seq((6L, 0, 13L), (6L, 1, 100000L)))
    // consistency contract with the totals extractor on real fixtures
    val fixtures = MediaPipeline.pcmFixtures(spark, "/root/testdata/sf0.001")
    val perFrame = MediaPipeline.pcmFrameEnergies(fixtures).toDF()
      .groupBy("media_id")
      .agg(org.apache.spark.sql.functions.sum("energy").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totals = MediaPipeline.pcmEnergy(
        MediaPipeline.pcmFixtures(spark, "/root/testdata/sf0.001"))
      .collect().map(f => f.media_id -> f.energy_sum).toMap
    assert(perFrame == totals)
  }

  test("pcmZeroCrossings counts within-frame sign changes under the " +
      "zero-counts-positive convention, excluding boundary pairs") {
    val session = spark
    import session.implicits._
    // frameSamples=4; samples 1,-1,2,-2 | 3,3,-3,0 | 5 →
    // frame 0: (1,-1)(−1,2)(2,−2) all flip = 3; frame 1: (3,3) no,
    // (3,−3) yes, (−3,0) yes — 0 is NON-NEGATIVE = 2; trailing 5
    // dropped. The boundary pair (−2,3) belongs to no frame.
    val samples = Seq[Short](1, -1, 2, -2, 3, 3, -3, 0, 5)
    val buf = java.nio.ByteBuffer.allocate(samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(buf.putShort)
    val ds = spark.createDataset(Seq(media(9L, "audio", buf.array())))
    val got = MediaPipeline.pcmZeroCrossings(ds, frameSamples = 4)
      .collect().sortBy(_.frame_index)
    assert(got.map(f => (f.media_id, f.frame_index, f.crossings)).toSeq
      == Seq((9L, 0, 3L), (9L, 1, 2L)))
    // round-trip on real fixtures: recompute from the sample formula
    val fromOp = MediaPipeline
      .pcmZeroCrossings(MediaPipeline.pcmFixtures(spark, "/root/testdata/sf0.001"))
      .collect().map(f => (f.media_id, f.frame_index) -> f.crossings).toMap
    assert(fromOp.nonEmpty)
    fromOp.keys.map(_._1).toSeq.distinct.sorted.take(3).foreach { id =>
      val n = (512 + id % 512).toInt
      val vals = (0 until n).map(i => ((id * 17 + i.toLong * 31) % 4096) - 2048)
      (0 until n / 256).foreach { k =>
        val frame = vals.slice(k * 256, (k + 1) * 256)
        val want = frame.sliding(2)
          .count(p => (p(0) >= 0) != (p(1) >= 0)).toLong
        assert(fromOp((id, k)) == want, s"media $id frame $k")
      }
    }
  }

  test("pixelHistogram round-trip: decoding the synthesized PNGs " +
      "reproduces the pixel-formula histogram exactly, empty bins " +
      "omitted") {
    val hist = MediaPipeline
      .pixelHistogram(MediaPipeline.pngFixtures(spark, "/root/testdata/sf0.001"))
      .collect().map(h => (h.media_id, h.bin) -> h.n).toMap
    assert(hist.nonEmpty)
    val ids = hist.keys.map(_._1).toSeq.distinct.sorted.take(3)
    ids.foreach { id =>
      val (w, h) = ((8 + id % 16).toInt, (8 + (id / 7) % 16).toInt)
      val want = (for { y <- 0 until h; x <- 0 until w }
        yield (((id * 31 + x * 7 + y * 13) % 256) / 16).toInt)
        .groupBy(identity).map { case (b, v) => b -> v.size.toLong }
      (0 until 16).foreach { b =>
        assert(hist.get((id, b)) == want.get(b), s"media $id bin $b")
      }
    }
  }

  test("pcmFixtures round-trip: decoding the synthesized PCM through " +
      "pcmEnergy reproduces the sample formula exactly") {
    val feats = MediaPipeline
      .pcmEnergy(MediaPipeline.pcmFixtures(spark, "/root/testdata/sf0.001"))
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.media_id
      val n = (512 + id % 512).toInt
      val vals = (0 until n).map(i => ((id * 17 + i.toLong * 31) % 4096) - 2048)
      assert(f.n_samples == n, f)
      assert(f.n_frames == n / 256, f)
      val full = vals.take((n / 256) * 256)
      assert(f.energy_sum == full.map(v => v * v).sum, f)
      assert(f.peak_abs == vals.map(math.abs).max, f)
    }
  }

  test("fromDocuments raises a named error on non-ASCII text (the " +
      "byte/char oracle-parity boundary guard) and passes ASCII") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ascii-guard").toString
    // pure-ASCII corpus → reads fine
    Seq((0L, "hello frame bytes"), (3L, "all ascii here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // materialize the payload: a count() would prune the guarded
    // column away entirely (the guard lives in the payload projection,
    // exactly where every consumer reads)
    assert(MediaPipeline.fromDocuments(spark, dir).collect().length == 2)
    // one multi-byte char → the named boundary error, not silent drift
    Seq((0L, "ok"), (3L, "café"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ex = intercept[Exception] {
      MediaPipeline.fromDocuments(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("non-ASCII") && m.contains("doc_id=3")))
  }
}

/** StubModel wrapper counting inits and batch sizes via static state
  * (local-mode tasks share the JVM).
  */
class InstrumentedModel extends MediaPipeline.BatchModel {
  InstrumentedModel.inits.incrementAndGet()
  private val inner = new MediaPipeline.StubModel
  override def embedBatch(payloads: Seq[Array[Byte]]): Seq[String] = {
    InstrumentedModel.sizes.add(payloads.size)
    inner.embedBatch(payloads)
  }
}

object InstrumentedModel {
  val inits = new java.util.concurrent.atomic.AtomicInteger(0)
  val sizes = java.util.Collections.synchronizedList(
    new java.util.ArrayList[Int]())
  def reset(): Unit = { inits.set(0); sizes.clear() }
  def batchSizes: Seq[Int] = {
    import scala.jdk.CollectionConverters._
    sizes.asScala.toSeq
  }
}
