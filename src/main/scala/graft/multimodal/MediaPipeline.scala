package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column processing: media carried as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted inside
  * `mapPartitions` so any heavyweight decoder is initialized once per
  * partition (the Scala twin of a batched pandas UDF).
  *
  * Two decoders ship behind the [[MediaDecoder]] SPI:
  * [[ImageIoDecoder]] — a REAL decoder (JDK `javax.imageio`, PNG/
  * JPEG/BMP/GIF) that reads genuine image bytes; and [[StubDecoder]]
  * — a deterministic fake kept as the default so the m-query oracles
  * (whose inputs are text bytes standing in for media) stay
  * reproducible in DuckDB. Everything around the SPI (schema,
  * partition batching, decoder lifecycle, feature plumbing, frame
  * sampling) is identical for both: swapping in a heavier javacv/JNI
  * codec changes nothing but the factory argument.
  */
object MediaPipeline {

  /** Input: one media object per row. `payload` is the raw bytes. */
  final case class MediaFile(
      media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded-image features (per media object). */
  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, channels: Int,
      mean_byte: Double, byte_entropy_q: Long)

  /** One sampled frame of a "video" payload. */
  final case class FrameSample(
      media_id: Long, frame_index: Int, offset: Long, frame_bytes: Int,
      frame_checksum: Long)

  /** Decoder SPI — one instance per partition, initialized lazily. */
  trait MediaDecoder extends Serializable {
    def decodeDims(payload: Array[Byte]): (Int, Int, Int)
    def meanByte(payload: Array[Byte]): Double
    /** Dims + mean in ONE call — the feature-extraction hot path uses
      * this; override it when a single decode can serve both (a real
      * codec pays a full decode per method otherwise).
      */
    def decodeFeatures(payload: Array[Byte]): ((Int, Int, Int), Double) =
      (decodeDims(payload), meanByte(payload))
  }

  /** Deterministic stand-in for a real image decoder. Derives
    * "dimensions" from payload length and content so the m-query
    * oracles (inputs are text bytes, not images) are stable and
    * DuckDB-reproducible.
    */
  final class StubDecoder extends MediaDecoder {
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 64 + 1, (n / 64) % 64 + 1, 3)
    }
    def meanByte(payload: Array[Byte]): Double =
      if (payload.isEmpty) 0.0
      else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length
  }

  /** REAL image decoder over the JDK's `javax.imageio` (PNG, JPEG,
    * BMP, GIF readers ship with the JDK — zero added dependencies).
    * `decodeDims` reads genuine encoded bytes into a raster;
    * `meanByte` averages the decoded PIXEL SAMPLES (not the compressed
    * payload bytes), i.e. a real content statistic a quality filter
    * would gate on. One instance per partition via the factory
    * argument of [[extractImageFeatures]], exactly like the stub.
    */
  /** In-memory ImageIO read — shared by [[ImageIoDecoder]] and
    * [[boxResize]]. Wraps the payload explicitly: the ImageIO.read(
    * InputStream) convenience overload defaults to a
    * FileCacheImageInputStream, which spools every payload to a
    * java.io.tmpdir temp file and unlinks it — per-ROW disk I/O in
    * the partition hot path (and an outright failure on a read-only
    * tmpdir). The bytes are already fully in memory.
    */
  private[multimodal] def readImage(
      payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img =
      try javax.imageio.ImageIO.read(iis)
      // read() closes the stream itself on success; a second close on
      // an ImageInputStreamImpl throws, so swallow only that
      finally { try iis.close() catch { case _: java.io.IOException => () } }
    if (img == null)
      throw new IllegalArgumentException(
        "payload is not a decodable image (no registered reader)")
    img
  }

  /** Indexed/palette images (GIF, palette PNG, 1-bit PNG) decode to a
    * raster whose single band holds palette INDICES, not intensities —
    * reading it directly would report a 2-color white GIF as sample≈1,
    * not ≈255, and disagree with the 3/4 channels the ColorModel
    * advertises. Expand any such image to a component raster (one band
    * per color component) so samples are always actual pixel
    * intensities and the band count matches the channel count.
    */
  private[multimodal] def componentView(
      img: java.awt.image.BufferedImage): java.awt.image.BufferedImage =
    if (img.getRaster.getNumBands == img.getColorModel.getNumComponents)
      img
    else {
      val t =
        if (img.getColorModel.hasAlpha)
          java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val conv = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, t)
      val g = conv.createGraphics()
      try g.drawImage(img, 0, 0, null) finally g.dispose()
      conv
    }

  final class ImageIoDecoder extends MediaDecoder {
    private def read(payload: Array[Byte]): java.awt.image.BufferedImage =
      readImage(payload)
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      val img = read(payload)
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }
    // one decode serves both features — decodeDims + meanByte each
    // pay a full PNG/JPEG decode, doubling the dominant per-row cost
    override def decodeFeatures(
        payload: Array[Byte]): ((Int, Int, Int), Double) = {
      val img = read(payload)
      ((img.getWidth, img.getHeight, img.getColorModel.getNumComponents),
        meanOf(img))
    }
    def meanByte(payload: Array[Byte]): Double = meanOf(read(payload))
    private def meanOf(src: java.awt.image.BufferedImage): Double = {
      val img = MediaPipeline.componentView(src)
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) {
            sum += raster.getSample(x, y, b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h * bands
      if (n == 0) 0.0 else sum.toDouble / n
    }
  }

  /** Decode + feature-extract, decoder initialized once per partition
    * via `decoderFactory` (construct INSIDE the factory — the decoder
    * itself never rides the closure). Embarrassingly parallel: no
    * shuffle, scales with input splits.
    */
  def extractImageFeatures(
      media: Dataset[MediaFile],
      decoderFactory: () => MediaDecoder = () => new StubDecoder)
      : Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = decoderFactory() // per-partition init (expensive IRL)
      rows.map { m =>
        val ((w, h, c), mean) = decoder.decodeFeatures(m.payload)
        ImageFeatures(m.media_id, w, h, c, mean,
          math.round(mean / 16.0))
      }
    }
  }

  /** Sample every `stride`-th fixed-size frame from a "video" payload —
    * one input row fans out to its sampled frames (flatMap shape).
    */
  def sampleFrames(
      media: Dataset[MediaFile],
      frameBytes: Int = 256,
      stride: Int = 4): Dataset[FrameSample] = {
    // fail on the driver, not with an ArithmeticException inside a
    // launched task (batchInference already follows this rule)
    require(frameBytes >= 1, s"frameBytes must be positive, got $frameBytes")
    require(stride >= 1, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = m.payload.length / frameBytes
      (0 until nFrames by stride).map { i =>
        val off = i.toLong * frameBytes
        val slice = m.payload.slice(off.toInt, off.toInt + frameBytes)
        FrameSample(m.media_id, i, off, slice.length,
          slice.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL))
      }
    }
  }

  /** A "resized" media object: payload subsampled by `stride`. */
  final case class ResizedMedia(
      media_id: Long, n_bytes: Int, fp8: String)

  /** Resize stub: deterministic byte subsampling (every `stride`-th
    * byte) standing in for a real scaler; byte accounting and the
    * content fingerprint are real.
    */
  def resize(media: Dataset[MediaFile], stride: Int = 4): Dataset[ResizedMedia] = {
    require(stride >= 1, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        // strided range, not indices.collect: the guard-every-byte +
        // boxed traversal costs show on this hot mapPartitions path
        val sub = Array.range(0, m.payload.length, stride).map(m.payload)
        md.reset()
        val fp = hexFp(md, sub, 8)
        ResizedMedia(m.media_id, sub.length, fp)
      }
    }
  }

  /** A really-resized image: `samples` is the downsampled raster,
    * row-major, channels interleaved in raster band order —
    * `samples((y * out_w + x) * channels + b)`.
    */
  final case class BoxResized(
      media_id: Long, out_w: Int, out_h: Int, channels: Int,
      samples: Array[Int])

  /** REAL integer image resize — the operator that retires [[resize]]'s
    * byte-subsampling stub: decode the encoded payload (JDK ImageIO,
    * the m7 decoder path), then box-filter downsample by `factor` —
    * output sample (x, y, band) = the INTEGER mean (sum / factor²,
    * truncating division, all values non-negative) of the factor×factor
    * input block it covers; a ragged right/bottom edge narrower than
    * `factor` is cropped, the standard exact-block convention. Exact
    * integer arithmetic end-to-end, so over the lossless PNG fixtures
    * a SQL oracle recomputes every output sample from the pixel
    * formula alone (the m7 pattern) — a real scaler with a value
    * oracle, where interpolating float resamplers could only be
    * property-tested.
    *
    * Per-partition map work: decode + one pass over the raster per
    * row, no shuffle, scales with input splits (the mapInPandas shape
    * in Scala form). Images smaller than `factor` in either dimension
    * produce an empty sample array (out dims 0) rather than an error —
    * the caller's size filter is policy, not the operator's.
    */
  def boxResize(
      media: Dataset[MediaFile], factor: Int): Dataset[BoxResized] = {
    require(factor >= 1, s"factor must be positive, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = componentView(readImage(m.payload))
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val bands = raster.getNumBands
        val (ow, oh) = (w / factor, h / factor)
        val out = new Array[Int](ow * oh * bands)
        val area = factor * factor
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            var b = 0
            while (b < bands) {
              var sum = 0
              var dy = 0
              while (dy < factor) {
                var dx = 0
                while (dx < factor) {
                  sum += raster.getSample(x * factor + dx,
                    y * factor + dy, b)
                  dx += 1
                }
                dy += 1
              }
              out((y * ow + x) * bands + b) = sum / area
              b += 1
            }
            x += 1
          }
          y += 1
        }
        BoxResized(m.media_id, ow, oh, bands, out)
      }
    }
  }

  /** md5-hex-prefix fingerprint — ONE definition for resize and the
    * stub model, so the two cannot drift from each other or from the
    * m4/m5 DuckDB oracles.
    */
  private[multimodal] def hexFp(
      md: java.security.MessageDigest, bytes: Array[Byte], n: Int): String =
    md.digest(bytes).map("%02x".format(_)).mkString.take(n)

  /** One batched-inference output row. */
  final case class InferenceResult(media_id: Long, embedding_fp: String)

  /** Batch-scoring model SPI — loaded once per partition (a GPU-bound
    * encoder IRL) and always called with a WHOLE batch, never
    * row-at-a-time: the batching contract that keeps an accelerator
    * fed is enforced by the plumbing, not left to the model.
    */
  trait BatchModel extends Serializable {
    def embedBatch(payloads: Seq[Array[Byte]]): Seq[String]
  }

  /** Deterministic stand-in for a real encoder (md5-derived
    * fingerprint of the payload) — swap for an ONNX/JNI model and the
    * batching plumbing is unchanged.
    */
  final class StubModel extends BatchModel {
    // MessageDigest is neither serializable nor thread-safe — create it
    // per call, so a pre-built StubModel captured in a closure (instead
    // of constructed inside modelFactory) still serializes and shares
    // safely across tasks.
    def embedBatch(payloads: Seq[Array[Byte]]): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      payloads.map { p =>
        md.reset()
        MediaPipeline.hexFp(md, p, 16)
      }
    }
  }

  /** Model-inference batching: rows are grouped into `batchSize`
    * batches inside each partition — the `mapInPandas`-batch shape in
    * Scala. Model init once per non-empty partition; embarrassingly
    * parallel, no shuffle; batch boundaries never cross partitions.
    */
  def batchInference(
      media: Dataset[MediaFile],
      batchSize: Int = 32,
      modelFactory: () => BatchModel = () => new StubModel)
      : Dataset[InferenceResult] = {
    require(batchSize > 0, "batchSize must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val model = modelFactory() // per-partition init (expensive IRL)
        rows.grouped(batchSize).flatMap { batch =>
          val fps = model.embedBatch(batch.map(_.payload))
          batch.zip(fps).map { case (m, fp) =>
            InferenceResult(m.media_id, fp)
          }
        }
      }
    }
  }

  /** Build a MediaFile dataset from the documents corpus (text bytes
    * standing in for media payloads; kind alternates by id).
    *
    * Boundary guard (the `Derived.table` philosophy applied to this
    * corpus reuse): the m-query oracles index the payload by
    * CHARACTER in DuckDB while the operators compare UTF-8 BYTES, so
    * parity is only defined when every stand-in text is pure ASCII
    * (1 char = 1 byte). A regenerated corpus with multi-byte text
    * must read as one named error, not a silent hash drift — so any
    * row whose byte length differs from its char length raises here.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "video")
          .otherwise("image").as("kind"),
        when(octet_length(encode(col("text"), "UTF-8")) =!=
            length(col("text")),
          raise_error(concat(lit("MediaPipeline.fromDocuments: " +
            "non-ASCII text in documents corpus breaks byte/char " +
            "oracle parity, doc_id="), col("doc_id").cast("string"))))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      .as[MediaFile]
  }

  /** Deterministic PNG fixtures synthesized from doc ids — REAL encoded
    * PNG bytes (JDK `ImageIO.write`), not text stand-ins. Pixel (x,y)
    * of doc `id` is the gray value `(id*31 + x*7 + y*13) % 256` in a
    * `(8 + id%16) x (8 + (id/7)%16)` RGB image. Because PNG is
    * lossless, decoding these bytes with [[ImageIoDecoder]] must
    * reproduce the formula's pixel statistics exactly — which a SQL
    * oracle can recompute from `doc_id` alone without any image
    * library. Synthesis is per-partition map work: no shuffle, scales
    * with input splits, encoder state per row (ImageIO writers are not
    * thread-safe to share).
    */
  def pngFixtures(
      spark: SparkSession, dir: String, everyNth: Int = 5): Dataset[MediaFile] = {
    import spark.implicits._
    // the synth+encode below is the heavy per-row step; a single-file
    // id scan would otherwise run it all on one task (round 19 —
    // Derived.spreadSmallScan's condition, so a many-split table at
    // scale keeps its plan)
    graft.queries.Derived.spreadSmallScan(spark,
        s"$dir/documents.parquet",
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
          .where(pmod(col("doc_id"), lit(everyNth)) === 0))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id / 7) % 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaFile(id, "image", bos.toByteArray)
        }
      }
  }

  /** One consecutive-frame delta of a "video" payload — the scene-cut
    * / temporal-change primitive (see [[frameDeltas]]).
    */
  final case class FrameDelta(
      media_id: Long, frame_index: Int, diff_bytes: Int)

  /** Consecutive-frame byte deltas over fixed-size frames of "video"
    * payloads: for frames k and k+1, how many byte positions differ —
    * the exact-integer core of scene-cut detection and temporal
    * sampling (a real pipeline thresholds these deltas to pick
    * keyframes; the threshold is policy, the delta is the operator).
    * flatMap shape like [[sampleFrames]]: one row fans out to its
    * adjacent-frame pairs, partition-local, no shuffle. Only full
    * frames compare; payloads under two frames emit nothing.
    */
  def frameDeltas(
      media: Dataset[MediaFile], frameBytes: Int = 256)
      : Dataset[FrameDelta] = {
    require(frameBytes >= 1, s"frameBytes must be positive, got $frameBytes")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = m.payload.length / frameBytes
      (0 until nFrames - 1).map { k =>
        var diff = 0
        var j = 0
        while (j < frameBytes) {
          if (m.payload(k * frameBytes + j)
              != m.payload((k + 1) * frameBytes + j)) diff += 1
          j += 1
        }
        FrameDelta(m.media_id, k, diff)
      }
    }
  }

  /** Decoded-audio features (per media object): sample accounting and
    * exact integer frame energy — see [[pcmEnergy]].
    */
  final case class AudioFeatures(
      media_id: Long, n_samples: Int, n_frames: Int,
      energy_sum: Long, peak_abs: Int)

  /** Deterministic 16-bit little-endian PCM fixtures synthesized from
    * doc ids — REAL encoded sample bytes (ByteBuffer LE int16), not
    * text stand-ins, playing the role [[pngFixtures]] plays for
    * images. Sample i of doc `id` is `((id·17 + i·31) mod 4096) −
    * 2048` over `n = 512 + id mod 512` samples, so a SQL oracle can
    * recompute every decoded statistic from `doc_id` alone without an
    * audio library. Per-partition map work — no shuffle, scales with
    * input splits.
    */
  def pcmFixtures(
      spark: SparkSession, dir: String, everyNth: Int = 4)
      : Dataset[MediaFile] = {
    import spark.implicits._
    // same per-row-synthesis rationale as pngFixtures
    graft.queries.Derived.spreadSmallScan(spark,
        s"$dir/documents.parquet",
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
          .where(pmod(col("doc_id"), lit(everyNth)) === 1))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (512 + id % 512).toInt
          val buf = java.nio.ByteBuffer.allocate(n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) {
            buf.putShort((((id * 17 + i.toLong * 31) % 4096) - 2048).toShort)
            i += 1
          }
          MediaFile(id, "audio", buf.array())
        }
      }
  }

  /** One decoded PCM frame's exact integer energy. */
  final case class FrameEnergy(media_id: Long, frame_index: Int,
      energy: Long)

  /** Per-FRAME energies of a headerless 16-bit LE PCM payload — the
    * row-per-frame companion to [[pcmEnergy]]'s totals, feeding the
    * silence-segmentation query (m10): frame k's energy is Σ s² over
    * samples [k·frameSamples, (k+1)·frameSamples); the trailing
    * partial frame is dropped (the [[pcmEnergy]] convention). Narrow
    * flatMap, fan-out = frames per payload, no shuffle.
    */
  def pcmFrameEnergies(
      media: Dataset[MediaFile], frameSamples: Int = 256)
      : Dataset[FrameEnergy] = {
    require(frameSamples >= 1,
      s"frameSamples must be positive, got $frameSamples")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val buf = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = m.payload.length / 2
      val nFrames = n / frameSamples
      (0 until nFrames).map { k =>
        var energy = 0L
        var i = k * frameSamples
        val end = i + frameSamples
        while (i < end) {
          val s = buf.getShort(i * 2).toInt
          energy += s.toLong * s
          i += 1
        }
        FrameEnergy(m.media_id, k, energy)
      }
    }
  }

  final case class FrameCrossings(media_id: Long, frame_index: Int,
      crossings: Long)

  /** Per-frame zero-crossing counts of a headerless 16-bit LE PCM
    * payload — the voiced/unvoiced discriminator that pairs with
    * [[pcmFrameEnergies]] (high energy + low ZCR = voiced; low
    * energy + high ZCR = fricative/noise). A crossing is a
    * consecutive-sample pair WITHIN the frame whose signs differ
    * under `s >= 0` (zero counts as positive — the convention both
    * the operator and the oracle must share, since a sample equal to
    * 0 is common in synthetic ramps); frame-boundary pairs belong to
    * no frame, and the trailing partial frame is dropped (the
    * [[pcmEnergy]] convention). Exact integer output; narrow
    * flatMap, fan-out = frames per payload, no shuffle.
    */
  def pcmZeroCrossings(
      media: Dataset[MediaFile], frameSamples: Int = 256)
      : Dataset[FrameCrossings] = {
    require(frameSamples >= 2,
      s"frameSamples must be >= 2 for within-frame pairs, got $frameSamples")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val buf = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = m.payload.length / 2
      val nFrames = n / frameSamples
      (0 until nFrames).map { k =>
        var crossings = 0L
        var i = k * frameSamples
        val end = i + frameSamples - 1
        var prevNonNeg = buf.getShort(i * 2) >= 0
        while (i < end) {
          val nextNonNeg = buf.getShort((i + 1) * 2) >= 0
          if (nextNonNeg != prevNonNeg) crossings += 1
          prevNonNeg = nextNonNeg
          i += 1
        }
        FrameCrossings(m.media_id, k, crossings)
      }
    }
  }

  /** PCM frame-energy extraction: parse a headerless 16-bit LE PCM
    * payload and emit EXACT integer statistics — energy Σ s² over the
    * `n div frameSamples` full frames (the VAD / silence-trim
    * primitive), peak |s| over all samples, sample and full-frame
    * counts. Integer outputs only: an endianness, sign-extension, or
    * sample-width mistake in the decode flips `energy_sum` — there is
    * no float rounding to hide behind. mapPartitions like the image
    * path (a real codec initializes once per partition).
    */
  def pcmEnergy(media: Dataset[MediaFile], frameSamples: Int = 256)
      : Dataset[AudioFeatures] = {
    require(frameSamples >= 1,
      s"frameSamples must be positive, got $frameSamples")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val buf = java.nio.ByteBuffer.wrap(m.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = m.payload.length / 2
        val nFrames = n / frameSamples
        val fullFrameSamples = nFrames * frameSamples
        var energy = 0L
        var peak = 0
        var i = 0
        while (i < n) {
          val s = buf.getShort(i * 2).toInt
          if (i < fullFrameSamples) energy += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        AudioFeatures(m.media_id, n, nFrames, energy, peak)
      }
    }
  }

  final case class PixelHistogram(media_id: Long, bin: Int, n: Long)

  /** Binned luma histogram over the DECODED image (band 0 — the
    * fixtures are gray, so one band is the luma): the vision-corpus
    * quality gate's sufficient statistic. Flat/low-diversity images
    * (solid fills, letterboxes, failed decodes rendering as uniform
    * noise floors) show up as mass concentrated in few bins — the
    * image analog of the t28 repetition rules — and a curation
    * pipeline thresholds on exactly the dominant-bin share m15
    * derives from this table. Bins partition [0, 256) evenly; empty
    * bins are omitted (the downstream aggregate counts NONZERO bins).
    * Narrow flatMap over decoded pixels, fan-out ≤ `bins` rows per
    * media, no shuffle.
    */
  def pixelHistogram(
      media: Dataset[MediaFile], bins: Int = 16): Dataset[PixelHistogram] = {
    require(bins >= 1 && 256 % bins == 0,
      s"bins must divide 256 evenly, got $bins")
    import media.sparkSession.implicits._
    val width = 256 / bins
    media.flatMap { m =>
      val img = componentView(readImage(m.payload))
      val raster = img.getRaster
      val counts = new Array[Long](bins)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          counts(raster.getSample(x, y, 0) / width) += 1L
          x += 1
        }
        y += 1
      }
      counts.iterator.zipWithIndex.collect {
        case (n, b) if n > 0 => PixelHistogram(m.media_id, b, n)
      }
    }
  }

  /** Feature table as a DataFrame for the query/oracle surface. */
  def imageFeaturesDf(spark: SparkSession, dir: String): DataFrame =
    extractImageFeatures(fromDocuments(spark, dir)).toDF()

  def frameSamplesDf(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(fromDocuments(spark, dir)).toDF()

  def resizedDf(spark: SparkSession, dir: String): DataFrame =
    resize(fromDocuments(spark, dir)).toDF()

  def batchInferenceDf(spark: SparkSession, dir: String): DataFrame =
    batchInference(fromDocuments(spark, dir)).toDF()
}
