package graft.queries

import graft.multimodal.MediaPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Query/oracle surface for the multimodal pipeline. The corpus text
  * is ASCII, so the DuckDB oracle can recompute byte statistics from
  * codepoints; the frame-sampling oracle enumerates stride offsets
  * from the payload length. (The per-frame checksum is typed-API-only,
  * covered by MediaPipelineSpec — SQL can't fold bytes sequentially.)
  */
object MultimodalQueries {

  import RefQueries.Fn

  val entries: Map[String, (Fn, Option[String])] = Map(

    // mapPartitions decode + feature extraction (stubbed decoder).
    "m2_image_features" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.imageFeaturesDf(s, d)
          .withColumn("mean_byte", round(col("mean_byte"), 6)),
      Some("""SELECT doc_id AS media_id,
          octet_length(encode(text)) % 64 + 1 AS width,
          (octet_length(encode(text)) // 64) % 64 + 1 AS height,
          3 AS channels,
          round(list_avg([ord(text[i]) for i in range(1, len(text) + 1)]), 6)
            AS mean_byte,
          round(list_avg([ord(text[i]) for i in range(1, len(text) + 1)]) / 16.0)
            ::BIGINT AS byte_entropy_q
        FROM documents""")
    )),

    // Resize STUB, kept for the text-payload corpus where no pixels
    // exist: every-4th-byte subsampling with byte accounting and
    // content fingerprint (corpus is ASCII → DuckDB recomputes the
    // subsample from characters). The REAL pixel resize is m12
    // (MediaPipeline.boxResize over the PNG fixtures) — use that for
    // actual images; this remains the byte-plumbing check.
    "m4_resized_features" -> ((
      (s: SparkSession, d: String) => MediaPipeline.resizedDf(s, d),
      Some("""SELECT doc_id AS media_id,
          CAST(len([text[i] for i in range(1, len(text) + 1)
                    if (i - 1) % 4 = 0]) AS INTEGER) AS n_bytes,
          substr(md5(array_to_string(
            [text[i] for i in range(1, len(text) + 1)
             if (i - 1) % 4 = 0], '')), 1, 8) AS fp8
        FROM documents""")
    )),

    // Batched model inference: per-partition model init + whole-batch
    // scoring (the GPU-feeding shape); the stub model's fingerprint is
    // md5-derived, so the oracle verifies the exact per-row output the
    // batching plumbing delivered.
    "m5_batch_inference" -> ((
      (s: SparkSession, d: String) => MediaPipeline.batchInferenceDf(s, d),
      Some("""SELECT doc_id AS media_id,
          substr(md5(text), 1, 16) AS embedding_fp
        FROM documents""")
    )),

    // Content-addressable media dedup: byte-exact replica detection by
    // payload digest — the media-side counterpart of d1 (which dedups
    // NORMALIZED text; identical bytes from different URLs is the far
    // more common case for images/video). One window over the digest
    // partition yields the canonical mapping in a single shuffle; at
    // 100 TB the digest is computed at ingest and this is a groupBy
    // over 16-byte keys, never over payloads.
    "m6_media_dedup" -> ((
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val byFp = Window.partitionBy("fp")
        Derived.table(s, d, "documents")
          .withColumn("fp", md5(encode(col("text"), "UTF-8")))
          .select(col("doc_id").as("media_id"),
            substring(col("fp"), 1, 8).as("fp8"),
            min("doc_id").over(byFp).as("canonical_id"),
            count(lit(1)).over(byFp).as("n_copies"))
          .withColumn("is_dup",
            when(col("media_id") === col("canonical_id"), 0).otherwise(1))
      },
      Some("""SELECT doc_id AS media_id,
          substr(md5(text), 1, 8) AS fp8,
          min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
          count(*) OVER (PARTITION BY md5(text)) AS n_copies,
          CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
               THEN 0 ELSE 1 END AS is_dup
        FROM documents""")
    )),

    // REAL image decode, oracle-pinned: synthesized PNG bytes (see
    // MediaPipeline.pngFixtures — pixel formula derivable from doc_id)
    // are decoded by the production javax.imageio decoder, and DuckDB
    // recomputes the expected dimensions and EXACT pixel-sample sum
    // from the formula over a generated (x,y) grid. PNG is lossless,
    // so any decoder drift (wrong raster band handling, premultiplied
    // alpha, palette expansion) flips the integer sum — no float
    // rounding in the contract. pixel_sum is recovered from the
    // decoder's mean: mean*n carries ~1e-9 absolute error for these
    // sizes, far under the 0.5 round() recovers through.
    "m7_png_decode" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.extractImageFeatures(
            MediaPipeline.pngFixtures(s, d),
            () => new MediaPipeline.ImageIoDecoder).toDF()
          .select(col("media_id"),
            col("width"), col("height"), col("channels"),
            round(col("mean_byte") * col("width") * col("height")
              * col("channels")).cast("long").as("pixel_sum")),
      Some("""WITH ids AS (
            SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 7) % 16 AS h
            FROM documents WHERE doc_id % 5 = 0)
        SELECT i.doc_id AS media_id,
            CAST(i.w AS INTEGER) AS width,
            CAST(i.h AS INTEGER) AS height,
            3 AS channels,
            CAST(3 * sum((i.doc_id * 31 + gx.x * 7 + gy.y * 13) % 256)
                 AS BIGINT) AS pixel_sum
        FROM ids i,
             (SELECT unnest(range(0, 24)) AS x) gx,
             (SELECT unnest(range(0, 24)) AS y) gy
        WHERE gx.x < i.w AND gy.y < i.h
        GROUP BY 1, 2, 3, 4""")
    )),

    // REAL audio decode, oracle-pinned: synthesized 16-bit LE PCM
    // bytes (MediaPipeline.pcmFixtures — sample formula derivable
    // from doc_id) parsed by the production pcmEnergy extractor;
    // DuckDB recomputes the exact integer frame energy, peak, and
    // sample accounting from the formula over a generated sample
    // index. The audio twin of m7: a byte-order / sign-extension /
    // width mistake in the ByteBuffer decode flips energy_sum.
    "m8_pcm_energy" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.pcmEnergy(MediaPipeline.pcmFixtures(s, d)).toDF()
          .select(col("media_id"),
            col("n_samples").cast("long").as("n_samples"),
            col("n_frames").cast("long").as("n_frames"),
            col("energy_sum"),
            col("peak_abs").cast("long").as("peak_abs")),
      Some("""WITH ids AS (
            SELECT doc_id, 512 + doc_id % 512 AS n
            FROM documents WHERE doc_id % 4 = 1),
          s AS (
            SELECT doc_id, n, i,
                   (doc_id * 17 + i * 31) % 4096 - 2048 AS v
            FROM ids, unnest(range(0, n)) AS t(i))
        SELECT doc_id AS media_id,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n // 256 AS BIGINT) AS n_frames,
               CAST(sum(CASE WHEN i < (n // 256) * 256 THEN v * v
                             ELSE 0 END) AS BIGINT) AS energy_sum,
               CAST(max(abs(v)) AS BIGINT) AS peak_abs
        FROM s GROUP BY 1, 2, 3""")
    )),

    // Consecutive-frame byte deltas of "video" payloads — the exact
    // integer core of scene-cut detection (thresholding is policy;
    // the delta is the operator). ASCII corpus → DuckDB recomputes
    // each delta by comparing the two frames' characters.
    "m9_frame_deltas" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.frameDeltas(MediaPipeline.fromDocuments(s, d)).toDF()
          .select(col("media_id"),
            col("frame_index").cast("long").as("frame_index"),
            col("diff_bytes").cast("long").as("diff_bytes")),
      Some("""WITH v AS (
            SELECT doc_id, text, octet_length(encode(text)) // 256 AS nf
            FROM documents WHERE doc_id % 3 = 0),
          pairs AS (
            SELECT doc_id, text, CAST(k AS BIGINT) AS k
            FROM v, unnest(range(0, nf - 1)) AS t(k))
        SELECT doc_id AS media_id, k AS frame_index,
               CAST(len([j for j in range(1, 257)
                         if text[CAST(k*256+j AS INTEGER)]
                            <> text[CAST(k*256+256+j AS INTEGER)]])
                 AS BIGINT) AS diff_bytes
        FROM pairs""")
    )),

    // flatMap frame sampling: every 4th 256-byte frame of "video" rows.
    "m3_frame_samples" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.frameSamplesDf(s, d)
          .select("media_id", "frame_index", "offset", "frame_bytes"),
      Some("""SELECT doc_id AS media_id,
          CAST(f AS INTEGER) AS frame_index,
          f * 256 AS offset,
          256 AS frame_bytes
        FROM (SELECT doc_id, octet_length(encode(text)) AS n
              FROM documents WHERE doc_id % 3 = 0),
             unnest(range(0, n // 256, 4)) AS t(f)""")
    )),

    // KEYFRAME selection — the standard follow-on to m9's frame
    // deltas: per video, the top-3 frames by inter-frame change
    // (largest scene movement), ties to the earliest frame. This is
    // the "pick representative frames for captioning/embedding"
    // primitive of a multimodal curation stack. Same exact byte-delta
    // core as m9 (one definition of "change"); the per-media rank
    // compiles to WindowGroupLimit — per-partition partial top-k over
    // frame-cardinality partitions, never a global sort.
    "m11_keyframes" -> ((
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("media_id")
          .orderBy(col("diff_bytes").desc, col("frame_index"))
        MediaPipeline.frameDeltas(MediaPipeline.fromDocuments(s, d)).toDF()
          .select(col("media_id"),
            col("frame_index").cast("long").as("frame_index"),
            col("diff_bytes").cast("long").as("diff_bytes"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
      },
      Some("""WITH v AS (
            SELECT doc_id, text, octet_length(encode(text)) // 256 AS nf
            FROM documents WHERE doc_id % 3 = 0),
          pairs AS (
            SELECT doc_id, text, CAST(k AS BIGINT) AS k
            FROM v, unnest(range(0, nf - 1)) AS t(k)),
          deltas AS (
            SELECT doc_id AS media_id, k AS frame_index,
                   CAST(len([j for j in range(1, 257)
                             if text[CAST(k*256+j AS INTEGER)]
                                <> text[CAST(k*256+256+j AS INTEGER)]])
                     AS BIGINT) AS diff_bytes
            FROM pairs)
        SELECT media_id, frame_index, diff_bytes, CAST(rk AS BIGINT) AS rk
        FROM (SELECT media_id, frame_index, diff_bytes,
                     row_number() OVER (PARTITION BY media_id
                       ORDER BY diff_bytes DESC, frame_index) AS rk
              FROM deltas)
        WHERE rk <= 3""")
    )),

    // Silence segmentation over decoded PCM — the VAD core every
    // audio-curation pipeline runs before transcription: per-frame
    // energies (m8's decode, row-per-frame) thresholded at τ, then
    // gaps-and-islands per media over the NON-silent frames → maximal
    // voiced segments. τ = 360e6 sits at the fixture corpus's median
    // frame energy, so both verdicts occur live. Exact integers
    // end-to-end; DuckDB recomputes every frame energy from the
    // sample formula and must byte-match segment counts and the
    // longest run. Scale shape: narrow per-frame flatMap decode, one
    // per-media window (frame-cardinality partitions), two media-
    // keyed aggregates — no cross-media work anywhere.
    // Per-frame zero-crossing counts + voiced/unvoiced flags — the
    // classic ZCR feature beside m8's energy (voiced speech = low
    // ZCR, fricatives/noise = high). Crossing = within-frame
    // consecutive pair changing sign under `s >= 0` (zero counts
    // positive; the operator/oracle shared convention), boundary
    // pairs excluded, trailing partial frame dropped. The oracle
    // re-derives every crossing from the synthesis formula via a
    // lead() window — the decode loop's indexing, endianness and
    // sign handling all pin or the counts drift. Scale: narrow
    // flatMap, no shuffle; the flag is per-row policy.
    "m14_zero_crossings" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline
          .pcmZeroCrossings(MediaPipeline.pcmFixtures(s, d)).toDF()
          .select(col("media_id"),
            col("frame_index").cast("long").as("frame_index"),
            col("crossings"),
            (col("crossings") >= 64).as("unvoiced")),
      Some("""WITH ids AS (
            SELECT doc_id, 512 + doc_id % 512 AS n
            FROM documents WHERE doc_id % 4 = 1),
          s AS (
            SELECT doc_id, n, i,
                   (doc_id * 17 + i * 31) % 4096 - 2048 AS v
            FROM ids, unnest(range(0, n)) AS t(i)),
          p AS (
            SELECT doc_id, n, i, i // 256 AS k,
                   v >= 0 AS nonneg,
                   lead(v >= 0) OVER (PARTITION BY doc_id
                     ORDER BY i) AS next_nonneg
            FROM s)
        SELECT doc_id AS media_id, CAST(k AS BIGINT) AS frame_index,
               CAST(sum(CASE WHEN nonneg <> next_nonneg
                             THEN 1 ELSE 0 END) AS BIGINT) AS crossings,
               CAST(sum(CASE WHEN nonneg <> next_nonneg
                             THEN 1 ELSE 0 END) AS BIGINT) >= 64
                 AS unvoiced
        FROM p
        WHERE k < n // 256 AND i % 256 < 255
        GROUP BY 1, 2""")
    )),

    "m10_silence_segments" -> ((
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val tau = 360000000L
        val fe = MediaPipeline
          .pcmFrameEnergies(MediaPipeline.pcmFixtures(s, d)).toDF()
        val w = Window.partitionBy("media_id").orderBy("frame_index")
        val flagged = fe
          .withColumn("silent", col("energy") < tau)
          .withColumn("new_run",
            when(!col("silent") &&
              coalesce(lag(col("silent"), 1).over(w), lit(true)), 1L)
              .otherwise(0L))
        val runs = flagged
          .withColumn("run_id", sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(!col("silent"))
          .groupBy("media_id", "run_id")
          .agg(count(lit(1)).as("run_len"))
        val runStats = runs.groupBy("media_id")
          .agg(count(lit(1)).as("n_segments"),
            max("run_len").as("longest_run"))
        flagged.groupBy("media_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"))
          .join(runStats, Seq("media_id"), "left")
          .select(col("media_id"), col("n_frames"), col("n_silent"),
            coalesce(col("n_segments"), lit(0L)).as("n_segments"),
            coalesce(col("longest_run"), lit(0L)).as("longest_run"))
      },
      Some("""WITH ids AS (
            SELECT doc_id, 512 + doc_id % 512 AS n
            FROM documents WHERE doc_id % 4 = 1),
          smp AS (
            SELECT doc_id, n, i,
                   (doc_id * 17 + i * 31) % 4096 - 2048 AS v
            FROM ids, unnest(range(0, n)) AS t(i)),
          f AS (
            SELECT doc_id, CAST(i // 256 AS BIGINT) AS k, sum(v * v) AS e
            FROM smp WHERE i < (n // 256) * 256 GROUP BY 1, 2),
          fl AS (
            SELECT doc_id, k, e < 360000000 AS silent,
                   CASE WHEN e >= 360000000 AND coalesce(
                          lag(e < 360000000) OVER (PARTITION BY doc_id
                            ORDER BY k), TRUE)
                        THEN 1 ELSE 0 END AS new_run
            FROM f),
          r AS (
            SELECT doc_id, k, silent,
                   sum(new_run) OVER (PARTITION BY doc_id ORDER BY k)
                     AS run_id
            FROM fl),
          runs AS (
            SELECT doc_id, run_id, count(*) AS run_len
            FROM r WHERE NOT silent GROUP BY 1, 2),
          rs AS (
            SELECT doc_id, count(*) AS n_segments,
                   max(run_len) AS longest_run
            FROM runs GROUP BY 1),
          fs AS (
            SELECT doc_id, count(*) AS n_frames,
                   sum(CASE WHEN silent THEN 1 ELSE 0 END) AS n_silent
            FROM fl GROUP BY 1)
        SELECT fs.doc_id AS media_id,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(n_silent AS BIGINT) AS n_silent,
               CAST(coalesce(n_segments, 0) AS BIGINT) AS n_segments,
               CAST(coalesce(longest_run, 0) AS BIGINT) AS longest_run
        FROM fs LEFT JOIN rs ON fs.doc_id = rs.doc_id""")
    )),

    // REAL integer image resize (MediaPipeline.boxResize) — retires
    // m4's byte-subsampling stub for actual pixels: decode the
    // lossless PNG fixtures (m7's decoder path), box-filter
    // downsample 2× with exact integer block means (sum // 4 per
    // channel), and publish position-pinning integer stats — the
    // plain sample sum AND a position-weighted checksum (sample ×
    // (its 1-based interleaved index)) so a transposed, flipped, or
    // off-by-one-block resampler flips the hash even when the value
    // multiset survives. DuckDB recomputes every output sample from
    // the pixel formula alone: fixture pixels are gray (3 equal
    // channels), so block means are channel-independent and the
    // 3-channel interleave contributes 9p+6 per gray pixel p to the
    // weighted sum. Scale shape: per-partition decode + one raster
    // pass, no shuffle — the mapInPandas shape in Scala form.
    "m12_box_resize" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.boxResize(MediaPipeline.pngFixtures(s, d), factor = 2)
          .toDF()
          .select(col("media_id"),
            col("out_w").cast("long").as("out_w"),
            col("out_h").cast("long").as("out_h"),
            col("channels").cast("long").as("channels"),
            expr("aggregate(samples, 0L, (a, x) -> a + x)")
              .as("pixel_sum"),
            expr("""aggregate(
                zip_with(samples, sequence(1L, size(samples)),
                         (v, i) -> CAST(v AS BIGINT) * i),
                0L, (a, x) -> a + x)""").as("pos_weighted_sum")),
      Some("""WITH ids AS (
            SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 7) % 16 AS h
            FROM documents WHERE doc_id % 5 = 0),
          px AS (
            SELECT i.doc_id, i.w // 2 AS ow, i.h // 2 AS oh,
                   gx.x AS x, gy.y AS y,
                   ((i.doc_id * 31 + (2 * gx.x) * 7 + (2 * gy.y) * 13) % 256
                  + (i.doc_id * 31 + (2 * gx.x + 1) * 7 + (2 * gy.y) * 13) % 256
                  + (i.doc_id * 31 + (2 * gx.x) * 7 + (2 * gy.y + 1) * 13) % 256
                  + (i.doc_id * 31 + (2 * gx.x + 1) * 7 + (2 * gy.y + 1) * 13) % 256)
                   // 4 AS v
            FROM ids i,
                 (SELECT unnest(range(0, 12)) AS x) gx,
                 (SELECT unnest(range(0, 12)) AS y) gy
            WHERE gx.x < i.w // 2 AND gy.y < i.h // 2)
        SELECT doc_id AS media_id,
               CAST(ow AS BIGINT) AS out_w,
               CAST(oh AS BIGINT) AS out_h,
               CAST(3 AS BIGINT) AS channels,
               CAST(3 * sum(v) AS BIGINT) AS pixel_sum,
               CAST(sum(v * (9 * (y * ow + x) + 6)) AS BIGINT)
                 AS pos_weighted_sum
        FROM px GROUP BY 1, 2, 3, 4""")
    )),

    // Luma-histogram image-quality gate — the vision analog of the
    // t28 repetition rules: per decoded image, the 16-bin band-0
    // histogram's mass concentration. Flat/low-diversity payloads
    // (solid fills, letterboxes, uniform decode-failure noise) put
    // their mass in few bins; the gate statistic is the dominant
    // bin's share (ties → lowest bin, as max(struct(n, −bin)) — the
    // oracle replays it as a (n desc, bin) row_number). Real decoded
    // pixels (m7's machinery), oracle recomputing from the fixture
    // pixel formula. Narrow flatMap with fan-out ≤ 16 rows per
    // media; the rollup is a map-side-combinable per-media aggregate.
    "m15_pixel_histogram" -> ((
      (s: SparkSession, d: String) =>
        MediaPipeline.pixelHistogram(MediaPipeline.pngFixtures(s, d))
          .toDF()
          .groupBy(col("media_id"))
          .agg(sum("n").as("n_pixels"),
            count(lit(1)).as("nonzero_bins"),
            max(struct(col("n"), (-col("bin")).as("nb"))).as("d"))
          .select(col("media_id"), col("n_pixels"), col("nonzero_bins"),
            (-col("d.nb")).cast("long").as("dom_bin"),
            col("d.n").as("dom_n"))
          .withColumn("is_flat", col("dom_n") * 8L >= col("n_pixels")),
      Some("""WITH ids AS (
            SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 7) % 16 AS h
            FROM documents WHERE doc_id % 5 = 0),
          px AS (
            SELECT i.doc_id,
                   ((i.doc_id * 31 + gx.x * 7 + gy.y * 13) % 256) // 16
                     AS bin
            FROM ids i,
                 (SELECT unnest(range(0, 24)) AS x) gx,
                 (SELECT unnest(range(0, 24)) AS y) gy
            WHERE gx.x < i.w AND gy.y < i.h),
          hist AS (
            SELECT doc_id, bin, count(*) AS n FROM px GROUP BY 1, 2),
          dom AS (
            SELECT doc_id, bin, n, row_number() OVER (
              PARTITION BY doc_id ORDER BY n DESC, bin) AS rk
            FROM hist)
        SELECT h.doc_id AS media_id,
               CAST(sum(h.n) AS BIGINT) AS n_pixels,
               CAST(count(*) AS BIGINT) AS nonzero_bins,
               CAST(any_value(d.bin) AS BIGINT) AS dom_bin,
               CAST(any_value(d.n) AS BIGINT) AS dom_n,
               any_value(d.n) * 8 >= sum(h.n) AS is_flat
        FROM hist h JOIN dom d ON h.doc_id = d.doc_id AND d.rk = 1
        GROUP BY 1""")
    )),

    // CROSS-MODAL curation join — the first m-query that composes
    // modalities: a doc survives only if its image decodes clean at
    // usable resolution (m7's real PNG decode, min-area gate ≥150 px)
    // AND its text clears the t28 Gopher rules — the
    // image+caption-pair curation shape (LAION-style) where each
    // modality's filter gates the OTHER modality's data. Reuses the
    // exact m7 decoder path and the exact TextProfile.withGopherRules
    // derivation (one definition each side), equi-joined on doc id —
    // at 100 TB a co-partitioned join on the shared key — then
    // aggregated to per-source yields with exact ppm integers.
    "m13_crossmodal_yield" -> ((
      (s: SparkSession, d: String) => {
        val media = MediaPipeline.extractImageFeatures(
            MediaPipeline.pngFixtures(s, d),
            () => new MediaPipeline.ImageIoDecoder).toDF()
          .select(col("media_id").as("doc_id"),
            (col("width") * col("height") >= 150).as("media_ok"))
        val text = graft.operators.TextProfile
          .withGopherRules(Derived.table(s, d, "documents"))
          .select(col("doc_id"), col("kept").as("text_ok"))
        val src = Derived.table(s, d, "documents")
          .select(col("doc_id"), col("source"))
        media.join(text, Seq("doc_id"))
          .join(src, Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_media"),
            sum(when(col("media_ok"), 1L).otherwise(0L)).as("n_media_ok"),
            sum(when(col("text_ok"), 1L).otherwise(0L)).as("n_text_ok"),
            sum(when(col("media_ok") && col("text_ok"), 1L).otherwise(0L))
              .as("n_curated"))
          .select(col("source"), col("n_media"), col("n_media_ok"),
            col("n_text_ok"), col("n_curated"),
            // raw ppm retained: the numerator counts MEDIA ITEMS, each
            // ≥ KBs of payload — ≤ ~1e11 items at 100 TB, an order
            // below the 9e12 multiply-first bound
            expr("n_curated * 1000000L div n_media").as("yield_ppm"))
      },
      Some("""WITH ids AS (
            SELECT doc_id,
                   (8 + doc_id % 16) * (8 + (doc_id // 7) % 16) >= 150
                     AS media_ok
            FROM documents WHERE doc_id % 5 = 0),
          t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          base AS (
            SELECT doc_id, CAST(len(w) AS BIGINT) AS n,
                   CAST(list_sum(list_transform(w, x -> length(x)))
                     AS BIGINT) AS chars,
                   CAST(len(list_filter(w,
                     x -> x IN ('the', 'a', 'of', 'and', 'to')))
                     AS BIGINT) AS stops
            FROM t),
          bg AS (
            SELECT doc_id, b.w1 AS w1, b.w2 AS w2
            FROM (SELECT doc_id,
                    unnest([{'w1': w[i], 'w2': w[i+1]}
                            for i in range(1, len(w))]) AS b
                  FROM t)),
          bc AS (SELECT doc_id, count(*) AS c FROM bg
                 GROUP BY doc_id, w1, w2),
          bm AS (SELECT doc_id, max(c) AS mx, sum(c) AS nb FROM bc
                 GROUP BY doc_id),
          kept AS (
            SELECT b.doc_id,
                   ((b.n >= 20 AND b.n <= 200)
                    AND (b.chars >= b.n * 4 AND b.chars <= b.n * 10)
                    AND (b.stops >= 2)
                    AND (bm.mx IS NULL OR bm.mx * 25 <= bm.nb * 2))
                     AS text_ok
            FROM base b LEFT JOIN bm USING (doc_id))
        SELECT d.source,
               count(*) AS n_media,
               CAST(sum(CASE WHEN i.media_ok THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_media_ok,
               CAST(sum(CASE WHEN k.text_ok THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_text_ok,
               CAST(sum(CASE WHEN i.media_ok AND k.text_ok THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_curated,
               CAST(sum(CASE WHEN i.media_ok AND k.text_ok THEN 1 ELSE 0 END)
                    * 1000000
                    // count(*) AS BIGINT) AS yield_ppm
        FROM ids i
        JOIN kept k USING (doc_id)
        JOIN documents d USING (doc_id)
        GROUP BY 1""")
    )),
  )
}
