package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline text operators over the `documents` table:
  * token statistics, quality scoring, heuristic language ID, exact
  * dedup, shingle profiles, MinHash signatures + LSH candidate pairs,
  * SimHash fingerprints, and the multimodal binary-column plumbing.
  *
  * Hashing is md5-hex-prefix → int64 in BOTH engines (Spark `conv`,
  * DuckDB `'0x…'::BIGINT`) so the oracles stay engine-independent —
  * Spark's xxhash64/hash and DuckDB's hash() would never agree.
  *
  * Scale notes: everything here is embarrassingly parallel per
  * document except the LSH bucket join, which shuffles once on
  * (band, bucket-hash) — the standard way to avoid the O(n²) pair
  * comparison at 100 TB.
  */
object TextQueries {

  import RefQueries.Fn

  private def docs(s: SparkSession, d: String) =
    Derived.table(s, d, "documents")

  /** documents with the scan respread to the session cores
    * ([[Derived.spreadSmallScan]]) — ONLY for the explode-heavy
    * derivations where per-doc compute (shingle/minhash/n-gram
    * hashing, edit-distance blocking) dominates the scan: measured
    * round 19, these won −0.4 to −3.3 s each under the respread
    * while light consumers LOST ~+0.3-0.9 s to the exchange, so the
    * opt-in is per call site, never blanket.
    */
  private def docsSpread(s: SparkSession, d: String) =
    Derived.table(s, d, "documents", spread = true)

  /** THE corpus/new-batch split for the incremental-ingest family
    * (d12 admission join, d13 bloom/probe/exact sides), defined ONCE:
    * doc_id % 4 = 0 is the deterministic stand-in for "snapshot N+1".
    * All sides must agree on it — drift would silently weaken d13's
    * no-false-negative oracle (gate_ok would still read TRUE for docs
    * the bloom never saw the corpus keys of). The DuckDB oracles
    * replicate it literally as `doc_id % 4 = 0` / `<> 0`.
    */
  private val isNewBatch = pmod(col("doc_id"), lit(4)) === 0

  /** BPE-ish pre-tokenizer: letter runs, digit chunks of at most 3,
    * single non-alphanumeric marks. No lookarounds — Java regex and
    * RE2 segment identically (t17 + its spec).
    */
  private[graft] val bpePattern = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 ]"

  /** k-salted portable 60-bit hash (both engines) — one definition in
    * graft.functions.PortableHash; these are query-local shorthands.
    */
  private[graft] def saltedHash(k: Int, c: org.apache.spark.sql.Column) =
    graft.functions.PortableHash.saltedHash(k, c)

  private def saltedHashSql(k: Int, e: String) =
    graft.functions.PortableHash.saltedHashSql(k, e)

  /** Distinct word-3-gram shingles (falls back to the whole text for
    * very short docs), Spark side as a SQL expression over `w`.
    */
  private val shinglesExpr =
    """CASE WHEN size(w) < 3 THEN array(concat_ws(' ', w))
       ELSE array_distinct(transform(sequence(0, size(w) - 3),
              i -> concat_ws(' ', slice(w, i + 1, 3)))) END"""

  private val shinglesSql =
    """CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
       ELSE list_distinct([array_to_string(w[i:i+2], ' ')
              for i in range(1, len(w) - 1)]) END"""

  /** THE 8-token substring-dedup window, defined once for d14
    * (coverage flag) and d15 (removal rewrite): drift between their
    * window or hash derivations would make d15 remove spans d14 never
    * flagged. Spark side enumerates windows as a higher-order
    * transform over the token array; the DuckDB side hashes the
    * identical window string with the identical portable salted hash.
    */
  private val winTransformExpr =
    """transform(sequence(1, size(w) - 7),
         i -> concat_ws(' ', slice(w, i, 8)))"""

  private val winHashSql =
    saltedHashSql(13, "array_to_string(w[i:i+7], ' ')")

  /** Same shingles without the distinct pass — for consumers that are
    * duplicate-invariant (minhash).
    */
  private val shinglesRawExpr =
    """CASE WHEN size(w) < 3 THEN array(concat_ws(' ', w))
       ELSE transform(sequence(0, size(w) - 3),
              i -> concat_ws(' ', slice(w, i + 1, 3))) END"""

  private val shinglesRawSql =
    """CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
       ELSE [array_to_string(w[i:i+2], ' ')
              for i in range(1, len(w) - 1)] END"""

  /** Distinct word-5-gram derivation shared by contamination (t13) and
    * novelty (t16) — one definition per engine so the two queries can
    * never disagree on what a 5-gram is.
    */
  private val fiveGramsExpr =
    """CASE WHEN size(w) < 5 THEN array(concat_ws(' ', w))
       ELSE array_distinct(transform(sequence(0, size(w) - 5),
              i -> concat_ws(' ', slice(w, i + 1, 5)))) END"""

  private val fiveGramsSql =
    """CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
       ELSE list_distinct([array_to_string(w[i:i+4], ' ')
              for i in range(1, len(w) - 3)]) END"""

  /** THE per-doc bigram-LM sufficient statistics, defined once for
    * t22 (LM predictability score) and t26 (CCNet-style per-language
    * bucketing of that score): bigram counts c12 / left-unigram
    * counts c1 over the corpus itself, each doc scoring
    * pred_q = Σ floor(c12·1e6 / c1) over its bigram occurrences.
    * Drift between the two queries' LM definitions would bucket a
    * score t22 never reported — both engines share one derivation
    * (this method / [[bigramStatsSqlPrefix]]). Single-token docs have
    * no bigrams and drop out on both sides (Spark: the size guard —
    * sequence(1, 0) would DESCEND; DuckDB: range(1, 1) is empty).
    * lang is carried through the final aggregate (functionally
    * dependent on doc_id — same groups, same shuffle).
    */
  private def bigramDocStats(s: SparkSession, d: String): DataFrame = {
    val bg = docs(s, d)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(floor(col("c12") * lit(1000000.0) / col("c1")))
          .cast("long").as("pred_q"))
  }

  private val bigramStatsSqlPrefix = """WITH t AS (
          SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        bg AS (
          SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2
          FROM (SELECT doc_id, lang,
                  unnest([{'w1': w[i], 'w2': w[i+1]}
                          for i in range(1, len(w))]) AS b
                FROM t)),
        cb AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        cu AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        stats AS (
          SELECT doc_id, lang, count(*) AS n_bigrams,
                 CAST(sum(CAST(floor(c12 * 1000000.0 / c1) AS BIGINT))
                   AS BIGINT) AS pred_q
          FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)
          GROUP BY doc_id, lang)"""

  /** MinHash prime modulus (< 2^30 so the affine step stays exact in
    * int64 in both engines).
    */
  private val P = 1073741789L

  /** Adds MinHash signature columns h0..h3 to any frame with a `text`
    * column, entirely PER ROW: shingle → ONE md5 reduced to a 60-bit
    * base, then 4 affine universal hashes `(a_k·b + c_k) mod P`
    * minimized over the shingle array with `array_min` — no explode,
    * no aggregation shuffle. Values are identical to the historical
    * explode+groupBy formulation (`min` over the same multiset), but
    * the derivation is a stateless narrow map — which is also what
    * lets the STREAMING near-dup gate reuse it verbatim on an
    * unbounded stream (no streaming aggregation state needed).
    */
  private[graft] def withMinhashSignature(df: DataFrame): DataFrame = {
    def h(k: Int) = s"array_min(transform(bv, b -> pmod(b * ${2 * k + 3} " +
      s"+ ${7 * k + 1}, ${P}L)))"
    df.withColumn("w", split(col("text"), " "))
      // one md5 per shingle, shared by the four minimizations
      .withColumn("bv",
        expr(s"transform($shinglesRawExpr, s -> " +
          s"pmod(cast(conv(substring(md5(concat('0:', s)), 1, 15), 16, 10) " +
          s"AS LONG), ${P}L))"))
      .withColumn("h0", expr(h(0))).withColumn("h1", expr(h(1)))
      .withColumn("h2", expr(h(2))).withColumn("h3", expr(h(3)))
      .drop("w", "bv")
  }

  /** Per-doc MinHash signature (doc_id, h0..h3) — see
    * withMinhashSignature for the zero-shuffle derivation.
    */
  def minhashSignatures(s: SparkSession, d: String): DataFrame =
    withMinhashSignature(docsSpread(s, d)).select("doc_id", "h0", "h1", "h2", "h3")

  private val minhashSql = {
    def h(k: Int) = s"(b * ${2 * k + 3} + ${7 * k + 1}) % $P"
    s"""SELECT doc_id,
          min(${h(0)}) AS h0,
          min(${h(1)}) AS h1,
          min(${h(2)}) AS h2,
          min(${h(3)}) AS h3
        FROM (
          SELECT doc_id, ${saltedHashSql(0, "s")} % $P AS b
          FROM (
            SELECT doc_id, unnest($shinglesRawSql) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)))
        GROUP BY doc_id"""
  }

  private val SimhashBits = 16

  /** Both band hashes of the MinHash signature in ONE narrow pass:
    * (doc_id, bh0, bh1). ONE definition shared by the batch LSH
    * pipeline (d4/d7/…) and the STREAMING near-dup gate, so the two
    * surfaces can never disagree on what a band collision is.
    */
  private[graft] def bandedSignatureFlat(
      df: DataFrame, keep: Seq[String] = Nil): DataFrame =
    withMinhashSignature(df).select(col("doc_id") +: (keep.map(col) ++ Seq(
      md5(concat_ws(",", col("h0"), col("h1"))).as("bh0"),
      md5(concat_ws(",", col("h2"), col("h3"))).as("bh1"))): _*)

  /** Fan the flat form out to (doc_id, band, bh) rows — as a
    * two-branch union, NOT `explode(array(struct…))`: generator-input
    * pruning inlines the whole per-row signature tree into the
    * Generate and re-evaluates it per band (measured 10× slower).
    * A caller fanning out from one pass should persist/checkpoint the
    * flat form first; un-materialized, each branch recomputes the
    * signature once (2× a single pass — the streaming gate's price
    * for statelessness).
    */
  private[graft] def explodedBands(
      flat: DataFrame, keep: Seq[String] = Nil): DataFrame =
    flat.select(Seq(col("doc_id"), lit(0).as("band"),
        col("bh0").as("bh")) ++ keep.map(col): _*)
      .union(flat.select(Seq(col("doc_id"), lit(1).as("band"),
        col("bh1").as("bh")) ++ keep.map(col): _*))

  /** (doc_id, band, bh[, keep…]) banded-signature rows for a
    * (doc_id, text[, keep…]) frame — batch or streaming. `keep`
    * columns ride along per band row (the streaming horizon gate
    * carries its event-time column this way — a join-back would be a
    * stream-stream self-join).
    */
  private[graft] def bandedSignature(
      df: DataFrame, keep: Seq[String] = Nil): DataFrame =
    explodedBands(bandedSignatureFlat(df, keep), keep)

  /** LSH candidate pairs (Spark side), shared by d4 and the d7
    * verification stage.
    */
  def lshCandidatePairs(s: SparkSession, d: String): DataFrame =
    lshCandidatePairsDf(docsSpread(s, d))

  /** DataFrame-first form — the one `operators.NearDup` exposes to
    * library consumers with their own corpus.
    */
  private[graft] def lshCandidatePairsDf(docsDf: DataFrame): DataFrame = {
    // The signature pipeline feeds BOTH band branches AND both sides
    // of the self-join — materialize the flat form once instead of
    // paying the shingle hashing four times. localCheckpoint (eager),
    // NOT persist(): persist registers in the CacheManager, which
    // holds a strong reference forever, and this path is now reachable
    // from the public NearDup API — a per-ingest-batch caller would
    // leak one cache entry per call for the life of the session.
    // Checkpoint blocks are released by the ContextCleaner once the
    // plan is GC'd.
    val sig = explodedBands(bandedSignatureFlat(docsDf).localCheckpoint(true))
    sig.as("a").join(sig.as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("band").cast("long").as("band"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  private val lshPairsSql =
    s"""WITH sig AS ($minhashSql),
      bands AS (
        SELECT doc_id, 0 AS band,
               md5(h0::VARCHAR || ',' || h1::VARCHAR) AS bh FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band,
               md5(h2::VARCHAR || ',' || h3::VARCHAR) AS bh FROM sig)
      SELECT DISTINCT CAST(a.band AS BIGINT) AS band, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id"""

  val entries: Map[String, (Fn, Option[String])] = Map(

    // Token counting: whitespace tokens + BPE-ish alnum-run tokens.
    // (Delegates to the TextProfile library API — same expressions.)
    "t1_token_stats" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.TextProfile.withTokenStats(docs(s, d))
          .select("doc_id", "n_tokens", "n_word_tokens", "len_chars"),
      Some("""SELECT doc_id,
          len(string_split(text, ' ')) AS n_tokens,
          len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
          length(text) AS len_chars
        FROM documents""")
    )),

    // Quality scoring: stopword density + punctuation ratio.
    // (Delegates to the TextProfile library API — same expressions.)
    "t2_quality_scores" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.TextProfile.withQualityStats(docs(s, d))
          .select("doc_id", "n_tokens", "stop_hits", "punct_chars",
            "stop_ratio", "punct_ratio"),
      Some("""SELECT doc_id, n_tokens, stop_hits, punct_chars,
          round(CAST(stop_hits AS DOUBLE) / n_tokens, 4) AS stop_ratio,
          round(CAST(punct_chars AS DOUBLE) / length(text), 4) AS punct_ratio
        FROM (SELECT doc_id, text,
            len(string_split(text, ' ')) AS n_tokens,
            len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS stop_hits,
            length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct_chars
          FROM documents)""")
    )),

    // Adaptive per-group quality gating: keep a doc iff its quality
    // score clears its OWN language's 25th-percentile bar — a fixed
    // global threshold over-prunes low-resource languages whose score
    // distribution sits lower. Engine-exact by construction: the
    // score is integer (stop_hits·1e6 div n_tokens, no float ratio)
    // and the bar is an ORDER STATISTIC (k-th smallest, k = ceil(n/4))
    // rather than an interpolated percentile, so the boundary compare
    // can never flip on a last-ulp difference between engines. Plan:
    // one narrow scoring map, one per-lang window (distributed sort
    // within each language partition), threshold rows broadcast back.
    // A 100 TB corpus wanting a cheaper bar swaps the window for
    // approx_percentile — same join-back shape.
    "t21_adaptive_quality_gate" -> ((
      (s: SparkSession, d: String) => {
        val scored = graft.operators.TextProfile
          .withQualityStats(docs(s, d))
          .select(col("doc_id"), col("lang"),
            // raw ppm retained: per-DOC stopword hits (≤ doc tokens,
            // ~1e6 max) — never a corpus-level sum
            expr("stop_hits * 1000000L div n_tokens").as("score"))
          // NULL scores (null text) must be excluded identically in
          // both engines: Spark windows sort nulls FIRST ascending,
          // DuckDB sorts them LAST, so a null row would shift the
          // order statistic differently on each side
          .filter(col("score").isNotNull)
        val wRank = Window.partitionBy("lang")
          .orderBy(col("score"), col("doc_id"))
        val wLang = Window.partitionBy("lang")
        val thr = scored
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wLang))
          .filter(col("rn") === expr("(n + 3L) div 4"))
          .select(col("lang"), col("score").as("q25_threshold"))
        scored.join(broadcast(thr), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("score"),
            col("q25_threshold"),
            (col("score") >= col("q25_threshold")).as("kept"))
      },
      Some("""WITH scored AS (
          SELECT doc_id, lang,
                 (len(regexp_extract_all(text, '\b(the|a|of|and|to)\b'))
                    * 1000000)
                   // len(string_split(text, ' ')) AS score
          FROM documents
          WHERE text IS NOT NULL),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY lang
                      ORDER BY score, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM scored),
        thr AS (
          SELECT lang, score AS q25_threshold
          FROM ranked WHERE rn = (n + 3) // 4)
        SELECT s.doc_id, s.lang, s.score, t.q25_threshold,
               (s.score >= t.q25_threshold) AS kept
        FROM scored s JOIN thr t USING (lang)""")
    )),

    // Per-language WINSORIZATION: clip each doc's token count into its
    // own language's exact [P10, P90] — the outlier-taming step before
    // any length-sensitive curation statistic (mean doc length, token
    // budgets) so one 10 MB page or one empty stub can't drag a
    // language's numbers. Thresholds are exact order statistics via
    // the t21 rank pattern (row_number + count per lang, tie-broken by
    // doc_id) — NOT percentile_approx — so both engines compute the
    // identical cut; both cuts come from ONE pass over the ranked
    // frame (conditional min at two ranks), then broadcast-join back.
    // At 100 TB: the rank window partitions by lang (shardable); the
    // threshold table is lang-cardinality; the clip itself is a
    // narrow map. Swap the window for approx_percentile if exact cuts
    // stop being worth the per-lang sort.
    "t24_winsorize" -> ((
      (s: SparkSession, d: String) => {
        val scored = graft.operators.TextProfile
          .withQualityStats(docs(s, d))
          .select(col("doc_id"), col("lang"),
            col("n_tokens").cast("long").as("tokens"))
          .filter(col("tokens").isNotNull)
        val wRank = Window.partitionBy("lang")
          .orderBy(col("tokens"), col("doc_id"))
        val wLang = Window.partitionBy("lang")
        val thr = scored
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wLang))
          .groupBy("lang")
          .agg(
            min(when(col("rn") === expr("(n + 9L) div 10"),
              col("tokens"))).as("p10"),
            min(when(col("rn") === expr("n + 1L - (n + 9L) div 10"),
              col("tokens"))).as("p90"))
        scored.join(broadcast(thr), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("tokens"),
            col("p10"), col("p90"),
            least(greatest(col("tokens"), col("p10")), col("p90"))
              .as("winsorized"))
      },
      Some("""WITH scored AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
          FROM documents
          WHERE text IS NOT NULL),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY lang
                      ORDER BY tokens, doc_id) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM scored),
        thr AS (
          SELECT lang,
                 min(CASE WHEN rn = (n + 9) // 10 THEN tokens END) AS p10,
                 min(CASE WHEN rn = n + 1 - (n + 9) // 10 THEN tokens END)
                   AS p90
          FROM ranked GROUP BY lang)
        SELECT s.doc_id, s.lang, s.tokens, t.p10, t.p90,
               least(greatest(s.tokens, t.p10), t.p90) AS winsorized
        FROM scored s JOIN thr t USING (lang)""")
    )),

    // Heuristic n-gram language ID: stopword votes per language + CJK
    // detection, deterministic tie-break by vote order.
    // (Delegates to the TextProfile library API — same expressions.)
    "t3_lang_guess" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.TextProfile.withLangGuess(docs(s, d))
          .select("doc_id", "lang", "hits_en", "hits_de", "hits_es",
            "hits_fr", "lang_guess"),
      Some("""SELECT doc_id, lang, hits_en, hits_de, hits_es, hits_fr,
          CASE WHEN cjk > 0 THEN 'zh'
               WHEN hits_en >= greatest(hits_de, hits_es, hits_fr) THEN 'en'
               WHEN hits_de >= greatest(hits_es, hits_fr) THEN 'de'
               WHEN hits_es >= hits_fr THEN 'es'
               ELSE 'fr' END AS lang_guess
        FROM (SELECT doc_id, lang,
            len(regexp_extract_all(text, '\b(the|of|and|to|in)\b')) AS hits_en,
            len(regexp_extract_all(text, '\b(der|die|das|und|ist)\b')) AS hits_de,
            len(regexp_extract_all(text, '\b(el|los|las|una|y)\b')) AS hits_es,
            len(regexp_extract_all(text, '\b(le|les|et|des|est)\b')) AS hits_fr,
            len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk
          FROM documents)""")
    )),

    // Deterministic train/val/test split: each doc lands in a split by
    // its portable md5 bucket — reproducible across runs, engines, and
    // cluster sizes (unlike rand()-based sampling), and a narrow map at
    // any scale. 80/10/10 on bucket = hash % 100.
    "t4_hash_split" -> ((
      (s: SparkSession, d: String) => {
        // (Delegates to the TextProfile library API — same bucketing.)
        graft.operators.TextProfile.hashSplit(docs(s, d))
          .groupBy("split")
          // Exact integer aggregates only: a rounded-double avg ties
          // differently between Spark's HALF_UP decimal rendering and
          // DuckDB's binary-double rounding (hash-mismatched r2). The
          // mean is derivable as total_chars / n_docs.
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"))
      },
      Some(s"""SELECT split, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (SELECT n_chars,
            CASE WHEN ${saltedHashSql(0, "doc_id::VARCHAR")} % 100 < 80 THEN 'train'
                 WHEN ${saltedHashSql(0, "doc_id::VARCHAR")} % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM documents)
        GROUP BY split""")
    )),

    // TF-IDF statistics: per-(doc, token) term frequency joined with
    // the global document frequency and corpus size — the two-level
    // aggregation every relevance/quality scorer needs. Shape at scale:
    // one shuffle on (doc_id, token) for tf, one on token for df; the
    // df table (vocabulary-sized, orders of magnitude smaller than the
    // doc-token table) broadcasts back onto tf, and the corpus size
    // joins as a broadcast scalar — no driver-side collect. Outputs are
    // integer-only (tf, df, n_docs): the float idf = ln((n+1)/(df+1))
    // is derivable but engine log() rounding is not hash-portable.
    // tf >= 3 keeps the output the interesting tail, not the corpus.
    "t11_tfidf" -> ((
      (s: SparkSession, d: String) => {
        val tokens = docs(s, d)
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        val tf = tokens.groupBy("doc_id", "token")
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("token")
          .agg(count(lit(1)).as("df"))
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        tf.filter(col("tf") >= 3)
          // UNHINTED: dfreq is token-vocabulary cardinality —
          // unbounded at 100 TB (the Bpe-vocab class); AQE
          // broadcasts it while it fits, shuffles past that
          .join(dfreq, Seq("token"))
          .crossJoin(broadcast(n))
          .select("doc_id", "token", "tf", "df", "n_docs")
      },
      Some("""WITH tokens AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents),
        tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM tokens WHERE token <> '' GROUP BY doc_id, token),
        dfreq AS (
          SELECT token, count(*) AS df FROM tf GROUP BY token)
        SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
               (SELECT count(*) FROM documents) AS n_docs
        FROM tf JOIN dfreq ON tf.token = dfreq.token
        WHERE tf.tf >= 3""")
    )),

    // Context-window chunking: split each document into fixed 64-token
    // chunks — the packing step before sequence training. Pure per-row
    // explode (zero shuffles, linear at any scale); each chunk carries
    // its token count and an md5 fingerprint of the actual chunk text
    // so the oracle verifies real content, not just counts.
    // (Delegates to the Packing library API — same expressions.)
    "t12_chunk_pack" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.Packing.chunk(docs(s, d))
          .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"),
            md5(col("chunk_text")).as("chunk_fp")),
      Some("""WITH b AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        c AS (
          SELECT doc_id, w,
                 unnest(range(0, (len(w) + 63) // 64)) AS chunk_id
          FROM b)
        SELECT doc_id, chunk_id,
               len(w[chunk_id*64+1 : chunk_id*64+64]) AS chunk_tokens,
               md5(array_to_string(w[chunk_id*64+1 : chunk_id*64+64], ' '))
                 AS chunk_fp
        FROM c""")
    )),

    // OVERLAPPING sliding-window chunking (k=32, stride=24 — 25%
    // overlap), the RAG/long-context variant of t12: consecutive
    // chunks share 8 tokens so no context span is split across a
    // hard boundary. Same zero-shuffle per-row explode; every chunk
    // publishes its offset, token count, and an md5 of the actual
    // text (content verified, not just counts). Boundary arithmetic
    // is exact integers — a doc of ≤ 32 tokens is one chunk, else
    // 1 + ceil((n-32)/24) — the exact place an off-by-one drops or
    // duplicates a tail token, which is why both engines derive it
    // independently. (Delegates to Packing.chunkOverlap.)
    "t37_overlap_chunks" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.Packing
          .chunkOverlap(docs(s, d), chunkTokens = 32, stride = 24)
          .select(col("doc_id"), col("chunk_id"), col("offset"),
            col("chunk_tokens"), md5(col("chunk_text")).as("chunk_fp")),
      Some("""WITH b AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        c AS (
          SELECT doc_id, w,
                 unnest(range(0, CASE WHEN len(w) <= 32 THEN 1
                   ELSE 1 + (len(w) - 32 + 23) // 24 END)) AS chunk_id
          FROM b)
        SELECT doc_id, chunk_id, chunk_id * 24 AS offset,
               len(w[chunk_id*24+1 : chunk_id*24+32]) AS chunk_tokens,
               md5(array_to_string(w[chunk_id*24+1 : chunk_id*24+32], ' '))
                 AS chunk_fp
        FROM c""")
    )),

    // n-gram novelty: per document, how many of its distinct 5-grams
    // appear in NO other document — the inverse of contamination and a
    // strong generated/boilerplate discriminator (novel ≈ original
    // prose; low novelty ≈ template or near-dup). Two shuffles: gram →
    // document-frequency, then a rejoin onto the doc's grams. Integer
    // outputs only.
    "t16_ngram_novelty" -> ((
      (s: SparkSession, d: String) => {
        val grams = docsSpread(s, d)
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(fiveGramsExpr)).as("g"))
        val gdf = grams.groupBy("g").agg(count(lit(1)).as("df"))
        grams.join(gdf, Seq("g"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      },
      Some(s"""WITH grams AS (
          SELECT doc_id,
                 unnest($fiveGramsSql) AS g
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        gdf AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_novel
        FROM grams JOIN gdf USING (g)
        GROUP BY doc_id""")
    )),

    // Deterministic weighted priority sampling: rank by hash/weight and
    // keep the k smallest — selection probability grows with weight
    // (longer docs here), membership is reproducible across runs,
    // engines, and cluster sizes (the weighted analog of t4's hash
    // split; rand()-based weighted sampling changes membership every
    // run). Plans as one bounded TakeOrdered — no global sort of the
    // corpus materializes. hash/weight is a single IEEE division,
    // correctly rounded in both engines, so the boundary is portable.
    // (Delegates to the Sampling library API — same expressions.)
    "t15_weighted_sample" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.Sampling
          .weightedPriority(docs(s, d), col("n_chars"), n = 20)
          .select("doc_id", "n_chars", "lang"),
      Some(s"""SELECT doc_id, n_chars, lang
        FROM (SELECT doc_id, n_chars, lang,
                CAST(${saltedHashSql(6, "doc_id::VARCHAR")} AS DOUBLE)
                  / n_chars AS priority
              FROM documents
              -- mirror weightedPriority's eligibility contract: null /
              -- non-positive weights are excluded, not mis-ranked
              WHERE n_chars IS NOT NULL AND n_chars > 0)
        ORDER BY priority, doc_id LIMIT 20""")
    )),

    // Sequence packing: concatenate chunks into 2048-token training
    // bins. Packing is SHARD-LOCAL (hash-shard per doc, window within
    // shard) — a global greedy pack would need a single-partition
    // window, which is exactly the operator that cannot exist at
    // 100 TB; per-shard packing is what a distributed pipeline actually
    // runs (each worker packs its own slice; fill efficiency is
    // unchanged for i.i.d. chunk sizes). Outputs per (shard, bin):
    // chunk count and exact token total.
    // (Delegates to the Packing library API — same expressions.)
    "t14_sequence_pack" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.Packing.packBins(
            graft.operators.Packing.chunk(docs(s, d))
              .drop("chunk_text"))
          .groupBy("shard", "bin")
          .agg(count(lit(1)).as("n_chunks"),
            sum("chunk_tokens").as("bin_tokens")),
      Some(s"""WITH b AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        c AS (
          SELECT doc_id, w,
                 unnest(range(0, (len(w) + 63) // 64)) AS chunk_id
          FROM b),
        chunks AS (
          SELECT doc_id, chunk_id,
                 len(w[chunk_id*64+1 : chunk_id*64+64]) AS chunk_tokens,
                 ${saltedHashSql(5, "doc_id::VARCHAR")} % 8 AS shard
          FROM c),
        packed AS (
          SELECT shard, chunk_tokens,
                 -- window sum is HUGEINT in DuckDB; cast back or the
                 -- derived bin decays to float64 through pandas and
                 -- hash-mismatches Spark's int64
                 CAST(sum(chunk_tokens) OVER (PARTITION BY shard
                   ORDER BY doc_id, chunk_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM chunks)
        SELECT shard, (cum - chunk_tokens) // 2048 AS bin,
               count(*) AS n_chunks,
               CAST(sum(chunk_tokens) AS BIGINT) AS bin_tokens
        FROM packed GROUP BY shard, (cum - chunk_tokens) // 2048""")
    )),

    // Benchmark-contamination check: word-5-gram collision between the
    // training pool and a held-out eval slice (doc_id % 7 — stands in
    // for an external benchmark table). Eval grams are tiny relative to
    // the corpus and BROADCAST; the corpus side is one explode + one
    // equi-join + one aggregation — never an all-pairs comparison. The
    // decontamination step every serious pretraining pipeline runs.
    "t13_contamination" -> ((
      (s: SparkSession, d: String) => {
        val grams = docs(s, d)
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"), explode(expr(fiveGramsExpr)).as("g"))
        val evalGrams = grams.filter(col("doc_id") % 7 === 0)
          .select("g").distinct()
        // UNHINTED: a production eval set is a fixed benchmark suite
        // (AQE would broadcast it), but as simulated here it is a
        // 1/7 corpus fraction — data-growing, so the hint must not
        // pin it
        grams.filter(col("doc_id") % 7 =!= 0)
          .join(evalGrams, Seq("g"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_grams"))
      },
      Some(s"""WITH grams AS (
          SELECT doc_id,
                 unnest($fiveGramsSql) AS g
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0)
        SELECT doc_id, count(*) AS n_shared_grams
        FROM grams JOIN ev USING (g)
        WHERE doc_id % 7 <> 0
        GROUP BY doc_id""")
    )),

    // Corpus vocabulary: global top-50 tokens — explode + count + top-k,
    // the canonical heavy text aggregation (map-side partial counts,
    // one shuffle on token, bounded TakeOrdered at the end).
    "t5_top_tokens" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50),
      Some("""SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 50""")
    )),

    // Repetition ratio (compression-proxy quality signal): fraction of
    // duplicated word bigrams per document — high repetition flags
    // boilerplate/spam for corpus filtering.
    // (Delegates to the TextProfile library API — same expressions.)
    "t7_repetition" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.TextProfile.withRepetition(docs(s, d))
          .select("doc_id", "n_grams", "n_distinct", "rep_ratio"),
      Some("""SELECT doc_id, n_grams, n_distinct,
          round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 4) AS rep_ratio
        FROM (SELECT doc_id, len(grams) AS n_grams,
                len(list_distinct(grams)) AS n_distinct
          FROM (SELECT doc_id,
                  CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                       ELSE [array_to_string(w[i:i+1], ' ')
                             for i in range(1, len(w))] END AS grams
                FROM (SELECT doc_id, string_split(text, ' ') AS w
                      FROM documents)))""")
    )),

    // PII-style masking: redact digit runs, count redactions — the
    // narrow-map scrubbing pass every corpus goes through before
    // training. Output carries the redacted-text fingerprint so the
    // oracle verifies the actual rewritten content.
    "t8_redact" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d).select(
          col("doc_id"),
          regexp_count(col("text"), lit("[0-9]+")).cast("long")
            .as("n_redactions"),
          md5(regexp_replace(col("text"), "[0-9]+", "<num>"))
            .as("redacted_fp")),
      Some("""SELECT doc_id,
          len(regexp_extract_all(text, '[0-9]+')) AS n_redactions,
          md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS redacted_fp
        FROM documents""")
    )),

    // Weighted corpus mixing: down-sample each pool to its target rate
    // (75% of the "head" sources, 25% of the tail) by portable hash
    // bucket — the deterministic twin of weighted dataset interleaving:
    // membership is reproducible and the realized rate converges to the
    // target at any scale, with zero coordination between rows.
    "t10_weighted_mix" -> ((
      (s: SparkSession, d: String) => {
        // try_cast on BOTH engines: a source name outside src<N> must
        // fall to the 'tail' pool identically everywhere — a plain
        // cast of the empty non-match would THROW (Spark ANSI, DuckDB)
        // instead of producing a comparable result
        val pool = when(
          expr("try_cast(regexp_extract(source, '^src([0-9]+)$', 1) AS INT)")
            < 10,
          "head").otherwise("tail")
        val rate = when(col("pool") === "head", 75).otherwise(25)
        val bucket = pmod(saltedHash(4, col("doc_id").cast("string")), lit(100L))
        docs(s, d)
          .withColumn("pool", pool)
          .withColumn("selected", (bucket < rate).cast("int"))
          .groupBy("pool")
          // Realized rate in exact basis points (integer division) —
          // double division + round() is not hash-portable across
          // engines on ties.
          .agg(count(lit(1)).as("n_total"),
            sum("selected").as("n_selected"))
          .withColumn("rate_bp", expr("n_selected * 10000L div n_total"))
      },
      Some(s"""SELECT pool, count(*) AS n_total,
          CAST(sum(selected) AS BIGINT) AS n_selected,
          CAST(sum(selected) AS BIGINT) * 10000 // count(*) AS rate_bp
        FROM (
          SELECT pool,
                 CASE WHEN ${saltedHashSql(4, "doc_id::VARCHAR")} % 100 <
                           CASE WHEN pool = 'head' THEN 75 ELSE 25 END
                      THEN 1 ELSE 0 END AS selected
          FROM (SELECT doc_id,
                  CASE WHEN TRY_CAST(regexp_extract(source, '^src([0-9]+)$$', 1)
                            AS INTEGER) < 10
                       THEN 'head' ELSE 'tail' END AS pool
                FROM documents))
        GROUP BY pool""")
    )),

    // Heavy hitters: single-pass Misra-Gries frequent-items sketch
    // over (source, lang). The sketch's item SET is pass-order- and
    // engine-specific (false positives allowed), so it can't be
    // value-compared — but its GUARANTEE can: every value with support
    // > 10% must appear. The query therefore outputs the EXACT >10%
    // heavy hitters (computable in any engine) with an `in_sketch`
    // containment flag derived from the live Misra-Gries result; the
    // oracle computes the same exact rows and pins in_sketch TRUE. A
    // sketch that drops a true heavy hitter now flips the hash instead
    // of passing a rows-only count. FreqItemsSpec still pins the
    // containment property on adversarial inputs.
    "t9_freq_items" -> ((
      (s: SparkSession, d: String) => {
        val fi = docs(s, d).stat.freqItems(Array("source", "lang"), 0.1)
        val sketch = fi
          .select(explode(col("source_freqItems")).as("item"))
          .select(lit("source").as("col_name"), col("item"))
          .unionByName(
            fi.select(explode(col("lang_freqItems")).as("item"))
              .select(lit("lang").as("col_name"), col("item")))
        val n = docs(s, d).agg(count(lit(1)).as("__n"))
        def exactHot(c: String) = docs(s, d)
          .groupBy(col(c).as("item")).agg(count(lit(1)).as("cnt"))
          .select(lit(c).as("col_name"), col("item"), col("cnt"))
        // cnt*10 > n keeps the >10% support test in exact integers.
        // NULL items are excluded identically here and in the oracle:
        // the join on (col_name, item) is null-unsafe, so a NULL heavy
        // hitter could never match the sketch side and would flip
        // in_sketch to a spurious false.
        exactHot("source").unionByName(exactHot("lang"))
          .filter(col("item").isNotNull)
          .crossJoin(broadcast(n))
          .filter(col("cnt") * 10 > col("__n"))
          .join(broadcast(sketch).withColumn("in_sketch", lit(true)),
            Seq("col_name", "item"), "left")
          .select(col("col_name"), col("item"), col("cnt"),
            coalesce(col("in_sketch"), lit(false)).as("in_sketch"))
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM documents),
          hot AS (
            SELECT 'source' AS col_name, source AS item, count(*) AS cnt
            FROM documents GROUP BY source
            UNION ALL
            SELECT 'lang' AS col_name, lang AS item, count(*) AS cnt
            FROM documents GROUP BY lang)
        SELECT col_name, item, cnt, TRUE AS in_sketch
        FROM hot, n WHERE cnt * 10 > n.n AND item IS NOT NULL""")
    )),

    // Deterministic stratified sampling: per (lang, source) stratum,
    // keep the n docs with the smallest portable hash — a reproducible
    // "random" sample (hash order is uncorrelated with content) that
    // needs one shuffle on the stratum key and prunes with
    // WindowGroupLimit, unlike rand()-based sampleBy which changes
    // membership every run.
    // (Delegates to the Sampling library API — same expressions.)
    "t6_stratified_sample" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.Sampling
          .stratified(docs(s, d), Seq("lang", "source"))
          .select("lang", "source", "doc_id", "rk"),
      Some(s"""SELECT lang, source, doc_id, rk FROM (
          SELECT lang, source, doc_id,
                 row_number() OVER (PARTITION BY lang, source
                   ORDER BY ${saltedHashSql(3, "doc_id::VARCHAR")}, doc_id) AS rk
          FROM documents)
        WHERE rk <= 2""")
    )),

    // End-to-end corpus curation: quality gate → exact dedup (keep
    // canonical) → deterministic split → per-split stats. The chain a
    // training-data pipeline actually runs, as ONE declarative plan —
    // Catalyst fuses the narrow stages; the only shuffles are the
    // dedup group-by, the canonical join, and the final split rollup.
    "p1_corpus_pipeline" -> ((
      (s: SparkSession, d: String) => {
        val base = docs(s, d)
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .filter(col("n_tokens") >= 20)
          .withColumn("fp",
            md5(regexp_replace(lower(col("text")), "\\s+", " ")))
        val canon = base.groupBy("fp")
          .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
        val bucket = pmod(saltedHash(0, col("doc_id").cast("string")), lit(100L))
        canon.join(base.select("doc_id", "n_chars", "n_tokens"), Seq("doc_id"))
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test"))
          .groupBy("split")
          // total_tokens (exact BIGINT) instead of a rounded-double avg:
          // round(avg, 4) hash-diverges between engines on decimal ties.
          .agg(count(lit(1)).as("n_docs"),
            sum("n_dups").as("n_source_docs"),
            sum("n_chars").as("total_chars"),
            sum("n_tokens").as("total_tokens"))
      },
      Some(s"""WITH base AS (
          SELECT doc_id, n_chars,
                 len(string_split(text, ' ')) AS n_tokens,
                 md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
          FROM documents
          WHERE len(string_split(text, ' ')) >= 20),
        canon AS (
          SELECT fp, min(doc_id) AS doc_id, count(*) AS n_dups
          FROM base GROUP BY fp),
        split AS (
          SELECT c.doc_id, c.n_dups, b.n_chars, b.n_tokens,
                 CASE WHEN ${saltedHashSql(0, "c.doc_id::VARCHAR")} % 100 < 80 THEN 'train'
                      WHEN ${saltedHashSql(0, "c.doc_id::VARCHAR")} % 100 < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM canon c JOIN base b ON c.doc_id = b.doc_id)
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_dups) AS BIGINT) AS n_source_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM split GROUP BY split""")
    )),

    // Exact dedup: hash-group on normalized text, keep the canonical id.
    "d1_dedup_exact" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .withColumn("fp",
            md5(regexp_replace(lower(col("text")), "\\s+", " ")))
          .groupBy("fp")
          .agg(count(lit(1)).as("n_dups"), min("doc_id").as("canonical_id")),
      Some("""SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
          count(*) AS n_dups, min(doc_id) AS canonical_id
        FROM documents GROUP BY 1""")
    )),

    // n-gram Jaccard support: distinct-shingle profile per document —
    // explode + hash-aggregate (codegen'd) instead of per-row
    // array_distinct on a non-codegen higher-order function.
    "d2_shingle_profile" -> ((
      (s: SparkSession, d: String) =>
        docsSpread(s, d)
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"),
            size(expr(shinglesExpr)).cast("long").as("n_shingles"),
            size(array_distinct(col("w"))).cast("long")
              .as("n_unique_words")),
      Some(s"""SELECT doc_id, count(DISTINCT s) AS n_shingles,
          max(nuw) AS n_unique_words
        FROM (SELECT doc_id, len(list_distinct(w)) AS nuw,
                unnest($shinglesRawSql) AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
        GROUP BY doc_id""")
    )),

    // MinHash signatures (shingle → 4 salted min-hashes).
    "d3_minhash_signatures" -> ((
      minhashSignatures _,
      Some(minhashSql)
    )),

    // LSH: band the signature (2 bands × 2 hashes), bucket-join to get
    // candidate near-dup pairs without an O(n²) cross join.
    "d4_lsh_candidate_pairs" -> ((
      lshCandidatePairs _,
      Some(lshPairsSql)
    )),

    // MinHash→LSH→verify: exact shingle-set Jaccard for the candidate
    // pairs only — the verification stage that makes approximate dedup
    // trustworthy while staying O(candidates), not O(n²).
    "d7_lsh_verified_jaccard" -> ((
      (s: SparkSession, d: String) => verifiedJaccard(s, d),
      Some(verifiedJaccardSql)
    )),

    // Containment dedup: |A∩B| / min(|A|,|B|) over the verified
    // candidate pairs — catches the quote-expansion family (a short
    // doc embedded in a longer one) that symmetric Jaccard
    // under-scores: a 40-shingle doc fully contained in a 400-shingle
    // doc has Jaccard 0.1 but containment 1.0.
    "d10_containment" -> ((
      // reads the SHARED verified-Jaccard fixture (the same
      // intermediate the 0.2-threshold edge family cuts from) and
      // applies its own containment threshold live — one derivation
      // of the LSH→verify chain per corpus (round 19)
      (s: SparkSession, d: String) =>
        verifiedJaccardFixture(s, d)
          .withColumn("containment",
            round(col("n_inter") / least(col("n_a"), col("n_b"))
              .cast("double"), 6))
          .filter(col("containment") >= 0.5)
          .select("doc_a", "doc_b", "n_inter", "containment"),
      Some(s"""SELECT doc_a, doc_b, n_inter,
          round(CAST(n_inter AS DOUBLE) / least(n_a, n_b), 6) AS containment
        FROM ($verifiedJaccardSql)
        WHERE round(CAST(n_inter AS DOUBLE) / least(n_a, n_b), 6) >= 0.5""")
    )),

    // Pairs → clusters: connected components over the verified
    // near-dup edges (iterative min-label propagation, one shuffle per
    // round, diameter-bounded). Completes the dedup story: each
    // component keeps min(doc_id) as its canonical document. Oracle is
    // an independent recursive-CTE transitive closure in DuckDB.
    "d8_dedup_clusters" -> ((
      (s: SparkSession, d: String) => {
        val edges = nearDupEdgesFixture(s, d)
        graft.operators.ConnectedComponents.run(edges, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("component"))
      },
      Some(s"""WITH RECURSIVE d7 AS ($verifiedJaccardSql),
          e AS (SELECT doc_a AS a, doc_b AS b FROM d7 WHERE jaccard >= 0.2
                UNION
                SELECT doc_b AS a, doc_a AS b FROM d7 WHERE jaccard >= 0.2),
          reach(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach r JOIN e ON r.doc = e.a)
        SELECT doc AS doc_id, min(comp) AS component
        FROM reach GROUP BY doc""")
    )),

    // Canonical-doc selection per near-dup cluster — the step that
    // turns d8's clustering into an actual dedup POLICY: every doc is
    // labeled with its cluster (singletons are their own), and per
    // cluster exactly one canonical survives — the longest doc
    // (n_chars), doc_id as the total tiebreak. This is how production
    // corpus dedup retains "the best copy" rather than an arbitrary
    // one. Scale shape: d8's machinery unchanged (banded LSH →
    // verified edges → pointer-jumping CC, component table is
    // doc-sized), one doc-sized left join, and the size/argmax
    // windows partition by COMPONENT — cluster-sized partitions,
    // never a global sort.
    "d17_canonical_dedup" -> ((
      (s: SparkSession, d: String) => {
        val comp = nearDupComponentsFixture(s, d)
        val w = Window.partitionBy("component")
        docs(s, d).select(col("doc_id"), col("n_chars"))
          .join(comp, Seq("doc_id"), "left")
          .withColumn("component",
            coalesce(col("component"), col("doc_id")))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("rk", row_number().over(
            w.orderBy(col("n_chars").desc, col("doc_id"))))
          .select(col("doc_id"), col("component"), col("cluster_size"),
            (col("rk") === 1).as("keep"))
      },
      Some(s"""WITH RECURSIVE d7 AS ($verifiedJaccardSql),
          e AS (SELECT doc_a AS a, doc_b AS b FROM d7 WHERE jaccard >= 0.2
                UNION
                SELECT doc_b AS a, doc_a AS b FROM d7 WHERE jaccard >= 0.2),
          reach(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach r JOIN e ON r.doc = e.a),
          comp AS (
            SELECT doc AS doc_id, min(comp) AS component
            FROM reach GROUP BY doc),
          lab AS (
            SELECT d.doc_id,
                   coalesce(c.component, d.doc_id) AS component,
                   d.n_chars
            FROM documents d LEFT JOIN comp c USING (doc_id))
        SELECT doc_id, component,
               CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                 AS cluster_size,
               row_number() OVER (PARTITION BY component
                 ORDER BY n_chars DESC, doc_id) = 1 AS keep
        FROM lab""")
    )),

    // Dedup yield accounting — the dataset-card numbers every corpus
    // release reports: per source, docs and tokens before vs after
    // d17's canonical-dedup policy, and the retained-token ppm. One
    // definition of "keep" (d17's derivation, shared code) composed
    // with one narrow per-doc token count; the rollup is a map-side-
    // combinable 4-group aggregate. The oracle extends d17's SQL with
    // the same join — the two queries cannot drift onto different
    // retention decisions.
    "d18_dedup_yield" -> ((
      (s: SparkSession, d: String) => {
        val comp = nearDupComponentsFixture(s, d)
        val w = Window.partitionBy("component")
        val kept = docs(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .join(comp, Seq("doc_id"), "left")
          .withColumn("component",
            coalesce(col("component"), col("doc_id")))
          .withColumn("rk", row_number().over(
            w.orderBy(col("n_chars").desc, col("doc_id"))))
        kept.groupBy(col("source"))
          .agg(count(lit(1)).as("docs_total"),
            sum(when(col("rk") === 1, 1L).otherwise(0L)).as("docs_kept"),
            sum("toks").as("tokens_total"),
            sum(when(col("rk") === 1, col("toks")).otherwise(0L))
              .as("tokens_kept"))
          // ExactMath branch: multiply-first (exact) up to 9e12 kept
          // tokens, div-first only past it where truncation error is
          // sub-ppm (the 100 TB regime)
          .withColumn("kept_ppm",
            expr(ExactMath.ppmExpr("tokens_kept", "tokens_total")))
      },
      Some(s"""WITH RECURSIVE d7 AS ($verifiedJaccardSql),
          e AS (SELECT doc_a AS a, doc_b AS b FROM d7 WHERE jaccard >= 0.2
                UNION
                SELECT doc_b AS a, doc_a AS b FROM d7 WHERE jaccard >= 0.2),
          reach(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach r JOIN e ON r.doc = e.a),
          comp AS (
            SELECT doc AS doc_id, min(comp) AS component
            FROM reach GROUP BY doc),
          lab AS (
            SELECT d.doc_id, d.source, d.n_chars,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT)
                     AS toks,
                   coalesce(c.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp c USING (doc_id)),
          ranked AS (
            SELECT source, toks,
                   row_number() OVER (PARTITION BY component
                     ORDER BY n_chars DESC, doc_id) AS rk
            FROM lab)
        SELECT source,
               CAST(count(*) AS BIGINT) AS docs_total,
               CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_kept,
               CAST(sum(toks) AS BIGINT) AS tokens_total,
               CAST(sum(CASE WHEN rk = 1 THEN toks ELSE 0 END)
                 AS BIGINT) AS tokens_kept,
               CAST(${ExactMath.ppmSql(
                   "sum(CASE WHEN rk = 1 THEN toks ELSE 0 END)",
                   "sum(toks)")} AS BIGINT)
                 AS kept_ppm
        FROM ranked GROUP BY 1""")
    )),

    // Temperature-resampled source mixture — the α=0.5 sampling
    // weights multilingual/multi-source pretraining uses (XLM-R/mT5
    // style: p_i ∝ share_i^α) to up-weight small sources without
    // letting any one dominate: per source, weight = ⌊√tokens⌋, the
    // sampled share in ppm, the natural share in ppm, and the
    // resulting up/down-sampling factor in percent. All integer
    // except the √ — and floor(sqrt(double)) is engine-exact: IEEE
    // sqrt is correctly rounded in both JVM and DuckDB, and token
    // counts sit far below 2^52. Scale: ONE map-side-combinable
    // per-source aggregate over the corpus; everything after runs on
    // the SOURCE-sized table (a handful of rows at any corpus size)
    // with its totals re-aggregated and broadcast back.
    "t41_source_temperature" -> ((
      (s: SparkSession, d: String) => {
        val per = docs(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_toks"))
          .withColumn("w",
            expr("CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT)"))
        val tot = per.agg(sum("n_toks").as("tot_toks"),
          sum("w").as("tot_w"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_toks"),
            // w = ⌊√tokens⌋ stays ≤ ~5e6 at any real corpus, so w·1e6
            // fits; the RAW token share takes the ExactMath branch —
            // multiply-first (exact) up to the true int64 bound,
            // div-first only in the >9e12 regime where its truncation
            // error drops below one ppm unit
            expr("w * 1000000L div tot_w").as("sample_ppm"),
            expr(ExactMath.ppmExpr("n_toks", "tot_toks"))
              .as("natural_ppm"))
          .withColumn("upsample_pct",
            expr("sample_ppm * 100L div greatest(natural_ppm, 1L)"))
      },
      Some(s"""WITH per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                     AS n_toks
            FROM documents GROUP BY 1),
          w AS (
            SELECT source, n_docs, n_toks,
                   CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT)
                     AS w
            FROM per),
          tot AS (
            SELECT sum(n_toks) AS tot_toks, sum(w) AS tot_w FROM w)
        SELECT source, n_docs, n_toks,
               CAST(w * 1000000 // t.tot_w AS BIGINT) AS sample_ppm,
               CAST(${ExactMath.ppmSql("n_toks", "t.tot_toks")}
                 AS BIGINT) AS natural_ppm,
               CAST((w * 1000000 // t.tot_w) * 100
                 // greatest(${ExactMath.ppmSql("n_toks", "t.tot_toks")}, 1)
                 AS BIGINT) AS upsample_pct
        FROM w, tot t""")
    )),

    // Training-mixture allocation plan — the artifact a training run
    // actually consumes downstream of t41's temperature weights: a
    // token budget B = 2× the corpus, apportioned across sources
    // proportionally to weight w = ⌊√tokens⌋ with LARGEST-REMAINDER
    // rounding (Hamilton's method), so integer allocations sum to B
    // EXACTLY — no ±1 drift between engines, runs, or shard counts.
    // Overflow-safe exact quota at any scale: floor(B·w/W) =
    // (B div W)·w + ((B mod W)·w) div W (the direct B·w overflows
    // int64 at 100 TB token counts; the decomposition's largest
    // intermediate is (B mod W)·w < W·w). Remainder ties break to
    // source asc. Scale: ONE corpus aggregate; every subsequent step
    // — totals, remainders, the leftover-rank window — runs on the
    // SOURCE-sized table (bounded at any corpus size).
    "t42_mixture_plan" -> ((
      (s: SparkSession, d: String) => {
        val per = docs(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy(col("source"))
          .agg(sum("toks").as("n_toks"))
          .withColumn("w",
            expr("CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT)"))
        val tot = per.agg(sum("n_toks").as("tot_toks"),
          sum("w").as("wt"))
        val quotas = per.crossJoin(broadcast(tot))
          .withColumn("budget", col("tot_toks") * 2L)
          .withColumn("base",
            expr("(budget div wt) * w + ((budget % wt) * w) div wt"))
          .withColumn("rem", expr("((budget % wt) * w) % wt"))
        val wRank = Window.orderBy(col("rem").desc, col("source"))
        val wAll = Window.partitionBy(lit(1))
        quotas
          .withColumn("leftover",
            col("budget") - sum("base").over(wAll))
          .withColumn("rk", row_number().over(wRank))
          .withColumn("tokens_alloc",
            col("base") + when(col("rk") <= col("leftover"), 1L)
              .otherwise(0L))
          .select(col("source"), col("n_toks"), col("tokens_alloc"),
            expr("tokens_alloc * 100L div n_toks").as("epochs_pct"))
      },
      Some("""WITH per AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                     AS n_toks
            FROM documents GROUP BY 1),
          w AS (
            SELECT source, n_toks,
                   CAST(floor(sqrt(CAST(n_toks AS DOUBLE))) AS BIGINT)
                     AS w
            FROM per),
          tot AS (
            SELECT sum(n_toks) AS tot_toks, sum(w) AS wt FROM w),
          q AS (
            SELECT source, n_toks,
                   CAST((t.tot_toks * 2 // t.wt) * w
                      + ((t.tot_toks * 2 % t.wt) * w) // t.wt
                     AS BIGINT) AS base,
                   CAST(((t.tot_toks * 2 % t.wt) * w) % t.wt
                     AS BIGINT) AS rem,
                   CAST(t.tot_toks * 2 AS BIGINT) AS budget
            FROM w, tot t),
          r AS (
            SELECT source, n_toks, base, budget,
                   sum(base) OVER () AS base_sum,
                   row_number() OVER (ORDER BY rem DESC, source) AS rk
            FROM q)
        SELECT source, n_toks,
               CAST(base + CASE WHEN rk <= budget - base_sum
                 THEN 1 ELSE 0 END AS BIGINT) AS tokens_alloc,
               CAST((base + CASE WHEN rk <= budget - base_sum
                 THEN 1 ELSE 0 END) * 100 // n_toks AS BIGINT)
                 AS epochs_pct
        FROM r""")
    )),

    // Right-to-be-forgotten propagation — GDPR/CCPA deletion is a
    // first-class corpus operation, and it does NOT commute with
    // dedup: removing a doc can orphan its cluster's canonical (the
    // survivor set must re-elect) and can SPLIT a component when the
    // deleted doc was the bridge between two near-dup neighborhoods.
    // Per source: total docs, deleted (the delete list — doc_id ≡ 0
    // mod 97 as the deterministic stand-in), canonicals before,
    // canonicals among survivors after re-election, and promoted =
    // docs that became canonical only through the deletion. MinHash
    // signatures are per-doc, so the survivor edge set is EXACTLY the
    // full edge set with deleted endpoints anti-joined out — the
    // expensive LSH+verify machinery runs ONCE; only the (cheap,
    // edge-sized) CC re-runs on the filtered edges. 100 TB: two
    // equi-anti-joins on the delete list, the d8 pointer-jumping CC,
    // component-partitioned windows — no new shapes.
    "d19_deletion_propagation" -> ((
      (s: SparkSession, d: String) => {
        val base = docs(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("is_del", col("doc_id") % 97 === 0)
        val del = base.filter(col("is_del")).select("doc_id")
        // edges + before-side CC come from the shared dedup fixtures
        // (identical to d8/d17/d18's); only the post-deletion CC is
        // this query's own — it runs on the anti-joined edge set.
        val edges = nearDupEdgesFixture(s, d)
        def keepFlags(docsIn: DataFrame, comp: DataFrame, name: String) = {
          val w = Window.partitionBy("component")
            .orderBy(col("n_chars").desc, col("doc_id"))
          docsIn.join(comp, Seq("doc_id"), "left")
            .withColumn("component",
              coalesce(col("component"), col("doc_id")))
            .withColumn(name, row_number().over(w) === 1)
            .select(col("doc_id"), col(name))
        }
        val before = keepFlags(base, nearDupComponentsFixture(s, d),
          "keep_before")
        val edgesAfter = edges
          .join(del.withColumnRenamed("doc_id", "doc_a"),
            Seq("doc_a"), "left_anti")
          .join(del.withColumnRenamed("doc_id", "doc_b"),
            Seq("doc_b"), "left_anti")
        val compAfter = graft.operators.ConnectedComponents
          .run(edgesAfter, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("component"))
        val after = keepFlags(base.filter(!col("is_del")), compAfter,
          "keep_after")
        base
          .join(before, Seq("doc_id"))
          .join(after, Seq("doc_id"), "left")
          .withColumn("keep_after", coalesce(col("keep_after"),
            lit(false)))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("docs_total"),
            sum(when(col("is_del"), 1L).otherwise(0L)).as("deleted"),
            sum(when(col("keep_before"), 1L).otherwise(0L))
              .as("kept_before"),
            sum(when(col("keep_after"), 1L).otherwise(0L))
              .as("kept_after"),
            sum(when(col("keep_after") && !col("keep_before"), 1L)
              .otherwise(0L)).as("promoted"))
      },
      Some(s"""WITH RECURSIVE d7 AS ($verifiedJaccardSql),
          e AS (SELECT doc_a AS a, doc_b AS b FROM d7 WHERE jaccard >= 0.2
                UNION
                SELECT doc_b AS a, doc_a AS b FROM d7 WHERE jaccard >= 0.2),
          reach_b(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach_b r JOIN e ON r.doc = e.a),
          comp_b AS (
            SELECT doc AS doc_id, min(comp) AS component
            FROM reach_b GROUP BY doc),
          ea AS (SELECT a, b FROM e
                 WHERE a % 97 <> 0 AND b % 97 <> 0),
          reach_a(doc, comp) AS (
            SELECT a, a FROM ea
            UNION
            SELECT ea.b, r.comp FROM reach_a r JOIN ea ON r.doc = ea.a),
          comp_a AS (
            SELECT doc AS doc_id, min(comp) AS component
            FROM reach_a GROUP BY doc),
          lab_b AS (
            SELECT d.doc_id, d.source, d.doc_id % 97 = 0 AS is_del,
                   row_number() OVER (
                     PARTITION BY coalesce(c.component, d.doc_id)
                     ORDER BY d.n_chars DESC, d.doc_id) = 1
                     AS keep_before
            FROM documents d LEFT JOIN comp_b c USING (doc_id)),
          lab_a AS (
            SELECT d.doc_id,
                   row_number() OVER (
                     PARTITION BY coalesce(c.component, d.doc_id)
                     ORDER BY d.n_chars DESC, d.doc_id) = 1
                     AS keep_after
            FROM documents d LEFT JOIN comp_a c USING (doc_id)
            WHERE d.doc_id % 97 <> 0)
        SELECT b.source,
               CAST(count(*) AS BIGINT) AS docs_total,
               CAST(sum(CASE WHEN b.is_del THEN 1 ELSE 0 END)
                 AS BIGINT) AS deleted,
               CAST(sum(CASE WHEN b.keep_before THEN 1 ELSE 0 END)
                 AS BIGINT) AS kept_before,
               CAST(sum(CASE WHEN coalesce(a.keep_after, false)
                 THEN 1 ELSE 0 END) AS BIGINT) AS kept_after,
               CAST(sum(CASE WHEN coalesce(a.keep_after, false)
                 AND NOT b.keep_before THEN 1 ELSE 0 END) AS BIGINT)
                 AS promoted
        FROM lab_b b LEFT JOIN lab_a a USING (doc_id)
        GROUP BY 1""")
    )),

    // Per-source n-gram duplication profile — the corpus-health
    // number dataset cards report (Dolma/RefinedWeb style): of each
    // source's distinct-per-doc 5-grams, how many also appear in at
    // least one OTHER document (anywhere in the corpus), as an exact
    // ppm rate. High duplication predicts memorization risk and
    // flags boilerplate-heavy sources BEFORE dedup spends compute on
    // them. One definition of a 5-gram (fiveGramsExpr — shared with
    // t13/t16, so the profile can never disagree with contamination
    // about what a gram is). Scale: gram-keyed count aggregate (one
    // shuffle), gram⋈count equi-join back, per-source rollup.
    // dup_ppm takes the ExactMath branch (the q82 int64 lesson at the
    // TRUE overflow bound): multiply-first is exact for every shared
    // count ≤ 9e12 — which covers any total where truncation would
    // distort — and only past it falls to div-first, whose divisor
    // truncation is then < 1.2e-7 relative (sub-ppm). Both branches
    // engine-identical.
    "d21_duplication_profile" -> ((
      (s: SparkSession, d: String) => {
        val grams = docsSpread(s, d)
          .select(col("doc_id"), col("source"),
            split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("source"),
            explode(expr(fiveGramsExpr)).as("g"))
        val counts = grams.groupBy(col("g"))
          .agg(count(lit(1)).as("n_docs"))
        grams.join(counts, Seq("g"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("grams_total"),
            sum(when(col("n_docs") > 1L, 1L).otherwise(0L))
              .as("grams_shared"))
          .withColumn("dup_ppm",
            expr(ExactMath.ppmExpr("grams_shared", "grams_total")))
      },
      Some(s"""WITH grams AS (
            SELECT doc_id, source, g
            FROM (SELECT doc_id, source,
                    string_split(text, ' ') AS w FROM documents),
                 unnest($fiveGramsSql) AS t(g)),
          counts AS (
            SELECT g, count(*) AS n_docs FROM grams GROUP BY 1)
        SELECT gr.source,
               CAST(count(*) AS BIGINT) AS grams_total,
               CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS grams_shared,
               CAST(${ExactMath.ppmSql(
                   "sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END)",
                   "count(*)")} AS BIGINT)
                 AS dup_ppm
        FROM grams gr JOIN counts c ON gr.g = c.g
        GROUP BY 1""")
    )),

    // LSH band/row calibration sweep — the s23 pattern applied to d4
    // (the round-13 verdict item): the MinHash family ships a fixed
    // (2 bands × 2 rows) banding, but the bands/rows split is THE
    // recall-vs-candidate-volume dial every dedup operator tunes, so
    // sweep all three bandings of the 4-hash signature — (4,1) most
    // permissive, (2,2) shipped, (1,4) strictest — in ONE corpus
    // pass: the flat signature computes once, each config's band
    // rows are a tagged union (7 rows/doc total), candidates come
    // from one (cfg, band, bh) self-join, and exact-Jaccard
    // verification runs ONCE per distinct pair across configs (the
    // configs NEST — a (2,2) collision implies both (4,1) band
    // collisions — so the union is just (4,1)'s set, and counts are
    // provably monotone across the sweep). Output per config: exact
    // candidate count, verified-pair count at the d7 threshold, and
    // recall vs the union — all integers, so DuckDB replays the
    // whole sweep rather than pinning a contract. Scale shape: a
    // CALIBRATION harness like s17/s23 — at 100 TB it runs on a
    // sample; the per-config cost discipline is the same Σ|bucket|²
    // as d4, with the permissive (4,1) arm dominating, and the
    // shared verify arm is O(union candidates), never per-config.
    "d22_banding_sweep" -> ((
      (s: SparkSession, d: String) => {
        val flat = withMinhashSignature(docsSpread(s, d))
          .select("doc_id", "h0", "h1", "h2", "h3")
          .localCheckpoint(true)
        // ONE pass over the checkpointed signature table instead of a
        // 7-branch union (round 19: the union re-scanned `flat` once
        // per (cfg, band) arm — 7×32 map tasks feeding the candidate
        // join's exchange). Safe to explode here, unlike the
        // explodedBands caveat: the generator input is md5 over
        // CHECKPOINTED plain columns, so generator-input pruning has
        // no signature tree to re-inline. Identical rows.
        def bandEntry(cfg: String, band: Int, hs: Seq[String]) =
          struct(lit(cfg).as("cfg"), lit(band).as("band"),
            md5(concat_ws(",", hs.map(col): _*)).as("bh"))
        val rows = flat.select(col("doc_id"), explode(array(
            bandEntry("b4r1", 0, Seq("h0")),
            bandEntry("b4r1", 1, Seq("h1")),
            bandEntry("b4r1", 2, Seq("h2")),
            bandEntry("b4r1", 3, Seq("h3")),
            bandEntry("b2r2", 0, Seq("h0", "h1")),
            bandEntry("b2r2", 1, Seq("h2", "h3")),
            bandEntry("b1r4", 0, Seq("h0", "h1", "h2", "h3")))).as("e"))
          .select(col("doc_id"), col("e.cfg").as("cfg"),
            col("e.band").as("band"), col("e.bh").as("bh"))
        val cand = rows.as("a")
          .join(rows.as("b"), Seq("cfg", "band", "bh"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("cfg"), col("a.doc_id").as("doc_a"),
            col("b.doc_id").as("doc_b"))
          .distinct()
          .localCheckpoint(true)
        val ver = jaccardForPairsDf(docsSpread(s, d),
            cand.select("doc_a", "doc_b"))
          .filter(col("jaccard") >= 0.2)
          .select(col("doc_a"), col("doc_b"), lit(1L).as("__v"))
          .localCheckpoint(true)
        val vtot = ver.agg(count(lit(1)).as("v_total"))
        cand.join(ver, Seq("doc_a", "doc_b"), "left")
          .groupBy(col("cfg"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(coalesce(col("__v"), lit(0L))).as("n_verified"))
          .crossJoin(broadcast(vtot))
          .select(col("cfg"),
            when(col("cfg") === "b4r1", 4L)
              .when(col("cfg") === "b2r2", 2L).otherwise(1L)
              .as("n_bands"),
            when(col("cfg") === "b4r1", 1L)
              .when(col("cfg") === "b2r2", 2L).otherwise(4L)
              .as("n_rows"),
            col("n_candidates"), col("n_verified"),
            // verified-pair counts are corpus-level aggregates with no
            // structural cap (near-dup pair mass grows superlinearly
            // on dup-heavy corpora) — ExactMath branch, identical
            // below 9e12 so bundled hashes hold
            expr(ExactMath.ppmExpr(
              "n_verified", "greatest(v_total, 1L)")).as("recall_ppm"))
      },
      Some(s"""WITH sig AS ($minhashSql),
          bands AS (
            SELECT doc_id, 'b4r1' AS cfg, 0 AS band,
                   md5(h0::VARCHAR) AS bh FROM sig
            UNION ALL SELECT doc_id, 'b4r1', 1, md5(h1::VARCHAR) FROM sig
            UNION ALL SELECT doc_id, 'b4r1', 2, md5(h2::VARCHAR) FROM sig
            UNION ALL SELECT doc_id, 'b4r1', 3, md5(h3::VARCHAR) FROM sig
            UNION ALL SELECT doc_id, 'b2r2', 0,
                   md5(h0::VARCHAR || ',' || h1::VARCHAR) FROM sig
            UNION ALL SELECT doc_id, 'b2r2', 1,
                   md5(h2::VARCHAR || ',' || h3::VARCHAR) FROM sig
            UNION ALL SELECT doc_id, 'b1r4', 0,
                   md5(h0::VARCHAR || ',' || h1::VARCHAR || ',' ||
                       h2::VARCHAR || ',' || h3::VARCHAR) FROM sig),
          cand AS (
            SELECT DISTINCT x.cfg, x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x JOIN bands y
              ON x.cfg = y.cfg AND x.band = y.band AND x.bh = y.bh
             AND x.doc_id < y.doc_id),
          pairs AS (SELECT DISTINCT doc_a, doc_b FROM cand),
          sh AS (
            SELECT doc_id, unnest($shinglesSql) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents)),
          sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT p.doc_a, p.doc_b, count(*) AS n_inter
            FROM pairs p
            JOIN sh sa ON p.doc_a = sa.doc_id
            JOIN sh sb ON p.doc_b = sb.doc_id AND sa.s = sb.s
            GROUP BY 1, 2),
          ver AS (
            SELECT p.doc_a, p.doc_b
            FROM pairs p
            JOIN sizes a ON p.doc_a = a.doc_id
            JOIN sizes b ON p.doc_b = b.doc_id
            LEFT JOIN inter i
              ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
            WHERE round(COALESCE(i.n_inter, 0)
              / (a.n + b.n - COALESCE(i.n_inter, 0)), 6) >= 0.2),
          tot AS (SELECT count(*) AS vt FROM ver)
        SELECT c.cfg,
               CAST(CASE c.cfg WHEN 'b4r1' THEN 4 WHEN 'b2r2' THEN 2
                 ELSE 1 END AS BIGINT) AS n_bands,
               CAST(CASE c.cfg WHEN 'b4r1' THEN 1 WHEN 'b2r2' THEN 2
                 ELSE 4 END AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_verified,
               CAST(${ExactMath.ppmSql(
                   "sum(CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END)",
                   "greatest(any_value(t.vt), 1)")} AS BIGINT)
                 AS recall_ppm
        FROM cand c
        LEFT JOIN ver v ON c.doc_a = v.doc_a AND c.doc_b = v.doc_b
        CROSS JOIN tot t
        GROUP BY 1""")
    )),

    // Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    // SIGMOD 2003 — the MOSS algorithm): per sliding window of w=4
    // consecutive 5-gram hashes, select the RIGHTMOST minimal hash;
    // the selected set is a position-independent fingerprint with
    // guaranteed density ~2/(w+1) and the guarantee that any match of
    // length ≥ k+w-1 words shares at least one fingerprint. Pairs of
    // docs sharing ≥ 5 fingerprints are the plagiarism/overlap
    // candidates — the fingerprint-index shape every code/doc-overlap
    // service ships, complementing MinHash (d4: set resemblance) with
    // POSITIONAL substring evidence. Exactness: grams hash with the
    // portable salted hash; rightmost-min is min(struct(gh, −p)), an
    // order the oracle replays as max(p) over the window-min hash.
    // Scale: narrow per-doc maps, per-DOC-partitioned windows, the
    // fingerprint equi-join carries the same Σ|bucket|² discipline as
    // the LSH bands — density ~2/(w+1) keeps the fingerprint table at
    // ~29% of the gram table by construction.
    "d20_winnowing" -> ((
      (s: SparkSession, d: String) => {
        val grams = docsSpread(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 8) // ≥ 1 full window of 4 grams
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, size(w) - 4)," +
              " i -> concat_ws(' ', slice(w, i, 5)))"))
            .as(Seq("p", "g")))
          .select(col("doc_id"), col("p"),
            saltedHash(17, col("g")).as("gh"))
        val frame = Window.partitionBy("doc_id").orderBy("p")
          .rowsBetween(0, 3)
        val all = Window.partitionBy("doc_id")
        val fp = grams
          .withColumn("sel", min(struct(col("gh"),
            (-col("p")).as("np"))).over(frame))
          .withColumn("ng", count(lit(1)).over(all))
          .filter(col("p") <= col("ng") - 4) // full windows only
          .select(col("doc_id"), col("sel.gh").as("gh"))
          .distinct()
        fp.select(col("doc_id").as("doc_a"), col("gh"))
          .join(fp.select(col("doc_id").as("doc_b"), col("gh")),
            Seq("gh"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared_fp"))
          .filter(col("shared_fp") >= 5)
      },
      Some(s"""WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents
            WHERE len(string_split(text, ' ')) >= 8),
          grams AS (
            SELECT doc_id, i - 1 AS p,
                   ${saltedHashSql(17, "array_to_string(w[i:i+4], ' ')")}
                     AS gh
            FROM ws, unnest(range(1, len(w) - 3)) AS t(i)),
          ng AS (SELECT doc_id, count(*) AS g FROM grams GROUP BY 1),
          wm AS (
            SELECT doc_id, p, min(gh) OVER (
              PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
            FROM grams),
          sel AS (
            SELECT w.doc_id, w.p, max(g2.p) AS selp
            FROM wm w
            JOIN ng ON ng.doc_id = w.doc_id
            JOIN grams g2 ON g2.doc_id = w.doc_id
             AND g2.p BETWEEN w.p AND w.p + 3 AND g2.gh = w.m
            WHERE w.p <= ng.g - 4
            GROUP BY 1, 2),
          fp AS (
            SELECT DISTINCT s.doc_id, g.gh
            FROM sel s JOIN grams g
              ON g.doc_id = s.doc_id AND g.p = s.selp)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared_fp
        FROM fp a JOIN fp b ON a.gh = b.gh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 5""")
    )),
  ) ++ entriesTail

  /** Verified near-duplicate edges at a Jaccard threshold — the public
    * surface pipeline consumers (CorpusPipelineDemo) should cluster on,
    * rather than raw LSH candidates (which include false positives the
    * band collision produces).
    */
  def verifiedNearDupEdges(
      s: SparkSession, d: String, threshold: Double = 0.2): DataFrame =
    verifiedNearDupEdgesDf(docsSpread(s, d), threshold)

  /** Verified near-dup edges at the shared 0.2 threshold, persisted
    * once per (dir, documents fingerprint) per JVM — d8, d17, d18 and
    * d19 each consume the IDENTICAL edge table (a pure function of
    * the corpus), so one LSH→verify derivation legally serves all
    * four with every per-query hash unchanged (round-18 verdict item
    * 4: the four queries spent ~4× the chain's cost re-deriving it).
    * The annFixtures pattern, via [[FixtureStore]]; d7/d10, whose
    * headline OUTPUT is the verification table itself, keep their
    * live derivations.
    */
  /** The full verified-Jaccard table (doc_a, doc_b, n_inter, n_a,
    * n_b, jaccard) over the LSH candidates, persisted once per
    * (dir, documents fingerprint) per JVM — the intermediate BOTH
    * threshold consumers cut from: [[nearDupEdgesFixture]] (jaccard
    * ≥ 0.2 → d8/d17/d18/d19/t19) and d10 (containment ≥ 0.5). One
    * LSH→verify derivation instead of one per threshold family
    * (round 19). d7, whose headline OUTPUT is this table, keeps its
    * live derivation.
    */
  private[graft] def verifiedJaccardFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"vjaccard-$d-${FixtureStore.fingerprint(s, d, "documents")}") {
      out =>
        verifiedJaccardDf(docsSpread(s, d))
          .write.mode("overwrite").parquet(out)
    })

  private[graft] def nearDupEdgesFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"ndedges-$d-${FixtureStore.fingerprint(s, d, "documents")}") {
      out =>
        verifiedJaccardFixture(s, d)
          .filter(col("jaccard") >= 0.2)
          .select("doc_a", "doc_b")
          .write.mode("overwrite").parquet(out)
    })

  /** Connected components over [[nearDupEdgesFixture]] —
    * (doc_id, component), component = min reachable doc_id. Shared by
    * d17/d18 and d19's before-deletion side (identical CC on the
    * identical edges); d8, whose headline output IS the clustering,
    * keeps computing it live from the edge fixture.
    */
  /** Duplicated-window positions (doc_id, pos): every 8-token window
    * whose salted hash occurs ≥ 2 times corpus-wide, 1-based start
    * position — the shared intermediate of d14 (per-doc dup-window
    * COUNTS) and d15 (position COVER for token excision): one
    * windows pass + one global dup-key aggregate + one semi-join
    * instead of two of each (round 19). Each query's own headline —
    * d14's flagging rule, d15's cover/excision — stays live.
    */
  private[graft] def dupWindowPositionsFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"dupwin-$d-${FixtureStore.fingerprint(s, d, "documents")}") {
      out =>
        val wins = docsSpread(s, d).withColumn("w", split(col("text"), " "))
          .filter(size(col("w")) >= 8)
          .select(col("doc_id"), posexplode(expr(winTransformExpr)))
          .select(col("doc_id"), (col("pos") + 1).as("pos"),
            saltedHash(13, col("col")).as("wh"))
          .localCheckpoint(true)
        val dupKeys = wins.groupBy("wh")
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
          .select("wh")
        wins.join(dupKeys, Seq("wh"), "left_semi")
          .select("doc_id", "pos")
          .write.mode("overwrite").parquet(out)
    })

  private[graft] def nearDupComponentsFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"ndcomp-$d-${FixtureStore.fingerprint(s, d, "documents")}") {
      out =>
        graft.operators.ConnectedComponents
          .run(nearDupEdgesFixture(s, d), "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("component"))
          .write.mode("overwrite").parquet(out)
    })

  private[graft] def verifiedNearDupEdgesDf(
      docsDf: DataFrame, threshold: Double): DataFrame =
    verifiedJaccardDf(docsDf)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b")

  /** The candidate-gated shingle scan: only candidate docs' shingles
    * explode — a broadcast semi-join keeps verification O(candidate
    * docs), not O(corpus). Package-visible (un-checkpointed) so plan
    * guards can assert the gate survives refactors; verifiedJaccardDf
    * checkpoints it.
    */
  private[graft] def gatedShingleScan(
      s: SparkSession, d: String, cand: DataFrame): DataFrame =
    gatedShingleScanDf(docsSpread(s, d), cand)

  private[graft] def gatedShingleScanDf(
      docsDf: DataFrame, cand: DataFrame): DataFrame =
    docsDf
      .join(broadcast(cand), Seq("doc_id"), "left_semi")
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("s"))

  /** d7's DataFrame: exact Jaccard over the LSH candidate pairs —
    * shared by d7 (verification), d8 (clustering), and the NearDup
    * public API.
    */
  private def verifiedJaccard(s: SparkSession, d: String): DataFrame =
    verifiedJaccardDf(docsSpread(s, d))

  private[graft] def verifiedJaccardDf(docsDf: DataFrame): DataFrame =
    // localCheckpoint (eager), not persist(): blocks are released by
    // the ContextCleaner once the plan is GC'd, so repeated d7/d8/d10
    // invocations (bench loops) don't accumulate cached blocks for
    // the life of the session the way un-unpersisted cache entries do.
    jaccardForPairsDf(docsDf,
      lshCandidatePairsDf(docsDf).select("doc_a", "doc_b"))

  /** Exact shingle-set Jaccard for an ARBITRARY (doc_a, doc_b) pair
    * set — the d7 verification stage with the candidate source
    * factored out, so calibration harnesses (d22's banding sweep) can
    * verify the union of several candidate generators ONCE per pair.
    * Cost contract unchanged: only candidate docs' shingles explode
    * (broadcast semi-join gate), O(pairs + candidate docs).
    */
  private[graft] def jaccardForPairsDf(
      docsDf: DataFrame, pairsDf: DataFrame): DataFrame = {
        val pairs = pairsDf
          .select("doc_a", "doc_b").distinct().localCheckpoint(true)
        // Only candidate docs' shingles are needed: a broadcast
        // semi-join gates the explosion so verification work is
        // O(candidate docs), not O(corpus) — at scale the candidate
        // set is orders of magnitude smaller than the corpus. The
        // oracle computes the same values over all docs; rows for
        // non-candidates never reach the output either way.
        val cand = pairs.select(col("doc_a").as("doc_id"))
          .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
        // both sides of the intersection join and the size aggregate
        // read the exploded shingles — materialize once
        val sh = gatedShingleScanDf(docsDf, cand).localCheckpoint(true)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = pairs
          .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
          .join(sh.as("sb"),
            col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
        pairs
          .join(inter, Seq("doc_a", "doc_b"), "left")
          .na.fill(0, Seq("n_inter"))
          .join(sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n", "n_a"), Seq("doc_a"))
          .join(sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n", "n_b"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("n_inter"),
            col("n_a"), col("n_b"),
            round(col("n_inter") /
              (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
  }

  /** d7's independent DuckDB oracle — also embedded (as a CTE) in
    * d8's recursive-closure oracle.
    */
  private lazy val verifiedJaccardSql: String =
    s"""WITH pairs AS (
          SELECT DISTINCT doc_a, doc_b FROM ($lshPairsSql)),
        sh AS (
          SELECT doc_id, unnest($shinglesSql) AS s
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT p.doc_a, p.doc_b, count(*) AS n_inter
          FROM pairs p
          JOIN sh sa ON p.doc_a = sa.doc_id
          JOIN sh sb ON p.doc_b = sb.doc_id AND sa.s = sb.s
          GROUP BY p.doc_a, p.doc_b)
        SELECT p.doc_b, p.doc_a, COALESCE(i.n_inter, 0) AS n_inter,
               a.n AS n_a, b.n AS n_b,
               round(COALESCE(i.n_inter, 0)
                 / (a.n + b.n - COALESCE(i.n_inter, 0)), 6) AS jaccard
        FROM pairs p
        LEFT JOIN inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
        JOIN sizes a ON p.doc_a = a.doc_id
        JOIN sizes b ON p.doc_b = b.doc_id"""

  private lazy val entriesTail: Map[String, (Fn, Option[String])] = Map(

    // SimHash: 16-bit sign-aggregated fingerprint over word hashes.
    "d5_simhash" -> ((
      (s: SparkSession, d: String) => simhashFingerprints(s, d),
      Some(simhashSql)
    )),

    // SimHash near-dup retrieval: split the 16-bit fingerprint into 2
    // bands of 8 bits — by pigeonhole, any pair within Hamming
    // distance 1 agrees on at least one whole band — bucket-join on
    // (band, value), then verify bit_count(xor) <= 1. No O(n^2) pair
    // scan; same LSH-banding shape as d4, over bit-space. (This corpus
    // shares vocabulary heavily, so narrower bands would flood the
    // buckets; band width is the recall/candidate-volume dial.)
    "d9_simhash_neardup" -> ((
      (s: SparkSession, d: String) => {
        val fp = simhashFingerprints(s, d).localCheckpoint(true)
        val bands = (0 until 2).map { b =>
          fp.select(col("doc_id"), lit(b).as("band"),
            shiftright(col("simhash"), b * 8).bitwiseAND(0xff).as("bv"))
        }.reduce(_.unionByName(_))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(fp.select(col("doc_id").as("doc_a"), col("simhash").as("fa")),
            Seq("doc_a"))
          .join(fp.select(col("doc_id").as("doc_b"), col("simhash").as("fb")),
            Seq("doc_b"))
          .withColumn("hamming",
            bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
          .filter(col("hamming") <= 1)
          .select("doc_a", "doc_b", "hamming")
      },
      Some(s"""WITH fp AS ($simhashSql),
          bands AS (
            SELECT doc_id, b AS band, (simhash >> (b * 8)) & 255 AS bv
            FROM fp, range(2) t(b)),
          cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
        SELECT doc_a, doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM cand
        JOIN fp a ON doc_a = a.doc_id
        JOIN fp b ON doc_b = b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1""")
    )),

    // Document fingerprinting: weakened polynomial rolling hash —
    // token hashes weighted by a periodic power-of-B table mod P,
    // order-sensitive (unlike minhash) yet shuffle-free per document.
    "d6_rolling_fingerprint" -> ((
      (s: SparkSession, d: String) => {
        val B = 31L
        val powers = (0 until 16).scanLeft(1L)((acc, _) => acc * B % P).take(16)
        val powArray = array(powers.map(lit): _*)
        docs(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .select(col("doc_id"),
            pmod(pmod(saltedHash(9, col("tok")), lit(P))
              * element_at(powArray, pmod(col("pos"), lit(16)).cast("int") + 1),
              lit(P)).as("term"))
          .groupBy("doc_id")
          .agg(pmod(sum("term"), lit(P)).as("fingerprint"))
      },
      Some {
        val B = 31L
        val powers = (0 until 16).scanLeft(1L)((acc, _) => acc * B % P).take(16)
        s"""SELECT doc_id,
             sum((${saltedHashSql(9, "tok")} % $P)
                 * ([${powers.mkString(",")}])[pos % 16 + 1] % $P)::BIGINT % $P
               AS fingerprint
           FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
             FROM documents)
           GROUP BY doc_id"""
      }
    )),

    // Incremental ingest dedup: admit a NEW batch (doc_id % 4 = 0 —
    // the deterministic stand-in for "snapshot N+1") against the
    // EXISTING corpus (the other 75%) by MinHash-LSH band collision.
    // This is the production dedup shape at 100 TB: the accumulated
    // corpus is an INDEX (its banded signatures are already
    // materialized from previous ingests), and each new batch pays
    // one equi-join on (band, bucket-hash) against it — work scales
    // with the new batch plus its collisions, never with corpus².
    // Output is the admission decision per new doc: the earliest
    // colliding existing doc (dup_of) or admitted = 1.
    "d12_incremental_dedup" -> ((
      (s: SparkSession, d: String) => {
        // one signature pass feeds both the new and existing sides
        // (localCheckpoint, not persist — see lshCandidatePairsDf)
        val flat = bandedSignatureFlat(docsSpread(s, d)).localCheckpoint(true)
        val bands = explodedBands(flat)
        val isNew = isNewBatch
        val hits = bands.filter(isNew).as("n")
          .join(bands.filter(!isNewBatch).as("e"),
            Seq("band", "bh"))
          .groupBy(col("n.doc_id").as("doc_id"))
          .agg(min(col("e.doc_id")).as("dup_of"))
        docs(s, d).select("doc_id").filter(isNew)
          .join(hits, Seq("doc_id"), "left")
          .withColumn("admitted",
            when(col("dup_of").isNull, 1).otherwise(0))
      },
      Some(s"""WITH sig AS ($minhashSql),
          bands AS (
            SELECT doc_id, 0 AS band,
                   md5(h0::VARCHAR || ',' || h1::VARCHAR) AS bh FROM sig
            UNION ALL
            SELECT doc_id, 1 AS band,
                   md5(h2::VARCHAR || ',' || h3::VARCHAR) AS bh FROM sig),
          hits AS (
            SELECT n.doc_id, min(e.doc_id) AS dup_of
            FROM bands n JOIN bands e ON n.band = e.band AND n.bh = e.bh
            WHERE n.doc_id % 4 = 0 AND e.doc_id % 4 <> 0
            GROUP BY n.doc_id)
        SELECT d.doc_id, h.dup_of,
               CASE WHEN h.dup_of IS NULL THEN 1 ELSE 0 END AS admitted
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 4 = 0""")
    )),

    // Bloom ingest gate in front of d12's index join — the constant-
    // space pre-filter a trillion-doc ingest runs BEFORE touching the
    // corpus index: a Bloom filter over the corpus side's (band, bh)
    // bucket keys (built once, O(bits) driver memory, rides the probe
    // plan as a codegen reference) is probed per incoming band row
    // with the native bloom_might_contain expression; a doc whose
    // probes all miss is DEFINITELY not a candidate (Bloom filters
    // have no false negatives) and can skip the verification join
    // entirely. The contract output: is_candidate — the EXACT band-
    // collision flag, the same join d12 runs, which DuckDB reproduces
    // — plus gate_ok = (not a candidate) OR (the live bloom flagged
    // it), which the oracle pins TRUE: a bloom that drops a true
    // candidate (wrong key derivation, wrong hash width) flips the
    // hash. The false-positive side is pinned by BloomGateSpec (the
    // realized rate is not SQL-reproducible; the no-false-negative
    // side is, by construction).
    "d13_bloom_gate" -> ((
      (s: SparkSession, d: String) => {
        // one signature pass feeds the corpus keys, the probe rows,
        // and the exact side (localCheckpoint, same as d12)
        val flat = bandedSignatureFlat(docsSpread(s, d)).localCheckpoint(true)
        val bands = explodedBands(flat)
        // corpus/new-batch split: the single isNewBatch definition —
        // bloom, probe, and exact-candidate sides all derive from it
        val isNew = isNewBatch
        val isCorpus = !isNewBatch
        val keyed = bands.withColumn("k",
          concat_ws(":", col("band"), col("bh")))
        val gated = graft.operators.NearDup.bloomGate(
          keyed.filter(isCorpus),
          keyed.filter(isNew),
          keyCol = "k", expectedItems = 100000L, fpp = 0.03)
        val perDoc = gated.groupBy("doc_id")
          .agg(max(col("might_be_dup")).as("__bloom_hit"))
        val cand = bands.filter(isNew).as("n")
          .join(bands.filter(isCorpus).as("e"),
            Seq("band", "bh"), "left_semi")
          .select("doc_id").distinct()
          .withColumn("__cand", lit(true))
        perDoc.join(cand, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__cand"), lit(false)).as("is_candidate"),
            (!coalesce(col("__cand"), lit(false)) || col("__bloom_hit"))
              .as("gate_ok"))
      },
      Some(s"""WITH sig AS ($minhashSql),
          bands AS (
            SELECT doc_id, 0 AS band,
                   md5(h0::VARCHAR || ',' || h1::VARCHAR) AS bh FROM sig
            UNION ALL
            SELECT doc_id, 1 AS band,
                   md5(h2::VARCHAR || ',' || h3::VARCHAR) AS bh FROM sig),
          cand AS (
            SELECT DISTINCT n.doc_id
            FROM bands n JOIN bands e ON n.band = e.band AND n.bh = e.bh
            WHERE n.doc_id % 4 = 0 AND e.doc_id % 4 <> 0)
        SELECT d.doc_id,
               (c.doc_id IS NOT NULL) AS is_candidate,
               TRUE AS gate_ok
        FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) d
        LEFT JOIN cand c ON d.doc_id = c.doc_id""")
    )),

    // Exact-SUBSTRING dedup (the Lee et al. "Deduplicating Training
    // Data Makes Language Models Better" method): a fixed-width token
    // window (8 words) duplicated ANYWHERE in the corpus — other docs
    // or a repeat within the same doc — marks its position, and a doc
    // whose duplicated-window coverage reaches 20% is flagged for
    // removal. This is the dedup family member the doc-level methods
    // (d1 exact, d4/d7 MinHash, d5 SimHash, d10/d11) cannot express:
    // boilerplate headers/footers and quoted passages duplicate
    // SUBSTRINGS of otherwise-unique documents.
    //
    // Shape at scale: one tokenize pass produces ~token-count window
    // rows carrying only (doc_id, 60-bit window hash) — 16 bytes per
    // row into TWO map-side-combinable hash aggregates (global window
    // counts; per-doc duplicated-position counts) and one left-semi
    // equi-join on the hash. No sorts, no all-pairs; the windows pass
    // is localCheckpoint'd so both consumers share one scan (d12's
    // pattern). Coverage compares as integer cross-multiplication
    // (dup*5 >= n), not division.
    "d14_substring_dedup" -> ((
      (s: SparkSession, d: String) => {
        val base = docs(s, d).withColumn("w", split(col("text"), " "))
        // dup-window COUNT per doc off the shared positions fixture
        // (count ignores the position — identical to the former
        // explode-without-pos derivation)
        val dup = dupWindowPositionsFixture(s, d)
          .groupBy("doc_id").agg(count(lit(1)).as("dup_windows"))
        base
          .select(col("doc_id"),
            greatest(size(col("w")) - 7, lit(0)).cast("long")
              .as("n_windows"))
          .join(dup, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_windows"),
            coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
          .withColumn("flagged",
            col("n_windows") > 0 &&
              col("dup_windows") * 5 >= col("n_windows"))
      },
      Some(s"""WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          wins AS (
            SELECT doc_id,
                   unnest([$winHashSql
                           for i in range(1, len(w) - 6)]) AS wh
            FROM base WHERE len(w) >= 8),
          dupkeys AS (
            SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
          dup AS (
            SELECT doc_id, count(*) AS dup_windows
            FROM wins WHERE wh IN (SELECT wh FROM dupkeys)
            GROUP BY doc_id)
        SELECT b.doc_id,
               greatest(len(b.w) - 7, 0)::BIGINT AS n_windows,
               coalesce(d.dup_windows, 0)::BIGINT AS dup_windows,
               (len(b.w) >= 8 AND
                coalesce(d.dup_windows, 0) * 5 >= len(b.w) - 7) AS flagged
        FROM base b LEFT JOIN dup d USING (doc_id)""")
    )),

    // PREFIX-FILTERING similarity join (the PPJoin/AllPairs family):
    // the EXACT Jaccard-threshold join — every pair with 3-shingle
    // Jaccard ≥ 0.9, no false negatives BY CONSTRUCTION, unlike the
    // probabilistic-recall LSH paths (d4/d7/s7). Same shingle
    // universe as the minhash family (shinglesExpr — one definition
    // per shingle semantics); SHINGLES, not word tokens, because the
    // filter only prunes when rarity means something: this corpus has
    // a 31-word vocabulary (every word is everywhere → 3.7M word-
    // level candidates at sf0.1) but 27k distinct shingles (→ 9k
    // candidates for 249 true pairs). The filter: order each doc's
    // shingles by global rarity (df, shingle — an engine-independent
    // total order), keep the first |d| − ⌈0.9|d|⌉ + 1 as the PREFIX,
    // equi-join prefixes with the length bound 9·max(|a|,|b|) ≤
    // 10·min: two docs at Jaccard ≥ τ must share ≥ ⌈τ|d|⌉ shingles
    // and can't differ in size by more than τ, so missing each
    // other's prefix entirely is impossible — candidates provably ⊇
    // true pairs, and the exact verify (array_intersect on the two
    // sorted shingle sets, one row per pair — never a per-token
    // shuffle) makes pruning invisible to the result. The oracle is
    // the BRUTE-FORCE all-shared-shingle join at the same threshold,
    // so the hash pins losslessness — an off-by-one prefix drops a
    // pair and flips it. Integer jaccard_ppm throughout.
    "d16_prefix_filter_join" -> ((
      (s: SparkSession, d: String) => {
        // materialized once (round 19): the shingle derivation
        // (split → transform → distinct → sort per doc) otherwise
        // re-evaluates FOUR times in one plan — under both prefix
        // self-join sides and both verify fetch sides (measured
        // 4 × ~2.4 s racing single-chain jobs at sf0.1)
        val sets = docsSpread(s, d).filter(col("text").isNotNull)
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"), expr(shinglesExpr).as("sh"))
          .select(col("doc_id"), array_sort(col("sh")).as("sh"),
            size(col("sh")).cast("long").as("nt"))
          .localCheckpoint(true)
        val tok = sets.select(col("doc_id"), col("nt"),
          explode(col("sh")).as("w"))
        val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
        val wPos = Window.partitionBy("doc_id")
          .orderBy(col("df"), col("w"))
        // the prefix table joins itself — checkpointed so the
        // tok⋈dfreq window chain runs once, not once per side
        val prefix = tok.join(dfreq, Seq("w"))
          .withColumn("pos", row_number().over(wPos))
          .filter(col("pos") <= expr("nt - (9L * nt + 9L) div 10 + 1"))
          .select(col("doc_id"), col("w"), col("nt"))
          .localCheckpoint(true)
        val cands = prefix.as("a")
          .join(prefix.as("b"),
            col("a.w") === col("b.w")
              && col("a.doc_id") < col("b.doc_id")
              && expr("9L * greatest(a.nt, b.nt) <= 10L * least(a.nt, b.nt)"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()
        cands
          .join(sets.select(col("doc_id").as("da"), col("sh").as("sha"),
            col("nt").as("na")), Seq("da"))
          .join(sets.select(col("doc_id").as("db"), col("sh").as("shb"),
            col("nt").as("nb")), Seq("db"))
          .withColumn("overlap",
            size(array_intersect(col("sha"), col("shb"))).cast("long"))
          // raw ppm retained: `overlap` is one PAIR's shingle
          // intersection, bounded by the smaller document's shingle
          // count (~1e6) — never a corpus-level sum
          .withColumn("jaccard_ppm",
            expr("overlap * 1000000L div (na + nb - overlap)"))
          .filter(col("jaccard_ppm") >= 900000L)
          .select(col("da"), col("db"), col("overlap"), col("jaccard_ppm"))
      },
      Some(s"""WITH sets AS (
            SELECT doc_id, $shinglesSql AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents WHERE text IS NOT NULL)),
          tok AS (SELECT doc_id, unnest(sh) AS w FROM sets),
          n AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS nt FROM sets),
          ov AS (
            SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS overlap
            FROM tok a JOIN tok b
              ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT da, db, overlap,
               CAST(overlap * 1000000 // (na.nt + nb.nt - overlap)
                 AS BIGINT) AS jaccard_ppm
        FROM ov JOIN n na ON na.doc_id = ov.da
                JOIN n nb ON nb.doc_id = ov.db
        WHERE overlap * 1000000 // (na.nt + nb.nt - overlap) >= 900000""")
    )),

    // d14's OUTPUT stage — the full Lee et al. pipeline rewrites the
    // corpus rather than dropping whole docs: every token covered by
    // at least one duplicated 8-token window is removed and the doc
    // re-assembled (boilerplate excised, unique prose kept). Same
    // windows pass and global dup-key aggregate as d14 (one
    // definition: winTransformExpr / winHashSql); the extra work is
    // per-doc and array-local — duplicated POSITIONS collect per doc
    // (bounded by doc length, not corpus size), expand to a covered-
    // index set with one higher-order flatten, and an index-aware
    // filter keeps the uncovered tokens. No extra shuffles beyond
    // d14's two aggregates + semi-join, one broadcast-sized join back
    // to the corpus scan; cleaned text is hash-compared against the
    // oracle byte-for-byte.
    "d15_substring_removal" -> ((
      (s: SparkSession, d: String) => {
        val base = docs(s, d).withColumn("w", split(col("text"), " "))
        // position COVER per doc off the shared fixture — the list is
        // consumed order-insensitively (distinct-flatten then
        // array_contains), so collect_list's order is immaterial
        val dupPos = dupWindowPositionsFixture(s, d)
          .groupBy("doc_id").agg(collect_list(col("pos")).as("ps"))
        base.join(dupPos, Seq("doc_id"), "left")
          .withColumn("ps",
            coalesce(col("ps"), array().cast("array<int>")))
          .withColumn("covered", expr(
            "array_distinct(flatten(transform(ps, p -> sequence(p, p + 7))))"))
          .withColumn("kept", expr(
            "filter(w, (t, i) -> NOT array_contains(covered, i + 1))"))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_tokens"),
            (size(col("w")) - size(col("kept"))).cast("long")
              .as("n_removed"),
            array_join(col("kept"), " ").as("cleaned_text"))
      },
      Some(s"""WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          wins AS (
            SELECT doc_id,
                   unnest(range(1, len(w) - 6)) AS pos,
                   unnest([$winHashSql
                           for i in range(1, len(w) - 6)]) AS wh
            FROM base WHERE len(w) >= 8),
          dupkeys AS (
            SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
          dpos AS (
            SELECT doc_id, list(pos) AS ps
            FROM wins WHERE wh IN (SELECT wh FROM dupkeys)
            GROUP BY doc_id),
          cov AS (
            SELECT b.doc_id, b.w,
                   list_distinct(flatten(
                     [range(p, p + 8) for p in coalesce(d.ps, [])]))
                     AS covered
            FROM base b LEFT JOIN dpos d USING (doc_id))
        SELECT doc_id, len(w)::BIGINT AS n_tokens,
               (len(w) - len(kept))::BIGINT AS n_removed,
               -- array_to_string([]) is NULL in DuckDB, '' in Spark's
               -- array_join; a fully-excised doc must compare as ''
               coalesce(array_to_string(kept, ' '), '') AS cleaned_text
        FROM (SELECT doc_id, w,
                [w[i] for i in range(1, len(w) + 1)
                 if NOT list_contains(covered, i)] AS kept
              FROM cov)""")
    )),

    // Leakage-safe split: train/val/test assignment by NEAR-DUP
    // CLUSTER, not by document — a per-doc split (t4) lets two
    // near-identical documents land in train and test, silently
    // inflating eval scores; splitting on the connected component's
    // canonical id keeps every duplicate family on one side. Docs in
    // no cluster are their own singleton group. Assignment stays the
    // portable salted-hash bucket (8/1/1).
    "t19_leakage_safe_split" -> ((
      (s: SparkSession, d: String) => {
        // the SAME (edges@0.2 → min-label CC) derivation d17/d18/d19
        // read — one shared fixture instead of a fourth full
        // LSH→verify→CC chain (round 19; t19's headline computation —
        // the grouped split assignment and its rollup — stays live)
        val comp = nearDupComponentsFixture(s, d)
        val grouped = docs(s, d).select("doc_id")
          .join(comp, Seq("doc_id"), "left")
          .withColumn("grp", coalesce(col("component"), col("doc_id")))
        val bucket = pmod(saltedHash(11, col("grp").cast("string")), lit(10L))
        grouped
          .withColumn("split",
            when(bucket < 8, "train").when(bucket < 9, "val")
              .otherwise("test"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("grp")).as("n_groups"))
      },
      Some(s"""WITH RECURSIVE d7 AS ($verifiedJaccardSql),
          e AS (SELECT doc_a AS a, doc_b AS b FROM d7 WHERE jaccard >= 0.2
                UNION
                SELECT doc_b AS a, doc_a AS b FROM d7 WHERE jaccard >= 0.2),
          reach(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach r JOIN e ON r.doc = e.a),
          comp AS (
            SELECT doc AS doc_id, min(comp) AS component
            FROM reach GROUP BY doc),
          grouped AS (
            SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS grp
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
        SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               count(DISTINCT grp) AS n_groups
        FROM (SELECT grp, ${saltedHashSql(11, "grp::VARCHAR")} % 10 AS b
              FROM grouped)
        GROUP BY 1""")
    )),

    // Temperature-scaled domain mixing: per-source sampling weights
    // ∝ n^(1/2) (α=0.5 — the standard upsample-the-tail mixture for
    // pretraining corpora) and the resulting document allocation for
    // a 100k-doc budget. All integer: sqrt is correctly-rounded IEEE
    // on both engines, quantized by floor(·*1e6) before any
    // cross-domain arithmetic, so weights are engine-exact. The
    // cross-domain total is a window over the DOMAIN table (bounded
    // cardinality — fine at any corpus scale).
    "t18_domain_mix" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        docs(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("q",
            expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)"))
          .withColumn("total_q", sum("q").over(w))
          .select(col("source"), col("n_docs"), col("q"),
            // raw ppm retained: q = ⌊√n_docs⌋·1e6 ≤ 9e12 for any
            // corpus under 8.1e13 docs (the sqrt is the cap); the
            // nested site multiplies a ≤1e6 ppm by 1e5 — ≤1e11
            expr("q * 1000000L div total_q").as("weight_ppm"),
            expr("(q * 1000000L div total_q) * 100000L div 1000000L")
              .as("alloc_100k"))
      },
      Some("""WITH dom AS (
          SELECT source, count(*) AS n_docs,
                 CAST(floor(sqrt(count(*)::DOUBLE) * 1000000) AS BIGINT) AS q
          FROM documents GROUP BY source),
        tot AS (
          SELECT source, n_docs, q,
                 CAST(sum(q) OVER () AS BIGINT) AS total_q
          FROM dom)
        SELECT source, n_docs, q,
               q * 1000000 // total_q AS weight_ppm,
               (q * 1000000 // total_q) * 100000 // 1000000 AS alloc_100k
        FROM tot""")
    )),

    // Length bucketing for batch-efficient training/inference: group
    // docs into power-of-two length buckets (floor(log2 n_chars) —
    // computed INTEGER-exactly as length(bin(n))-1; a float log2
    // rounds 2^k down a bucket in one engine and not the other) and
    // account the padding waste of batching each bucket to its max:
    // waste = n·max − Σlen, all in one hash aggregate. The narrow-map
    // bucket key means NO global sort — the quantile (ntile) version
    // of this op needs a total order over the corpus, which is the
    // wrong plan at 100 TB; log buckets bound per-batch waste
    // (< 2× min length) with a plain groupBy.
    "t20_length_buckets" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d).filter(col("n_chars") > 0)
          .withColumn("bucket",
            (length(bin(col("n_chars"))) - 1).cast("long"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"),
            (max(col("n_chars")) * count(lit(1)) - sum(col("n_chars")))
              .as("pad_waste")),
      Some("""SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
            count(*) AS n_docs,
            min(n_chars) AS min_chars,
            max(n_chars) AS max_chars,
            CAST(max(n_chars) * count(*) - sum(n_chars) AS BIGINT)
              AS pad_waste
        FROM documents WHERE n_chars > 0 GROUP BY 1""")
    )),

    // Self-trained bigram-LM predictability — the CCNet/KenLM
    // LM-quality-filter slot, reduced to engine-portable arithmetic.
    // The LM is trained ON the corpus itself: bigram counts c12 and
    // left-position unigram counts c1 (c1 = Σ_w2 c12, so p = c12/c1 is
    // a proper conditional MLE — no smoothing needed when scoring the
    // training corpus, every bigram has c12 ≥ 1). Each document scores
    // pred_q = Σ floor(c12·1e6 / c1) over its bigram OCCURRENCES: high
    // = templated/predictable text the LM expects, low = novel prose —
    // the conditional-probability complement of t16's doc-frequency
    // novelty. True perplexity is a monotone transform (−avg log p) of
    // the same sufficient statistics; it is deliberately NOT emitted:
    // IEEE 754 guarantees correct rounding only for +,−,·,/,sqrt, so a
    // Σ floor(ln ...) could flip an integer between engines' libm,
    // while c12·1e6 (exact in double, far below 2^53) followed by one
    // correctly-rounded division is bit-identical by construction.
    // Scale shape: two map-side-combinable gram aggregates, one
    // equi-join of doc bigrams onto the (distinct-gram-sized) count
    // tables, one per-doc aggregate — no cross-doc pair work anywhere.
    // Single-token docs have no bigrams and drop out on both sides.
    "t22_bigram_lm" -> ((
      (s: SparkSession, d: String) =>
        bigramDocStats(s, d).select("doc_id", "n_bigrams", "pred_q"),
      Some(s"""$bigramStatsSqlPrefix
        SELECT doc_id, n_bigrams, pred_q FROM stats""")
    )),

    // CCNet-style LM-quality bucketing (Wenzek et al. 2020): split the
    // corpus into head/middle/tail by PER-LANGUAGE perplexity terciles
    // — the curation step that follows t22's LM scoring (CCNet trains
    // a KenLM per language and buckets each language by its own
    // perplexity distribution precisely because a global cut would
    // call all low-resource-language text "tail"). Here high mean
    // predictability mean_ppm = pred_q div n_bigrams ≡ low perplexity
    // ≡ head. The tercile cuts are exact per-lang ORDER STATISTICS
    // (t21/t24 rank pattern — conditional min at ranks ceil(n/3) and
    // ceil(2n/3), never an interpolated percentile), so the bucket
    // boundary can't flip on a last-ulp engine difference. The cut
    // derivation RIDES the same bigramDocStats/`stats` definition as
    // t22 in both engines — the score being bucketed can never drift
    // from the score t22 reports. Scale shape: t22's shape plus one
    // per-lang rank window (shardable) and a lang-cardinality
    // broadcast join-back; swap the window for the mergeable KLL path
    // (q52) when exact cuts stop being worth the per-lang sort.
    "t26_lm_buckets" -> ((
      (s: SparkSession, d: String) => {
        val scored = bigramDocStats(s, d)
          .withColumn("mean_ppm", expr("pred_q div n_bigrams"))
        val wRank = Window.partitionBy("lang")
          .orderBy(col("mean_ppm"), col("doc_id"))
        val wLang = Window.partitionBy("lang")
        val thr = scored
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wLang))
          .groupBy("lang")
          .agg(
            min(when(col("rn") === expr("(n + 2L) div 3"),
              col("mean_ppm"))).as("c33"),
            min(when(col("rn") === expr("(2L * n + 2L) div 3"),
              col("mean_ppm"))).as("c67"))
        scored.join(broadcast(thr), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("mean_ppm"),
            col("c33"), col("c67"),
            when(col("mean_ppm") >= col("c67"), "head")
              .when(col("mean_ppm") >= col("c33"), "middle")
              .otherwise("tail").as("bucket"))
      },
      Some(s"""$bigramStatsSqlPrefix,
          r AS (
            SELECT doc_id, lang,
                   CAST(pred_q // n_bigrams AS BIGINT) AS mean_ppm
            FROM stats),
          rk AS (
            SELECT *, row_number() OVER (PARTITION BY lang
                        ORDER BY mean_ppm, doc_id) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM r),
          thr AS (
            SELECT lang,
                   min(CASE WHEN rn = (n + 2) // 3 THEN mean_ppm END) AS c33,
                   min(CASE WHEN rn = (2 * n + 2) // 3 THEN mean_ppm END)
                     AS c67
            FROM rk GROUP BY lang)
        SELECT r.doc_id, r.lang, r.mean_ppm, t.c33, t.c67,
               CASE WHEN r.mean_ppm >= t.c67 THEN 'head'
                    WHEN r.mean_ppm >= t.c33 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM r JOIN thr t USING (lang)""")
    )),

    // BM25 top-k retrieval — the lexical-relevance ranker (Robertson &
    // Zaragoza 2009) every RAG/curation stack runs beside the vector
    // path (s1/s5). Scored entirely in EXACT int64 arithmetic: the
    // standard k1=1.2, b=0.75 term saturation
    //   tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    // is cleared of floats by multiplying through by 10·L (avgdl=L/N):
    //   tf_q = 22·tf·L·1e6 div (10·L·tf + 3·L + 9·dl·N)
    // and the idf's log argument (N−df+½)/(df+½) — a monotone idf
    // surrogate, doubled to stay integral —
    //   idf_q = (2·(N−df)+1)·1e6 div (2·df+1);
    // term score = idf_q·tf_q, summed per doc. All products stay far
    // under 2^63 at any bundled sf (~2e16 worst case); a 100 TB corpus
    // re-scales the two 1e6 quantizers before L·1e6 approaches 2^63.
    // Plan shape: tf filters to the query terms BEFORE its aggregate
    // (the doc-term table never materializes for non-query tokens), df
    // and the (N, L) scalars broadcast, and the global top-25 compiles
    // to TakeOrderedAndProject — per-partition partial top-k merged on
    // the driver, never a full sort. Ties broken by doc_id.
    "t25_bm25_topk" -> ((
      // (Delegates to the operators.Bm25 library API — same
      // expressions, same plan.)
      (s: SparkSession, d: String) =>
        graft.operators.Bm25
          .topK(docs(s, d), Seq("spark", "vector", "stream"), k = 25)
          .select("doc_id", "dl", "n_hit", "bm25_q"),
      Some("""WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
            FROM documents),
          corpus AS (
            SELECT count(*) AS n_docs, sum(dl) AS l_total FROM base),
          tf AS (
            SELECT doc_id, dl, tok, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(w) AS tok FROM base)
            WHERE tok IN ('spark', 'vector', 'stream')
            GROUP BY doc_id, dl, tok),
          dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
          scored AS (
            SELECT t.doc_id, t.dl, count(*) AS n_hit,
                   CAST(sum(
                     ((2 * (c.n_docs - f.df) + 1) * 1000000
                        // (2 * f.df + 1))
                     * (22 * t.tf * c.l_total * 1000000
                        // (10 * c.l_total * t.tf + 3 * c.l_total
                           + 9 * t.dl * c.n_docs))) AS BIGINT) AS bm25_q
            FROM tf t JOIN dfreq f USING (tok), corpus c
            GROUP BY t.doc_id, t.dl)
        SELECT doc_id, dl, n_hit, bm25_q
        FROM scored ORDER BY bm25_q DESC, doc_id LIMIT 25""")
    )),

    // Vocabulary-richness audit per source: type-token ratio and
    // hapax-legomena share — the lexical-diversity fingerprint that
    // separates natural prose (rich tail of once-used words) from
    // generated/templated text (vocabulary saturates, hapax share
    // collapses). Exact integers: token occurrences, distinct types,
    // hapax count (types occurring exactly once IN that source),
    // ttr_ppm = types·1e6 div tokens, hapax_ppm = hapax·1e6 div
    // types. Scale shape: one (source, token) count aggregate
    // (map-side combined), one per-source rollup — both keyed, no
    // distinct-driven second scan.
    "t30_vocab_richness" -> ((
      (s: SparkSession, d: String) => {
        val tc = docs(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok")
          .agg(count(lit(1)).as("c"))
        tc.groupBy("source")
          .agg(sum("c").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            col("n_hapax"),
            // per-source type/hapax counts are corpus-level with no
            // structural cap (all-unique pathology makes n_types
            // approach n_tokens, past 9e12 at 100 TB) — ExactMath
            // branch, identical below the bound
            expr(ExactMath.ppmExpr("n_types", "n_tokens")).as("ttr_ppm"),
            expr(ExactMath.ppmExpr("n_hapax", "n_types")).as("hapax_ppm"))
      },
      Some(s"""WITH tc AS (
            SELECT source, tok, count(*) AS c
            FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            GROUP BY 1, 2),
          agg AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hapax
            FROM tc GROUP BY source)
        SELECT source, n_tokens, n_types, n_hapax,
               CAST(${ExactMath.ppmSql("n_types", "n_tokens")}
                 AS BIGINT) AS ttr_ppm,
               CAST(${ExactMath.ppmSql("n_hapax", "n_types")}
                 AS BIGINT) AS hapax_ppm
        FROM agg""")
    )),

    // Cross-source contamination MATRIX: for every source pair, how
    // many distinct 5-grams they share, with both vocabulary sizes
    // and the Jaccard overlap in exact ppm — the corpus-level
    // "which sources copy which" audit (t13 checks docs against ONE
    // eval set; this is the all-pairs source view that drives dedup
    // priority and eval-set placement decisions). Rides the shared
    // fiveGrams definition (t13/t16) so the three queries can never
    // disagree on what a 5-gram is. Scale shape: one distinct
    // (source, gram) aggregate, a self-equi-join ON GRAM (fan-out =
    // #sources sharing a gram, bounded by the source count — never
    // doc-pair work), one pair aggregate; the per-source vocabulary
    // table broadcasts twice.
    "t29_source_overlap" -> ((
      (s: SparkSession, d: String) => {
        val grams = docsSpread(s, d)
          .withColumn("w", split(col("text"), " "))
          .select(col("source"), explode(expr(fiveGramsExpr)).as("g"))
          .distinct()
        val vocab = grams.groupBy("source")
          .agg(count(lit(1)).as("n_grams"))
        val shared = grams.as("x").join(grams.as("y"),
            col("x.g") === col("y.g")
              && col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("src_a"),
            col("y.source").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
        shared
          .join(broadcast(vocab.select(col("source").as("src_a"),
            col("n_grams").as("n_a"))), Seq("src_a"))
          .join(broadcast(vocab.select(col("source").as("src_b"),
            col("n_grams").as("n_b"))), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("n_shared"),
            col("n_a"), col("n_b"),
            // shared-gram counts are corpus-level distinct-vocabulary
            // aggregates with no structural cap (5-gram spaces reach
            // ~1e12 on web corpora) — ExactMath branch
            expr(ExactMath.ppmExpr(
              "n_shared", "n_a + n_b - n_shared")).as("jaccard_ppm"))
      },
      Some(s"""WITH grams AS (
            SELECT DISTINCT source, g
            FROM (SELECT source, unnest($fiveGramsSql) AS g
                  FROM (SELECT source, string_split(text, ' ') AS w
                        FROM documents))),
          vocab AS (
            SELECT source, count(*) AS n_grams FROM grams GROUP BY 1),
          shared AS (
            SELECT x.source AS src_a, y.source AS src_b,
                   count(*) AS n_shared
            FROM grams x JOIN grams y
              ON x.g = y.g AND x.source < y.source
            GROUP BY 1, 2)
        SELECT s.src_a, s.src_b, s.n_shared,
               va.n_grams AS n_a, vb.n_grams AS n_b,
               CAST(${ExactMath.ppmSql("s.n_shared",
                 "va.n_grams + vb.n_grams - s.n_shared")} AS BIGINT)
                 AS jaccard_ppm
        FROM shared s
        JOIN vocab va ON s.src_a = va.source
        JOIN vocab vb ON s.src_b = vb.source""")
    )),

    // Doc-level contamination ATTRIBUTION — the drill-down t29's
    // source matrix asks for next: for every ordered source pair,
    // WHICH documents carry the overlap (top-3 docs by how many of
    // their distinct 5-grams appear anywhere in the other source).
    // t29 drives the dedup/eval-placement decision; this names the
    // offending documents to pull or quarantine. Rides the same
    // shared fiveGrams definition (t13/t16/t29 — one 5-gram
    // semantics). Scale shape: distinct (doc, gram) and (source,
    // gram) tables, an equi-join ON GRAM (fan-out bounded by the
    // source count, never doc-pair work), one (pair, doc) aggregate,
    // and a top-3-per-pair rank window that compiles to
    // WindowGroupLimit — per-partition partial top-k, no full sort
    // of the per-pair doc lists.
    "t33_contamination_docs" -> ((
      (s: SparkSession, d: String) => {
        val dg = docsSpread(s, d)
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"), col("source"),
            explode(expr(fiveGramsExpr)).as("g"))
          .distinct()
        val sg = dg.select(col("source"), col("g")).distinct()
        val hits = dg.as("x").join(sg.as("y"),
            col("x.g") === col("y.g")
              && col("x.source") =!= col("y.source"))
          .groupBy(col("x.source").as("src"),
            col("y.source").as("other_src"),
            col("x.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("n_hit"))
        val byPair = Window.partitionBy("src", "other_src")
          .orderBy(col("n_hit").desc, col("doc_id"))
        hits.withColumn("rk", row_number().over(byPair).cast("long"))
          .filter(col("rk") <= 3)
      },
      Some(s"""WITH dg AS (
            SELECT DISTINCT doc_id, source, g
            FROM (SELECT doc_id, source, unnest($fiveGramsSql) AS g
                  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                        FROM documents))),
          sg AS (SELECT DISTINCT source, g FROM dg),
          hits AS (
            SELECT x.source AS src, y.source AS other_src, x.doc_id,
                   count(*) AS n_hit
            FROM dg x JOIN sg y ON x.g = y.g AND x.source <> y.source
            GROUP BY 1, 2, 3)
        SELECT src, other_src, doc_id, n_hit, CAST(rk AS BIGINT) AS rk
        FROM (SELECT src, other_src, doc_id, n_hit,
                     row_number() OVER (PARTITION BY src, other_src
                       ORDER BY n_hit DESC, doc_id) AS rk
              FROM hits)
        WHERE rk <= 3""")
    )),

    // Gopher-style composite quality rules (Rae et al. 2021, §A1.1):
    // the named-rule heuristic gate every large-scale curation stack
    // runs BEFORE any learned filter — each rule an exact-integer
    // predicate, the verdict their conjunction, and every rule's
    // boolean published per doc (the operational requirement: a
    // curation dashboard needs to know WHICH rule rejected, not just
    // that one did). Rules: word count in [20, 200]; mean word length
    // in [4, 10] — as the cross-multiplied integer compare
    // chars ≥ 4n ∧ chars ≤ 10n, never a division; ≥ 2 stopwords
    // (t2's stop set); top-bigram fraction ≤ 8% (25·max ≤ 2·total —
    // the repetition rule). Bounds tightened from Gopher's published
    // ones (3..10 mean, 18% top-2gram) so BOTH verdicts occur live
    // on this synthetic corpus — the paper thresholds are vacuously
    // green here (measured: all 500 docs pass both at sf0.01).
    // Scale shape: three rules are a narrow map; the repetition rule
    // is two doc-keyed aggregates (bigram counts → per-doc max/total)
    // — no cross-doc work anywhere. Single-token docs have no
    // bigrams: LEFT join + null-safe pass (no repeat possible).
    "t28_gopher_rules" -> ((
      // (Delegates to the TextProfile library API — same expressions,
      // same thresholds.)
      (s: SparkSession, d: String) =>
        graft.operators.TextProfile.withGopherRules(docs(s, d)),
      Some("""WITH t AS (
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
                 GROUP BY doc_id)
        SELECT b.doc_id, b.n, b.chars, b.stops,
               (b.n >= 20 AND b.n <= 200) AS r_word_count,
               (b.chars >= b.n * 4 AND b.chars <= b.n * 10)
                 AS r_mean_word_len,
               (b.stops >= 2) AS r_stopwords,
               (bm.mx IS NULL OR bm.mx * 25 <= bm.nb * 2) AS r_top_bigram,
               ((b.n >= 20 AND b.n <= 200)
                AND (b.chars >= b.n * 4 AND b.chars <= b.n * 10)
                AND (b.stops >= 2)
                AND (bm.mx IS NULL OR bm.mx * 25 <= bm.nb * 2)) AS kept
        FROM base b LEFT JOIN bm USING (doc_id)""")
    )),

    // Linear quality classifier over HASHED features — the serving
    // shape of every fastText-style quality filter (the
    // GPT-3/LLaMA-pipeline "looks like curated text?" gate): the
    // hashing trick (Weinberger et al. 2009) maps each token to one
    // of 1024 buckets with a second SIGN hash (the collision-bias
    // killer), and the score is Σ sign·w[bucket] over token
    // occurrences. The weights here are deterministic pseudo-random
    // integers, but they sit in a TABLE broadcast onto the feature
    // stream — the real serving topology: swap `wtab` for trained
    // parameters and neither the plan nor the oracle shape changes.
    // No division anywhere (a negative score under Spark's
    // truncating `div` vs DuckDB's flooring `//` would flip), so
    // every value is exact int64 and the accept boundary
    // (score_q >= 0) is engine-exact. Scale shape: narrow featurize
    // map, 1024-row broadcast, one map-side-combinable per-doc
    // aggregate — embarrassingly parallel at any corpus size.
    "t27_quality_classifier" -> ((
      (s: SparkSession, d: String) => {
        val wtab = s.range(1024).select(col("id").as("bucket"),
          (pmod(col("id") * lit(2654435761L), lit(2003L)) - 1001L)
            .as("wgt"))
        val feats = docsSpread(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .withColumn("bucket",
            pmod(saltedHash(23, col("tok")), lit(1024L)))
          .withColumn("sign",
            pmod(saltedHash(29, col("tok")), lit(2L)) * 2L - 1L)
        feats.join(broadcast(wtab), Seq("bucket"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(expr("sign * wgt")).as("score_q"))
          .withColumn("kept", col("score_q") >= 0L)
      },
      Some(s"""WITH wtab AS (
            SELECT i AS bucket, (i * 2654435761) % 2003 - 1001 AS wgt
            FROM range(1024) t(i)),
          f AS (
            SELECT doc_id,
                   ${saltedHashSql(23, "tok")} % 1024 AS bucket,
                   (${saltedHashSql(29, "tok")} % 2) * 2 - 1 AS sign
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents))
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(sign * wgt) AS BIGINT) AS score_q,
               (sum(sign * wgt) >= 0) AS kept
        FROM f JOIN wtab USING (bucket)
        GROUP BY doc_id""")
    )),

    // DSIR-style importance selection (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): from
    // a raw pool, pick the docs whose hashed-token-bucket distribution
    // looks most like a small curated target corpus (sources
    // src0/src1 stand in for the target domain). Engine-portable
    // surrogate of the DSIR log-likelihood ratio: each token
    // occurrence in bucket b contributes
    // floor((c_t[b]+1)·1e6 / (c_r[b]+1)) — the add-one-smoothed
    // target-vs-raw frequency ratio in ppm. The log form is
    // deliberately avoided (libm portability — t22's argument), and
    // the corpus-constant normalizers DSIR divides by drop out of the
    // per-token MEAN (mean_ppm = dsir_q·1e6 div n_tokens) the gate
    // ranks on. Selection = top ceil(n/4) per language by
    // (mean_ppm desc, doc_id) — DSIR's deterministic top-k variant
    // (Gumbel resampling is a seeded-noise add on the same ranking).
    // Scale shape: ONE map-side-combinable aggregate into ≤1024
    // bucket groups yields BOTH counts, that 1024-row table
    // broadcasts onto the token stream, one per-doc aggregate — and
    // the per-lang top-k WITHOUT sorting a whole language in one
    // task (t21's window would): a (lang, mean_ppm) histogram
    // (≤ 1e6+1 rows per lang BY CONSTRUCTION, data-size-independent)
    // carries the cumulative/threshold windows, and the only
    // full-data window partitions by (lang, mean_ppm) — tie-group
    // sized. selected ⟺ above + rank-within-tie ≤ k reproduces
    // exactly the top-k by (mean_ppm desc, doc_id) the oracle's
    // plain row_number computes. Exactness bounds: the ratio is
    // exact while (c_t+1)·1e6 < 2^53 (per-bucket target counts under
    // ~9e9 — raise the bucket count past 1024 before that); mean_ppm
    // is exact while dsir_q·1e6 fits int64 (docs under ~9M tokens).
    "t23_dsir_select" -> ((
      (s: SparkSession, d: String) => {
        val isTarget = col("source").isin("src0", "src1")
        val toks = docs(s, d)
          .select(col("doc_id"), col("lang"), isTarget.as("tgt"),
            explode(split(col("text"), " ")).as("tok"))
          .withColumn("bucket", pmod(saltedHash(17, col("tok")), lit(1024L)))
        val counts = toks.groupBy("bucket")
          .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("c_t"),
            count(lit(1)).as("c_r"))
        val scored = toks.filter(!col("tgt"))
          .join(broadcast(counts), Seq("bucket"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_tokens"),
            sum(floor((col("c_t") + 1) * lit(1000000.0) / (col("c_r") + 1))
              .cast("long")).as("dsir_q"))
          // raw ppm retained: per-DOC aggregate — dsir_q ≤ doc tokens
          // · 1e6 (each term ≤ 1e6 since c_t ≤ c_r) ≈ ≤1e12 for a
          // 1M-token doc, under the multiply-first bound
          .withColumn("mean_ppm", expr("dsir_q * 1000000L div n_tokens"))
        val hist = scored.groupBy("lang", "mean_ppm")
          .agg(count(lit(1)).as("cnt"))
        val wCum = Window.partitionBy("lang")
          .orderBy(col("mean_ppm").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wLang = Window.partitionBy("lang")
        val cum = hist
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("nl", sum(col("cnt")).over(wLang))
          .select(col("lang"), col("mean_ppm"),
            (col("cum") - col("cnt")).as("above"),
            expr("(nl + 3L) div 4").as("k"))
        val wTie = Window.partitionBy("lang", "mean_ppm").orderBy("doc_id")
        scored.join(broadcast(cum), Seq("lang", "mean_ppm"))
          .withColumn("rnb", row_number().over(wTie))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("dsir_q"), col("mean_ppm"),
            (col("above") + col("rnb") <= col("k")).as("selected"))
      },
      Some(s"""WITH toks AS (
            SELECT doc_id, lang, (source IN ('src0','src1')) AS tgt,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents),
          bt AS (
            SELECT doc_id, lang, tgt,
                   ${saltedHashSql(17, "tok")} % 1024 AS bucket
            FROM toks),
          counts AS (
            SELECT bucket, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS c_t,
                   count(*) AS c_r
            FROM bt GROUP BY bucket),
          scored AS (
            SELECT doc_id, lang, count(*) AS n_tokens,
                   CAST(sum(CAST(floor((c_t + 1) * 1000000.0 / (c_r + 1))
                     AS BIGINT)) AS BIGINT) AS dsir_q
            FROM bt JOIN counts USING (bucket)
            WHERE NOT tgt
            GROUP BY doc_id, lang),
          r AS (
            SELECT doc_id, lang, n_tokens, dsir_q,
                   CAST(dsir_q * 1000000 // n_tokens AS BIGINT) AS mean_ppm
            FROM scored),
          rk AS (
            SELECT *, row_number() OVER (PARTITION BY lang
                        ORDER BY mean_ppm DESC, doc_id) AS rn,
                   count(*) OVER (PARTITION BY lang) AS nl
            FROM r)
        SELECT doc_id, lang, n_tokens, dsir_q, mean_ppm,
               (rn <= (nl + 3) // 4) AS selected
        FROM rk""")
    )),

    // Edit-distance near-dup: the dedup family's third verification
    // geometry (set overlap = Jaccard d7, bit space = SimHash d9,
    // SEQUENCE space = Levenshtein here). Candidate generation is
    // blocking on (8-char prefix, length bucket) of the 40-char title
    // slice — an equi-join, never all-pairs — then exact Levenshtein
    // verification on the pairs (classic DP, integer-identical in any
    // engine). ~30k candidate pairs at sf0.1 vs 12.5M all-pairs.
    "d11_editdist_neardup" -> ((
      (s: SparkSession, d: String) => {
        val t = docsSpread(s, d).select(col("doc_id"),
          substring(col("text"), 1, 40).as("title"))
        val blocked = t.withColumn("blk",
          concat(substring(col("title"), 1, 8), lit(":"),
            expr("length(title) div 8").cast("string")))
        blocked.as("x").join(blocked.as("y"),
            col("x.blk") === col("y.blk") &&
              col("x.doc_id") < col("y.doc_id"))
          .withColumn("dist",
            levenshtein(col("x.title"), col("y.title")).cast("long"))
          .filter(col("dist") <= 8)
          .select(col("x.doc_id").as("doc_a"),
            col("y.doc_id").as("doc_b"), col("dist"))
      },
      Some("""WITH t AS (
          SELECT doc_id, substr(text, 1, 40) AS title,
                 substr(text, 1, 8) || ':' ||
                   (length(substr(text, 1, 40)) // 8) AS blk
          FROM documents)
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
               CAST(levenshtein(x.title, y.title) AS BIGINT) AS dist
        FROM t x JOIN t y ON x.blk = y.blk AND x.doc_id < y.doc_id
        WHERE levenshtein(x.title, y.title) <= 8""")
    )),

    // BPE-ish tokenization: the GPT-family pre-tokenizer shape —
    // letter runs, digit chunks of at most 3 (how modern BPE vocabs
    // chunk numbers), single non-alphanumeric marks — as one
    // regexp_extract_all pass. Complements t1's whitespace count with
    // the statistics a tokenizer-budget planner actually needs: BPE
    // token count, unique-token count, and summed token chars (all
    // exact integers; the pattern uses no lookarounds so Java regex
    // and RE2 segment identically). Per-row narrow map — no shuffle.
    "t17_bpe_tokens" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .withColumn("toks",
            regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_bpe"),
            size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
            aggregate(transform(col("toks"), t => length(t).cast("long")),
              lit(0L), (acc, x) => acc + x).as("n_tok_chars")),
      Some("""SELECT doc_id,
          len(toks) AS n_bpe,
          len(list_distinct(toks)) AS n_uniq,
          CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
            AS BIGINT) AS n_tok_chars
        FROM (SELECT doc_id,
                regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 ]') AS toks
              FROM documents)""")
    )),

    // Multimodal plumbing: text treated as an opaque binary payload
    // with derived typed metadata; the "decode" is a deterministic
    // stub (no image/audio libs in this container) but the binary
    // column, byte accounting, and fingerprint path are real.
    "m1_binary_features" -> ((
      (s: SparkSession, d: String) =>
        docs(s, d)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .select(col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            substring(md5(col("payload")), 1, 8).as("fp8"),
            (pmod(octet_length(col("payload")), lit(64)) + 1).cast("long")
              .as("fake_width"),
            (pmod(floor(octet_length(col("payload")) / 64), lit(64)) + 1)
              .cast("long").as("fake_height")),
      Some("""SELECT doc_id,
          octet_length(encode(text)) AS n_bytes,
          substr(md5(text), 1, 8) AS fp8,
          octet_length(encode(text)) % 64 + 1 AS fake_width,
          (octet_length(encode(text)) // 64) % 64 + 1 AS fake_height
        FROM documents""")
    )),

    // LEARNED BPE (Sennrich 2016) — real tokenizer TRAINING, the
    // stage t17's fixed pre-tokenization stops short of: 8 unrolled
    // merge rounds over the word vocabulary, each one frequency-
    // weighted pair-count aggregate → deterministic argmax
    // (cnt desc, then smallest pair) → greedy-left merge apply.
    // DuckDB replays the identical rounds as CTEs: its greedy apply
    // is an INDEPENDENT formulation (gaps-and-islands parity pick
    // over match positions) that must byte-match the operator's
    // single-pass Catalyst fold — two derivations, one fixed point
    // (the p6 argmax pattern). Output: the pinned merge table.
    // Scale: the corpus is touched once (word counts); rounds are
    // distinct-word-sized (operators.Bpe scaladoc).
    "t31_bpe_merges" -> ((
      (s: SparkSession, d: String) => {
        val (merges, _) =
          graft.operators.Bpe.train(docs(s, d), "text", rounds = 8)
        graft.operators.Bpe.mergesDf(s, merges)
          .select(col("round").as("merge_round"), col("left_sym"),
            col("right_sym"), col("pair_count"))
      },
      Some(s"""WITH ${bpeRoundsSql(8)}
        SELECT * FROM (
          ${(1 to 8).map(k =>
            s"SELECT CAST($k AS BIGINT) AS merge_round, l AS left_sym, " +
            s"r AS right_sym, cnt AS pair_count FROM m$k")
            .mkString("\n          UNION ALL ")})""")
    )),

    // Per-doc token counts under the t31-trained merges: the corpus
    // words broadcast-join the trained (word → n_symbols) vocabulary
    // — the docs are never re-segmented char-by-char. The counts are
    // the downstream contract of a tokenizer (packing budgets, cost
    // estimates), so they are pinned alongside the merge table.
    "t32_bpe_token_counts" -> ((
      (s: SparkSession, d: String) => {
        val (merges, vocab) =
          graft.operators.Bpe.train(docs(s, d), "text", rounds = 8)
        // same corpus trains and counts, so no word misses the vocab
        // — the merge list still rides along so the unseen-word
        // fallback is the exact trained segmentation, never len+1
        graft.operators.Bpe.tokenCounts(docs(s, d), vocab,
          merges = merges)
      },
      Some(s"""WITH ${bpeRoundsSql(8)},
          words AS (
            SELECT doc_id, token AS word
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            WHERE token <> '')
        SELECT w.doc_id, count(*) AS n_words,
               CAST(sum(len(v.s)) AS BIGINT) AS n_tokens
        FROM words w JOIN v8 v ON w.word = v.word
        GROUP BY 1""")
    )),

    // Tokenizer FERTILITY audit per source — the standard tokenizer-
    // eval metric (tokens per word, chars per token) under the
    // t31-trained merges: a source whose fertility runs hot is
    // under-served by the vocabulary (its text fragments into more,
    // shorter tokens), the signal that drives vocab-size and
    // corpus-mix decisions. Exact ppm integers; same broadcast-vocab
    // join shape as t32, aggregated at source cardinality.
    "t34_tokenizer_fertility" -> ((
      (s: SparkSession, d: String) => {
        val (_, vocab) =
          graft.operators.Bpe.train(docs(s, d), "text", rounds = 8)
        docs(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          // UNHINTED: the trained vocabulary is word-cardinality
          // (unbounded at 100 TB) — AQE broadcasts it while it fits
          .join(vocab.select(col("word"),
            size(col("s")).cast("long").as("n_sym")), Seq("word"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_words"),
            sum("n_sym").as("n_tokens"),
            sum(length(col("word")).cast("long")).as("n_chars"))
          .select(col("source"), col("n_words"), col("n_tokens"),
            col("n_chars"),
            // per-source token/char sums are corpus-level (past 9e12
            // in the 100 TB regime) — ExactMath branch. These ratios
            // have num > den (fertility ≥ 1), but num/den is bounded
            // by symbols-per-word (~50) resp. chars-per-token, so the
            // >9e12 div-first branch's divisor is still ≥ num/50 ≫
            // 1e6 and its truncation error stays negligible for a
            // corpus diagnostic; both engines share the branch, so
            // they agree bit-for-bit regardless
            expr(ExactMath.ppmExpr("n_tokens", "n_words"))
              .as("fertility_ppm"),
            expr(ExactMath.ppmExpr("n_chars", "n_tokens"))
              .as("chars_per_token_ppm"))
      },
      Some(s"""WITH ${bpeRoundsSql(8)},
          words AS (
            SELECT source, token AS word
            FROM (SELECT source, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            WHERE token <> '')
        SELECT source, n_words, n_tokens, n_chars,
               CAST(${ExactMath.ppmSql("n_tokens", "n_words")}
                 AS BIGINT) AS fertility_ppm,
               CAST(${ExactMath.ppmSql("n_chars", "n_tokens")}
                 AS BIGINT) AS chars_per_token_ppm
        FROM (
          SELECT w.source, count(*) AS n_words,
                 CAST(sum(len(v.s)) AS BIGINT) AS n_tokens,
                 CAST(sum(length(w.word)) AS BIGINT) AS n_chars
          FROM words w JOIN v8 v ON w.word = v.word
          GROUP BY 1)""")
    )),

    // LENGTH CURRICULUM — deterministic global training order,
    // shortest documents first (the classic warm-up curriculum), with
    // round-robin shard interleaving so every shard sees the full
    // difficulty ramp. The scale problem is the GLOBAL position: a
    // plain row_number over everything is a single-partition sort
    // (the t21/t24 forbidden shape). operators.GlobalOrder solves it
    // in two phases — per-length counts → prefix-sum offsets over the
    // LENGTH-cardinality table (the only global window, key-sized by
    // design) → broadcast offsets + per-length row_number — and runs
    // here with salts=AutoSalts: the counts aggregate already measures
    // the heaviest length key, so the operator ships the FLAT
    // single-shuffle plan while that key fits one task (it does at
    // every bundled scale — round 14 paid the salted plan's second
    // shuffle unconditionally, 0.63→1.01 s, where flat was provably
    // safe) and escalates to the TWO-LEVEL (key, tie-range salt)
    // scheme only when the per-length single-task-sort ceiling is
    // actually threatened. Positions are provably UNCHANGED by the
    // choice (the salt bucket is monotone in the tie, so it moves
    // only load balance — this query's hash vs the unsalted round-13
    // oracle is the live proof). DuckDB independently derives the
    // same positions with its global row_number: two formulations,
    // one total order.
    "t35_length_curriculum" -> ((
      (s: SparkSession, d: String) => {
        val byLen = docs(s, d).select(col("doc_id"),
          expr("CAST(size(filter(split(text, ' '), x -> x != ''))" +
            " AS BIGINT)").as("n_tokens"))
        graft.operators.GlobalOrder
          .enumerate(byLen, "n_tokens", "doc_id",
            salts = graft.operators.GlobalOrder.AutoSalts)
          .select(col("doc_id"), col("n_tokens"), col("pos"),
            pmod(col("pos"), lit(8L)).as("shard"))
      },
      Some("""SELECT doc_id, n_tokens,
               CAST(row_number() OVER (ORDER BY n_tokens, doc_id) - 1
                 AS BIGINT) AS pos,
               CAST((row_number() OVER (ORDER BY n_tokens, doc_id) - 1)
                 % 8 AS BIGINT) AS shard
        FROM (SELECT doc_id,
                     CAST(len(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS BIGINT) AS n_tokens
              FROM documents)""")
    )),

    // Count-Min sketch frequency estimates for the top-20 tokens —
    // the sketch that completes the mergeable-summary family (HLL /
    // KLL / theta / Misra-Gries / Bloom), with its defining ONE-SIDED
    // invariant published per row: collisions only ever ADD, so
    // cms_est ≥ exact_n always, and `overcount` is the live collision
    // mass. Unlike the q15/q52 accuracy contracts, the portable
    // salted-MD5 hashes make every counter deterministic — DuckDB
    // replays the whole sketch cell-for-cell (the SimHash precedent
    // applied to frequencies). Scale shape: one corpus token
    // aggregate, a depth-way explode over the DISTINCT-token table
    // into 4×512 cells (KBs — broadcast onto the query side), and a
    // top-20 TakeOrderedAndProject.
    "t36_cms_frequency" -> ((
      (s: SparkSession, d: String) => {
        val toks = docs(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("tok").agg(count(lit(1)).as("n"))
        val cms = graft.operators.CountMin.sketch(toks, "tok", "n")
        val top = toks.orderBy(col("n").desc, col("tok")).limit(20)
        graft.operators.CountMin
          .estimate(top.select("tok"), "tok", cms)
          .join(broadcast(top), Seq("tok"))
          .select(col("tok").as("token"), col("n").as("exact_n"),
            col("cms_est"),
            (col("cms_est") - col("n")).as("overcount"),
            (col("cms_est") >= col("n")).as("one_sided_ok"))
      },
      Some {
        val bucketCase = (e: String) => (0 until 4).map(r =>
          s"WHEN $r THEN ${graft.operators.CountMin.bucketSql(r, e, 512)}")
          .mkString("CASE r ", " ", " END")
        s"""WITH tf AS (
            SELECT token AS tok, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents)
            WHERE token <> '' GROUP BY 1),
          cells AS (
            SELECT r, ${bucketCase("tok")} AS bucket,
                   CAST(sum(n) AS BIGINT) AS c
            FROM tf, unnest(range(0, 4)) t(r)
            GROUP BY 1, 2),
          top AS (SELECT tok, n FROM tf ORDER BY n DESC, tok LIMIT 20),
          q AS (
            SELECT tok, r, ${bucketCase("tok")} AS bucket
            FROM top, unnest(range(0, 4)) t(r)),
          est AS (
            -- LEFT join + COALESCE 0: the operator's textbook-CMS
            -- contract (untouched cells are zero counters). For these
            -- in-corpus query tokens every cell is touched, so this is
            -- equivalent to the inner join — mirrored for lockstep.
            SELECT q.tok, min(COALESCE(c.c, 0)) AS cms_est
            FROM q LEFT JOIN cells c ON q.r = c.r AND q.bucket = c.bucket
            GROUP BY 1)
        SELECT t.tok AS token, t.n AS exact_n,
               CAST(e.cms_est AS BIGINT) AS cms_est,
               CAST(e.cms_est - t.n AS BIGINT) AS overcount,
               e.cms_est >= t.n AS one_sided_ok
        FROM top t JOIN est e ON t.tok = e.tok"""
      }
    )),

    // REPETITION Gopher rules (TextProfile.withRepetitionRules) —
    // the half of Rae et al.'s quality gate t28's top-bigram rule
    // only samples: per doc, the char mass of the single most
    // frequent 2/3/4-gram and of ALL duplicated 5/6-grams, exact ppm
    // of word chars, gated at the published 20/18/16% and 15/14%
    // thresholds. Overlapping sliding-window occurrences; duplicate
    // mass counts every occurrence of every c≥2 gram without
    // position dedup (the Dolma/NeMo reimplementation convention).
    // Top-gram ties: highest count then highest mass, encoded as
    // max(c·10⁵ + c·len) — exact int64 at the corpus's doc sizes.
    // Scale shape: five n-gram explodes, each a map-side-combinable
    // (doc, gram) count then a doc aggregate — no windows, no
    // cross-doc work.
    "t38_repetition_rules" -> ((
      (s: SparkSession, d: String) =>
        graft.operators.TextProfile.withRepetitionRules(docs(s, d)),
      Some {
        val gram = (n: Int) =>
          s"""g$n AS (
            SELECT doc_id,
                   list_aggregate(w[i:i + ${n - 1}], 'string_agg', ' ')
                     AS g
            FROM t, unnest(range(1, len(w) - ${n - 2})) s(i)
            WHERE len(w) >= $n),
          c$n AS (
            SELECT doc_id, g, count(*) AS c,
                   CAST(length(g) - ${n - 1} AS BIGINT) AS len
            FROM g$n GROUP BY 1, 2)"""
        val tops = (n: Int) =>
          s"""top$n AS (
            SELECT doc_id,
                   CAST(max(c * 100000 + c * len) % 100000 AS BIGINT)
                     AS mass
            FROM c$n GROUP BY 1)"""
        val dups = (n: Int) =>
          s"""dup$n AS (
            SELECT doc_id, CAST(sum(c * len) AS BIGINT) AS mass
            FROM c$n WHERE c >= 2 GROUP BY 1)"""
        s"""WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          ch AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(w, x -> length(x)))
                     AS BIGINT) AS chars
            FROM t),
          ${Seq(2, 3, 4, 5, 6).map(gram).mkString(",\n          ")},
          ${Seq(2, 3, 4).map(tops).mkString(",\n          ")},
          ${Seq(5, 6).map(dups).mkString(",\n          ")}
        SELECT ch.doc_id, ch.chars,
               coalesce(t2.mass, 0) * 1000000 // ch.chars AS top2_ppm,
               coalesce(t3.mass, 0) * 1000000 // ch.chars AS top3_ppm,
               coalesce(t4.mass, 0) * 1000000 // ch.chars AS top4_ppm,
               coalesce(d5.mass, 0) * 1000000 // ch.chars AS dup5_ppm,
               coalesce(d6.mass, 0) * 1000000 // ch.chars AS dup6_ppm,
               coalesce(t2.mass, 0) * 1000000 // ch.chars <= 200000
                 AS r_top2,
               coalesce(t3.mass, 0) * 1000000 // ch.chars <= 180000
                 AS r_top3,
               coalesce(t4.mass, 0) * 1000000 // ch.chars <= 160000
                 AS r_top4,
               coalesce(d5.mass, 0) * 1000000 // ch.chars <= 150000
                 AS r_dup5,
               coalesce(d6.mass, 0) * 1000000 // ch.chars <= 140000
                 AS r_dup6,
               (coalesce(t2.mass, 0) * 1000000 // ch.chars <= 200000
                AND coalesce(t3.mass, 0) * 1000000 // ch.chars <= 180000
                AND coalesce(t4.mass, 0) * 1000000 // ch.chars <= 160000
                AND coalesce(d5.mass, 0) * 1000000 // ch.chars <= 150000
                AND coalesce(d6.mass, 0) * 1000000 // ch.chars <= 140000)
                 AS rep_kept
        FROM ch
        LEFT JOIN top2 t2 USING (doc_id)
        LEFT JOIN top3 t3 USING (doc_id)
        LEFT JOIN top4 t4 USING (doc_id)
        LEFT JOIN dup5 d5 USING (doc_id)
        LEFT JOIN dup6 d6 USING (doc_id)"""
      }
    )),

    // Unigram-entropy quality signal: the Shannon entropy (nats) of
    // each doc's word distribution — the information-density filter
    // (low entropy = repetitive/templated junk; degenerate one-word
    // spam scores exactly 0) that complements t38's n-gram repetition
    // rules with a distribution-level view. Float discipline: the
    // per-WORD term c·(ln n − ln c)/n is quantized to integer
    // micro-nats BEFORE the per-doc sum (the cents pattern), so no
    // cross-engine double-summation order exists — ln/division on
    // identical doubles are bit-identical, and the only sum is over
    // BIGINTs. Scale shape: one (doc, word) map-side-combinable
    // count, then a doc-partitioned window and final agg that REUSE
    // the same hash partitioning (one logical shuffle chain, no
    // global structures, rows bounded by vocab × docs).
    "t39_unigram_entropy" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("doc_id")
        docs(s, d)
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("word"))
          .groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("c"))
          .withColumn("n", sum("c").over(w))
          .withColumn("n_types", count(lit(1)).over(w))
          .withColumn("term_unat", expr(
            "CAST(floor(CAST(c AS DOUBLE)" +
              " * (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE)))" +
              " / CAST(n AS DOUBLE) * 1000000D + 0.5D) AS BIGINT)"))
          .groupBy(col("doc_id"))
          .agg(max("n").as("n_words"), max("n_types").as("n_types"),
            sum("term_unat").as("entropy_unat"))
          .withColumn("ent_kept", col("entropy_unat") >= lit(2500000L))
      },
      Some("""WITH counts AS (
            SELECT doc_id, word, count(*) AS c
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            GROUP BY 1, 2),
          stats AS (
            SELECT doc_id, c,
                   sum(c) OVER (PARTITION BY doc_id) AS n,
                   count(*) OVER (PARTITION BY doc_id) AS n_types
            FROM counts),
          terms AS (
            SELECT doc_id, n, n_types,
                   CAST(floor(CAST(c AS DOUBLE)
                     * (ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE)))
                     / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                     AS term_unat
            FROM stats)
        SELECT doc_id, CAST(max(n) AS BIGINT) AS n_words,
               CAST(max(n_types) AS BIGINT) AS n_types,
               CAST(sum(term_unat) AS BIGINT) AS entropy_unat,
               CAST(sum(term_unat) AS BIGINT) >= 2500000 AS ent_kept
        FROM terms GROUP BY 1""")
    )),

    // PII detection + redaction — the scrub pass every released
    // training corpus runs (emails, phone-shaped, long id-number
    // runs). The bundled corpus is digit-free, so the query first
    // AUGMENTS it deterministically from doc_id (both engines build
    // the identical text — the m-family's synthesize-then-operate
    // pattern), then counts each PII class on the original and
    // replaces in a fixed order (email → phone → id; the classes are
    // disjoint by construction: email digits ≤5, phone runs split by
    // the dash, id runs ≥7). Patterns stay in the RE2 ∩ java.regex
    // dialect ([...] classes, explicit {m,n} — no \\d, no
    // lookaround) so both engines match identical spans; md5 of the
    // redacted text pins the actual output BYTES, not just counts.
    // Scale: one narrow map over docs — no shuffle at all before the
    // final per-source rollup, which is map-side-combinable over 4
    // groups.
    "t40_pii_redaction" -> ((
      (s: SparkSession, d: String) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "[0-9]{3}-[0-9]{4}"
        val idnum = "[0-9]{7,}"
        docs(s, d)
          .withColumn("aug", concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"),
                (col("doc_id") % 100000).cast("string"),
                lit("@example.com"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") % 9000 + 1000).cast("string"),
                  4, "0"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" ref 9"),
                lpad((col("doc_id") % 1000000).cast("string"),
                  6, "0"))).otherwise(lit(""))))
          .select(col("doc_id"), col("source"),
            regexp_count(col("aug"), lit(email)).cast("long")
              .as("emails"),
            regexp_count(col("aug"), lit(phone)).cast("long")
              .as("phones"),
            regexp_count(col("aug"), lit(idnum)).cast("long")
              .as("idnums"),
            regexp_replace(
              regexp_replace(
                regexp_replace(col("aug"), email, "<EMAIL>"),
                phone, "<PHONE>"),
              idnum, "<ID>").as("red"))
          .select(col("doc_id"), col("source"), col("emails"),
            col("phones"), col("idnums"),
            length(col("red")).cast("long").as("red_chars"),
            md5(col("red")).as("red_md5"),
            (col("emails") + col("phones") + col("idnums") > 0)
              .as("has_pii"))
      },
      Some("""WITH aug AS (
            SELECT doc_id, source, text
              || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                   || CAST(doc_id % 100000 AS VARCHAR) || '@example.com'
                 ELSE '' END
              || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
                   || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')
                 ELSE '' END
              || CASE WHEN doc_id % 7 = 0 THEN ' ref 9'
                   || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
                 ELSE '' END AS a
            FROM documents),
          scan AS (
            SELECT doc_id, source,
              CAST(len(regexp_extract_all(a,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                AS BIGINT) AS emails,
              CAST(len(regexp_extract_all(a, '[0-9]{3}-[0-9]{4}'))
                AS BIGINT) AS phones,
              CAST(len(regexp_extract_all(a, '[0-9]{7,}'))
                AS BIGINT) AS idnums,
              regexp_replace(regexp_replace(regexp_replace(a,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                '[0-9]{7,}', '<ID>', 'g') AS red
            FROM aug)
        SELECT doc_id, source, emails, phones, idnums,
               CAST(length(red) AS BIGINT) AS red_chars,
               md5(red) AS red_md5,
               emails + phones + idnums > 0 AS has_pii
        FROM scan""")
    )),
  )

  /** DuckDB unroll of `rounds` BPE training rounds (t31/t32): v0 is
    * the char-split vocabulary (+ end marker), and each round k
    * derives pair counts p_k, the argmax merge m_k, greedy-left match
    * positions g_k (gaps-and-islands parity — in a run of identical
    * symbols only every other match fires, exactly the sequential
    * scan's behavior), and the re-segmented vocabulary v_k.
    */
  private def bpeRoundsSql(rounds: Int): String = {
    val init = s"""wf AS MATERIALIZED (
        SELECT token AS word, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token <> '' GROUP BY 1),
      v0 AS MATERIALIZED (
        SELECT word, freq,
               [word[j] for j in range(1, len(word) + 1)] || ['</w>'] AS s
        FROM wf)"""
    val round = (k: Int) => {
      val p = s"v${k - 1}"
      s"""p$k AS (
        SELECT s[i] AS l, s[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
        FROM $p, unnest(range(1, len(s))) t(i)
        GROUP BY 1, 2),
      m$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
      h$k AS (
        SELECT word, i,
               i - row_number() OVER (PARTITION BY word ORDER BY i) AS isl
        FROM $p, m$k, unnest(range(1, len(s))) t(i)
        WHERE s[i] = m$k.l AND s[i + 1] = m$k.r),
      g$k AS MATERIALIZED (
        SELECT word, i FROM (
          SELECT word, i, min(i) OVER (PARTITION BY word, isl) AS i0
          FROM h$k)
        WHERE (i - i0) % 2 = 0),
      v$k AS MATERIALIZED (
        SELECT q.word, q.freq,
               list(CASE WHEN g.i IS NOT NULL
                         THEN q.s[q.i] || q.s[q.i + 1]
                         ELSE q.s[q.i] END ORDER BY q.i) AS s
        FROM (SELECT word, freq, s, t.i AS i
              FROM $p, unnest(range(1, len(s) + 1)) t(i)) q
        LEFT JOIN g$k g ON q.word = g.word AND q.i = g.i
        LEFT JOIN g$k c ON q.word = c.word AND q.i = c.i + 1
        WHERE c.i IS NULL
        GROUP BY q.word, q.freq)"""
    }
    (init +: (1 to rounds).map(round)).mkString(",\n      ")
  }

  /** d5's fingerprints: 16-bit sign-aggregated SimHash per doc —
    * shared by d5 (fingerprinting) and d9 (banded near-dup retrieval).
    */
  private def simhashFingerprints(s: SparkSession, d: String): DataFrame = {
    val tokens = docsSpread(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", saltedHash(9, col("tok")))
    val bitSums = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val fingerprint = (0 until SimhashBits).map { b =>
      when(col(s"s$b") > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    tokens.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  private lazy val simhashSql: String = {
    val bitSums = (0 until SimhashBits).map { b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val fp = (0 until SimhashBits).map { b =>
      s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, $fp AS simhash FROM (
         SELECT doc_id, $bitSums FROM (
           SELECT doc_id, ${saltedHashSql(9, "tok")} AS h FROM (
             SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             FROM documents))
         GROUP BY doc_id)"""
  }

}
