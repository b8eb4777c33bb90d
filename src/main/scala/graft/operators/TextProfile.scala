package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document text profiling as a DataFrame-first library API — the
  * quality-gate stage of a curation pipeline over a consumer's OWN
  * corpus. Every function is a narrow map (no shuffle at any scale)
  * that APPENDS columns, so gates compose:
  *
  *   TextProfile.withTokenStats(docs)      n_tokens / n_word_tokens / len_chars
  *   TextProfile.withQualityStats(docs)    stopword + punctuation densities
  *   TextProfile.withLangGuess(docs)       heuristic n-gram language ID
  *   TextProfile.withRepetition(docs)      duplicate-bigram compression proxy
  *   TextProfile.hashSplit(docs)           portable md5-bucket train/val/test
  *
  * The oracle-verified queries (t1/t2/t3/t7/t4) run these exact
  * expressions, so the API cannot drift from the checked semantics.
  */
object TextProfile {

  /** Whitespace token count, lowercase-alnum word-token count, and
    * character length.
    */
  def withTokenStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("n_word_tokens",
        regexp_count(col(textCol), lit("[a-z0-9]+")).cast("long"))
      .withColumn("len_chars", length(col(textCol)).cast("long"))

  /** Stopword density and punctuation ratio — the cheap fluency
    * signals a quality gate thresholds on.
    */
  def withQualityStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("stop_hits",
        regexp_count(col(textCol), lit("\\b(the|a|of|and|to)\\b")).cast("long"))
      .withColumn("punct_chars",
        length(regexp_replace(col(textCol), "[^.!?,;:]", "")).cast("long"))
      .withColumn("stop_ratio",
        round(col("stop_hits").cast("double") / col("n_tokens"), 4))
      .withColumn("punct_ratio",
        round(col("punct_chars").cast("double") / length(col(textCol)), 4))

  private val langPatterns = Seq(
    "en" -> "\\b(the|of|and|to|in)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "es" -> "\\b(el|los|las|una|y)\\b",
    "fr" -> "\\b(le|les|et|des|est)\\b")

  /** Stopword-vote language ID (en/de/es/fr + CJK detection) with a
    * deterministic vote-order tie-break. Appends hits_<lang> counters
    * and `lang_guess`.
    */
  def withLangGuess(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withScores = langPatterns.foldLeft(df) { case (d, (l, pat)) =>
      d.withColumn(s"hits_$l", regexp_count(col(textCol), lit(pat)).cast("long"))
    }.withColumn("cjk",
      regexp_count(col(textCol), lit("[\\x{4e00}-\\x{9fff}]")).cast("long"))
    withScores.withColumn("lang_guess",
      // null text first: every regexp count is null then, all the
      // vote comparisons evaluate to null-as-false, and an unguarded
      // chain would fall through to confidently label the row French
      when(col(textCol).isNull, lit(null).cast("string"))
        .when(col("cjk") > 0, "zh")
        .when(col("hits_en") >= greatest(col("hits_de"), col("hits_es"),
          col("hits_fr")), "en")
        .when(col("hits_de") >= greatest(col("hits_es"), col("hits_fr")), "de")
        .when(col("hits_es") >= col("hits_fr"), "es")
        .otherwise("fr"))
      .drop("cjk")
  }

  /** Duplicate-bigram ratio — a shuffle-free compression-style proxy
    * for boilerplate/repetition. Appends n_grams / n_distinct /
    * rep_ratio.
    */
  def withRepetition(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("__grams", expr(
        """CASE WHEN size(__w) < 2 THEN array(concat_ws(' ', __w))
           ELSE transform(sequence(0, size(__w) - 2),
             i -> concat_ws(' ', slice(__w, i + 1, 2))) END"""))
      .withColumn("n_grams", size(col("__grams")).cast("long"))
      .withColumn("n_distinct",
        size(array_distinct(col("__grams"))).cast("long"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct") / col("n_grams").cast("double"), 4))
      .drop("__w", "__grams")

  /** Portable deterministic hash bucket of an id column — stable
    * across runs, engines, and cluster sizes, unlike rand(). The salt
    * decorrelates independent bucketings of the same ids (doc-level
    * split vs cluster-level split must not reuse one assignment).
    */
  private[graft] def hashBucket(
      id: Column, buckets: Long, salt: Int = 0): Column =
    pmod(graft.functions.PortableHash.saltedHash(salt, id.cast("string")),
      lit(buckets))

  /** Appends `split` ∈ train/val/test by md5 bucket of `idCol` —
    * percentages out of 100.
    */
  def hashSplit(
      df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10, testPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct > 0 && testPct > 0 &&
      trainPct + valPct + testPct == 100,
      s"split percentages must be positive and sum to 100, " +
        s"got $trainPct/$valPct/$testPct")
    val bucket = hashBucket(col(idCol), 100L)
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1,
    * behind `t28_gopher_rules`): per document, the named-rule
    * booleans — word count in [minTokens, maxTokens], mean word
    * length in [minMeanLen, maxMeanLen] (cross-multiplied integer
    * compare, never a division), ≥ minStops stopwords, top-bigram
    * fraction ≤ maxBigramPctx100/100 — plus `kept`, their
    * conjunction. Three rules are a narrow map; the repetition rule
    * is two doc-keyed aggregates. Single-token docs have no bigrams:
    * left join + null-safe pass.
    */
  def withGopherRules(
      df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      minTokens: Long = 20, maxTokens: Long = 200,
      minMeanLen: Long = 4, maxMeanLen: Long = 10,
      minStops: Long = 2, maxBigramPctx100: Long = 8): DataFrame = {
    val t = df.select(col(idCol), split(col(textCol), " ").as("w"))
    val base = t.select(col(idCol),
      size(col("w")).cast("long").as("n"),
      expr("aggregate(transform(w, x -> CAST(length(x) AS BIGINT))," +
        " 0L, (a, x) -> a + x)").as("chars"),
      expr("CAST(size(filter(w," +
        " x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)")
        .as("stops"))
    val bg = t.filter(size(col("w")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("b"))
    val bm = bg.groupBy(col(idCol), col("b.w1"), col("b.w2"))
      .agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max("c").as("mx"), sum("c").as("nb"))
    base.join(bm, Seq(idCol), "left")
      .select(col(idCol), col("n"), col("chars"), col("stops"),
        (col("n") >= minTokens && col("n") <= maxTokens)
          .as("r_word_count"),
        (col("chars") >= col("n") * minMeanLen
          && col("chars") <= col("n") * maxMeanLen)
          .as("r_mean_word_len"),
        (col("stops") >= minStops).as("r_stopwords"),
        (col("mx").isNull
          || col("mx") * 100 <= col("nb") * maxBigramPctx100)
          .as("r_top_bigram"))
      .withColumn("kept",
        col("r_word_count") && col("r_mean_word_len")
          && col("r_stopwords") && col("r_top_bigram"))
  }

  /** The REPETITION half of the Gopher rules (Rae et al. 2021 §A1.1)
    * t28's top-bigram rule only samples: per document, the character
    * mass of the single most frequent word n-gram for n = 2, 3, 4
    * (`top{n}_ppm`), and the character mass of ALL duplicated word
    * n-grams for n = 5, 6 (`dup{n}_ppm`), each as exact ppm of the
    * document's word characters, gated at the published thresholds
    * (top: 20/18/16%, dup: 15/14%).
    *
    * Exact-integer conventions (what makes this oracle-checkable):
    * characters of one n-gram occurrence = the sum of its word
    * lengths (separators excluded — computed as length of the
    * joined gram minus n−1); occurrences count OVERLAPPING positions
    * (the sliding window, the published definition); the duplicate
    * mass counts every occurrence of every gram with count ≥ 2
    * WITHOUT position-overlap dedup (the standard reimplementation
    * convention — Dolma/NeMo do the same — so a heavily repeated
    * long document can exceed 1e6 ppm; the ≤ gates judge it
    * correctly). The top-gram tie rule is: highest count, then
    * highest character mass — encoded as max(count·10⁵ + mass),
    * exact because a document's gram mass is < 10⁵ at the 200-token
    * cap upstream of this filter.
    *
    * Scale shape: one n-gram explode per n (5 total), each a
    * map-side-combinable (doc, gram) count aggregate then a doc
    * aggregate — no windows, no cross-doc work.
    */
  def withRepetitionRules(
      df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      topPpm: Map[Int, Long] = Map(2 -> 200000L, 3 -> 180000L,
        4 -> 160000L),
      dupPpm: Map[Int, Long] = Map(5 -> 150000L, 6 -> 140000L))
      : DataFrame = {
    val t = df.select(col(idCol), split(col(textCol), " ").as("w"))
    val chars = t.select(col(idCol),
      expr("aggregate(transform(w, x -> CAST(length(x) AS BIGINT))," +
        " 0L, (a, x) -> a + x)").as("chars"))

    def grams(n: Int) = t.filter(size(col("w")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n)))")).as("g"))
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"),
        (length(col("g")) - (n - 1)).cast("long").as("len"))

    def topMass(n: Int) = grams(n)
      .groupBy(idCol)
      .agg(max(col("c") * 100000L + col("c") * col("len")).as("k"))
      .select(col(idCol), (col("k") % 100000L).as(s"top${n}_mass"))

    def dupMass(n: Int) = grams(n)
      .filter(col("c") >= 2)
      .groupBy(idCol)
      .agg(sum(col("c") * col("len")).as(s"dup${n}_mass"))

    val joined = Seq(topMass(2), topMass(3), topMass(4),
      dupMass(5), dupMass(6))
      .foldLeft(chars)((acc, m) => acc.join(m, Seq(idCol), "left"))
    // `div`, never `/`: long / long is a DOUBLE division in Spark and
    // a 53-bit mantissa rounding away from the oracle's exact `//`
    val withPpm = joined.select(col(idCol) +: col("chars") +: (
      Seq(2, 3, 4).map(n =>
        expr(s"coalesce(top${n}_mass, 0L) * 1000000L div chars")
          .as(s"top${n}_ppm")) ++
      Seq(5, 6).map(n =>
        expr(s"coalesce(dup${n}_mass, 0L) * 1000000L div chars")
          .as(s"dup${n}_ppm"))): _*)
    Seq(2, 3, 4).map(n => (s"r_top$n",
        col(s"top${n}_ppm") <= topPpm(n))) ++
      Seq(5, 6).map(n => (s"r_dup$n", col(s"dup${n}_ppm") <= dupPpm(n)))
      match {
        case rules =>
          val flagged = rules.foldLeft(withPpm) { case (acc, (nm, c)) =>
            acc.withColumn(nm, c)
          }
          flagged.withColumn("rep_kept",
            rules.map(r => col(r._1)).reduce(_ && _))
      }
  }
}
