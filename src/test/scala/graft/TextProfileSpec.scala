package graft

import graft.operators.TextProfile
import org.apache.spark.sql.functions._

/** The TextProfile library API: planted-text behavior for each
  * profiling column and the split invariants. Oracle parity for the
  * same expressions is carried by t1/t2/t3/t7/t4, which delegate here.
  */
class TextProfileSpec extends SparkSpecBase {

  private def doc(id: Long, text: String) = (id, text)

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("token stats count whitespace tokens, word tokens, and chars") {
    val r = TextProfile.withTokenStats(df(doc(1, "the cat, 42 times!")))
      .select("n_tokens", "n_word_tokens", "len_chars").head()
    assert(r.getLong(0) == 4)   // whitespace tokens
    assert(r.getLong(1) == 4)   // the, cat, 42, times
    assert(r.getLong(2) == 18)
  }

  test("quality stats expose stopword and punctuation densities") {
    val r = TextProfile
      .withQualityStats(df(doc(1, "the fish and the net.")))
      .select("n_tokens", "stop_hits", "punct_chars", "stop_ratio").head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 0.6)
  }

  test("language votes pick the dominant stopword family; CJK wins outright") {
    val out = TextProfile.withLangGuess(df(
        doc(1, "der Hund und die Katze ist da"),
        doc(2, "the cat of the house went to sleep in peace"),
        doc(3, "el mar y los barcos y las olas"),
        doc(4, "text with 漢字 characters")))
      .select("doc_id", "lang_guess").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "de", 2L -> "en", 3L -> "es", 4L -> "zh"))
  }

  test("null text gets a null language, not a confident French label") {
    import spark.implicits._
    val out = TextProfile.withLangGuess(
        Seq((1L, null), (2L, "le chat est sur le toit et les murs"))
          .toDF("doc_id", "text"))
      .select("doc_id", "lang_guess").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> None, 2L -> Some("fr")))
  }

  test("repetition ratio measures duplicate bigrams") {
    val r = TextProfile.withRepetition(df(doc(1, "a b a b a b")))
      .select("n_grams", "n_distinct", "rep_ratio").head()
    // bigrams: "a b","b a","a b","b a","a b" → 5 total, 2 distinct
    assert(r.getLong(0) == 5 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.6)
  }

  test("hash split assigns every row deterministically and validates input") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextProfile.hashSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TextProfile.hashSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b && a.values.sum == docs.count())
    assert(a.keySet == Set("train", "val", "test"))
    intercept[IllegalArgumentException] {
      TextProfile.hashSplit(docs, trainPct = 90, valPct = 15, testPct = 10)
    }
  }

  test("profiling columns compose into one narrow pass") {
    val composed = TextProfile.withRepetition(
      TextProfile.withLangGuess(
        TextProfile.withTokenStats(df(doc(1, "the cat and the cat")))))
    assert(!composed.queryExecution.executedPlan.toString.contains("Exchange"),
      "profiling must stay shuffle-free")
    val r = composed
      .select("n_tokens", "lang_guess", "rep_ratio").head()
    assert(r.getLong(0) == 5 && r.getString(1) == "en")
  }

  test("gopher rules: each threshold is a live knob and kept is the " +
      "conjunction; a single-token doc passes the bigram rule") {
    // 5 tokens, one stopword, mean word length 3.0
    val corpus = df(doc(1, "the cat ate the cat"), doc(2, "x"))
    val strict = TextProfile.withGopherRules(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: n=5 < 20 → r_word_count false → kept false
    assert(!strict(1L).getAs[Boolean]("r_word_count"))
    assert(!strict(1L).getAs[Boolean]("kept"))
    // doc 2 (single token): no bigrams → null-safe bigram pass
    assert(strict(2L).getAs[Boolean]("r_top_bigram"))
    val relaxed = TextProfile.withGopherRules(corpus,
        minTokens = 1, maxTokens = 100, minMeanLen = 1, maxMeanLen = 10,
        minStops = 1, maxBigramPctx100 = 100).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(relaxed(1L).getAs[Boolean]("kept"))
    // doc 2 still fails the stopword rule even fully relaxed on size
    assert(!relaxed(2L).getAs[Boolean]("kept"))
  }

  test("bm25: tf monotone at equal length, non-matching docs absent, " +
      "topK returns the best") {
    val corpus = df(
      doc(1, "x x a b c"), // tf=2
      doc(2, "x a b c d"), // tf=1
      doc(3, "a b c d e")) // no match
    val scored = graft.operators.Bm25.score(corpus, Seq("x")).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored.keySet == Set(1L, 2L))
    assert(scored(1L) > scored(2L), scored)
    val top = graft.operators.Bm25.topK(corpus, Seq("x"), k = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L))
  }
}
