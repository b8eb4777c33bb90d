package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned byte-pair encoding (Sennrich, Haddow & Birch 2016) — real
  * tokenizer TRAINING, the first-class LLM-pipeline stage t17's
  * pre-tokenization stops short of. Classic BPE over the word
  * vocabulary: start from characters (+ an end-of-word marker), and
  * per round (a) count adjacent symbol pairs weighted by word
  * frequency, (b) merge the most frequent pair everywhere it occurs,
  * greedily left-to-right.
  *
  * Determinism is what makes training oracle-checkable (the PageRank
  * fixed-unroll pattern): ties in the pair statistics break to the
  * lexicographically smallest (left, right), and the merge APPLY is
  * the exact greedy-left scan — in a run of identical symbols
  * `a a a a` the merges land at offsets 0 and 2 (`aa aa`), never the
  * overlapping middle. DuckDB replays identical rounds as CTEs
  * (pair-count aggregate → argmax → gaps-and-islands parity pick of
  * greedy positions) and must byte-match the merge table AND every
  * tokenized length.
  *
  * Scale shape: the only corpus-sized work is ONE word-frequency
  * aggregate (map-side combinable). Everything per-round operates on
  * the DISTINCT-WORD vocabulary — orders of magnitude smaller than
  * the corpus — with a map-side-combinable pair-count aggregate and a
  * narrow zero-shuffle merge pass (a Catalyst `aggregate` fold, no
  * UDF); per round exactly one merge row reaches the driver.
  * Tokenized lengths then come from joining the trained
  * (word → n_symbols) vocabulary onto the corpus words UNHINTED —
  * AQE broadcasts it while it fits (vocabulary is Heaps-law
  * sublinear but unbounded at 100 TB, so the hint is the
  * optimizer's call) — and the corpus is never re-segmented
  * char-by-char.
  */
object Bpe {

  /** One learned merge rule, in training order. */
  final case class Merge(
      round: Long, left_sym: String, right_sym: String, pair_count: Long)

  val EndMark = "</w>"

  /** Corpus word frequencies — the single corpus-sized aggregate.
    * Tokenization is the repo-wide single-space convention (t5). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** (word, freq, s): initial symbol sequences — characters plus the
    * end-of-word marker that lets word-final merges learn separately
    * from word-internal ones (the Sennrich convention). */
  def initVocab(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      concat(split(col("word"), ""), array(lit(EndMark))).as("s"))

  /** ONE greedy-left merge pass of (l, r) over a symbol array — a
    * pure Catalyst `aggregate` fold (no UDF): scan positions once,
    * merging a match and skipping the consumed successor, so
    * overlapping matches in identical-symbol runs resolve exactly as
    * sequential BPE does. Zero-shuffle narrow expression.
    */
  def mergePass(s: Column, l: Column, r: Column): Column =
    aggregate(
      sequence(lit(0), size(s) - 1),
      struct(typedLit(Seq.empty[String]).as("out"), lit(false).as("skip")),
      (acc, i) => {
        val out = acc.getField("out")
        val hit = (i < size(s) - 1) &&
          element_at(s, i + 1) === l && element_at(s, i + 2) === r
        when(acc.getField("skip"),
            struct(out.as("out"), lit(false).as("skip")))
          .when(hit,
            struct(concat(out, array(concat(l, r))).as("out"),
              lit(true).as("skip")))
          .otherwise(
            struct(concat(out, array(element_at(s, i + 1))).as("out"),
              lit(false).as("skip")))
      },
      acc => acc.getField("out"))

  /** Adjacent-pair statistics over the vocab, frequency-weighted —
    * counts EVERY adjacent occurrence (zip semantics, the classic
    * get_stats), map-side combinable. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), explode(arrays_zip(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1))).as("p"))
      .select(col("p").getField("0").as("l"),
        col("p").getField("1").as("r"), col("freq"))
      .groupBy("l", "r").agg(sum("freq").as("cnt"))

  /** Train `rounds` merges on the corpus. Returns the ordered merge
    * table and the final segmented vocabulary (word, freq, s).
    * Stops early if the vocabulary runs out of pairs.
    */
  def train(
      docs: DataFrame, textCol: String = "text",
      rounds: Int = 8): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, s"rounds must be positive: $rounds")
    var vocab = initVocab(wordCounts(docs, textCol)).localCheckpoint(true)
    val merges = scala.collection.mutable.Buffer[Merge]()
    var exhausted = false
    for (k <- 1 to rounds if !exhausted) {
      // argmax with the deterministic (cnt desc, l, r) tie-break —
      // one single-row collect per round (the merge decision is
      // inherently sequential; everything around it is distributed)
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(k.toLong, l, r, cnt)
        // eager checkpoint: bounds lineage AND materializes the round
        // (vocab is distinct-word-sized — small by construction)
        val prev = vocab
        vocab = vocab
          .withColumn("s", mergePass(col("s"), lit(l), lit(r)))
          .localCheckpoint(true)
        org.apache.spark.sql.graft.bridge.checkpointedRdd(prev)
          .foreach(_.unpersist(blocking = false))
      }
    }
    (merges.toSeq, vocab)
  }

  /** The trained merge table as a DataFrame (round, left_sym,
    * right_sym, pair_count). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Segment arbitrary words (seen or UNSEEN) with an already-trained
    * merge list: the char init plus one `mergePass` per rule, applied
    * in training order — `rounds` narrow zero-shuffle passes.
    */
  def segment(
      words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(
      words.withColumn("s",
        concat(split(col(wordCol), ""), array(lit(EndMark))))) {
      (df, m) =>
        df.withColumn("s",
          mergePass(col("s"), lit(m.left_sym), lit(m.right_sym)))
    }

  /** Per-document token counts under a trained vocabulary: corpus
    * words joined (unhinted — AQE sizes the vocab) to
    * (word → n_symbols) — the corpus is never re-segmented.
    * (doc idCol, n_words, n_tokens.)
    *
    * Words NOT in the training vocabulary are never dropped: the join
    * is a LEFT join, and missed lookups route through [[segment]] —
    * the DISTINCT missing words (a vocabulary-of-misses-sized table,
    * not the corpus) get segmented under the trained `merges` and
    * their sizes joined back, so seen words stay on the broadcast
    * fast path and unseen ones get their exact trained token count.
    * With `merges` omitted the fallback degenerates to the character
    * segmentation (len+1 — exact under an empty rule list, an upper
    * bound otherwise), so callers counting documents beyond the
    * training corpus should pass the trained merge list.
    */
  def tokenCounts(
      docs: DataFrame, vocabFinal: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      merges: Seq[Merge] = Nil): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    // UNHINTED: the trained vocabulary is word-cardinality —
    // Heaps-law sublinear but UNBOUNDED at 100 TB — so AQE decides
    // from file statistics (broadcast while it fits, shuffle past
    // that); a forced hint would pin an unbounded build side
    val joined = words.join(vocabFinal
        .select(col("word"), size(col("s")).cast("long").as("n_sym")),
      Seq("word"), "left")
    val missing = joined.filter(col("n_sym").isNull)
      .select("word").distinct()
    // un-hinted join: the miss table is usually tiny (AQE broadcasts
    // it) but a fully-foreign corpus keeps correctness either way
    val fallback = segment(missing, "word", merges)
      .select(col("word"), size(col("s")).cast("long").as("n_sym_fb"))
    joined.join(fallback, Seq("word"), "left")
      .withColumn("n_sym", coalesce(col("n_sym"), col("n_sym_fb")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_tokens"))
  }
}
