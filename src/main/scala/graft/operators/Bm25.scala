package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical ranking as a DataFrame-first library API (Robertson &
  * Zaragoza 2009) — the retrieval scorer behind `t25_bm25_topk`,
  * usable against any (id, text) corpus.
  *
  * Scoring is EXACT int64 arithmetic (see the t25 derivation): the
  * k1 = 1.2, b = 0.75 term saturation is cleared of floats by
  * multiplying through by 10·L (L = total corpus tokens, avgdl = L/N):
  *
  *   tf_q  = 22·tf·L·1e6  div (10·L·tf + 3·L + 9·dl·N)
  *   idf_q = (2·(N−df)+1)·1e6 div (2·df+1)
  *
  * and a document's score is Σ idf_q·tf_q over the query terms it
  * contains. Integer scoring is what makes the ranking reproducible
  * across engines, runs, and partitionings — a float Σ would tie-break
  * differently under reassociation.
  *
  * Plan shape: term frequencies filter to the query terms BEFORE the
  * aggregate (the doc-term table never materializes for non-query
  * tokens), document frequencies and the (N, L) scalars broadcast,
  * and `topK` compiles to TakeOrderedAndProject — per-partition
  * partial top-k merged on the driver, never a full sort.
  */
object Bm25 {

  /** Per-document BM25 scores for `terms` over `docs(idCol, textCol)`:
    * (idCol, dl, n_hit, bm25_q) for every document matching at least
    * one term. Tokenization is whitespace — pre-tokenize upstream for
    * anything richer.
    */
  def score(
      docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "empty query-term set")
    val base = docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), col("w"), size(col("w")).cast("long").as("dl"))
    val corpus = base
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("l_total"))
    val tf = base
      .select(col(idCol), col("dl"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf_q",
        expr("(2L * (n_docs - df) + 1L) * 1000000L div (2L * df + 1L)"))
      .withColumn("tf_q",
        expr("22L * tf * l_total * 1000000L div " +
          "(10L * l_total * tf + 3L * l_total + 9L * dl * n_docs)"))
      .groupBy(col(idCol), col("dl"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("idf_q * tf_q")).as("bm25_q"))
  }

  /** Top-`k` documents by score, ties broken by id — distributed
    * top-k (TakeOrderedAndProject), never a global sort.
    */
  def topK(
      docs: DataFrame, terms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    score(docs, terms, idCol, textCol)
      .orderBy(col("bm25_q").desc, col(idCol))
      .limit(k)
  }
}
