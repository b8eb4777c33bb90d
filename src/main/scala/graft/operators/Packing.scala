package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window chunking and training-bin packing as a
  * DataFrame-first library API — the stage between a curated corpus
  * and a token-budgeted training run.
  *
  * `chunk` is a zero-shuffle explode: each document becomes
  * ⌈tokens/chunkTokens⌉ rows carrying the chunk's text. `packBins`
  * assigns chunks to fixed-budget bins SHARD-LOCALLY: a deterministic
  * hash shard per document, a running-sum window inside each shard —
  * never the single-partition global window that cannot exist at
  * 100 TB. A bin's token total can exceed the budget by at most
  * chunkTokens - 1 (the straddling chunk), which is the bound a
  * packing consumer pads against.
  *
  * The oracle-verified t12/t14 queries delegate here, so the API and
  * the DuckDB oracles share one set of expressions.
  */
object Packing {

  /** (idCol, chunk_id, chunk_tokens, chunk_text) — fixed-size token
    * chunks per document, in order.
    */
  def chunk(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 64): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be positive, got $chunkTokens")
    val k = chunkTokens
    // null text coalesces to "" (one 1-token chunk of the empty
    // string) — explode over a null array would silently DROP the
    // document, and "every document appears" is the contract
    // downstream token accounting reconciles against
    // Column API, not expr(s"...") splices — robust to any column
    // name a caller passes (backtick-needing names included)
    val chunkSlice = slice(col("__w"), col("chunk_id") * k + 1, lit(k))
    df.withColumn("__w", split(coalesce(col(textCol), lit("")), " "))
      .withColumn("chunk_id",
        explode(sequence(lit(0),
          floor((size(col("__w")) - 1) / lit(k.toDouble)).cast("int"))))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        size(chunkSlice).cast("long").as("chunk_tokens"),
        concat_ws(" ", chunkSlice).as("chunk_text"))
  }

  /** (idCol, chunk_id, offset, chunk_tokens, chunk_text) —
    * OVERLAPPING sliding-window chunks: chunk i covers tokens
    * [i·stride, i·stride + k), the RAG/long-context convention where
    * consecutive chunks share k − stride tokens so no span of
    * context is ever split across a hard boundary. `stride ≤ k`
    * (a larger stride would silently DROP tokens between windows);
    * `stride = k` degenerates to [[chunk]]'s disjoint windows. A
    * document of ≤ k tokens yields exactly one chunk; otherwise
    * 1 + ⌈(n − k)/stride⌉ in exact integer arithmetic. Same
    * zero-shuffle per-row explode shape as [[chunk]].
    */
  def chunkOverlap(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be positive, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in 1..$chunkTokens, got $stride")
    val k = chunkTokens
    val chunkSlice = slice(col("__w"), col("chunk_id") * stride + 1, lit(k))
    df.withColumn("__w", split(coalesce(col(textCol), lit("")), " "))
      .withColumn("__last",
        when(size(col("__w")) <= k, lit(0))
          .otherwise(expr(
            s"(size(__w) - $k + $stride - 1) div $stride").cast("int")))
      .withColumn("chunk_id", explode(sequence(lit(0), col("__last"))))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride).cast("long").as("offset"),
        size(chunkSlice).cast("long").as("chunk_tokens"),
        concat_ws(" ", chunkSlice).as("chunk_text"))
  }

  /** Adds (shard, bin) to a chunk frame: documents hash to one of
    * `shards` deterministic shards, and each shard's chunks pack
    * greedily (in (idCol, chunk_id) order) into bins of `binTokens`.
    */
  def packBins(
      chunks: DataFrame,
      idCol: String = "doc_id",
      shards: Int = 8,
      binTokens: Int = 2048): DataFrame = {
    require(shards >= 1, s"shards must be positive, got $shards")
    require(binTokens >= 1, s"binTokens must be positive, got $binTokens")
    val w = Window.partitionBy("shard")
      .orderBy(col(idCol), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("shard",
        pmod(graft.functions.PortableHash.saltedHash(
          5, col(idCol).cast("string")), lit(shards.toLong)))
      .withColumn("__cum", sum("chunk_tokens").over(w))
      // floor(x / b) == x div b for the non-negative running sums here
      .withColumn("bin",
        floor((col("__cum") - col("chunk_tokens")) / lit(binTokens.toDouble))
          .cast("long"))
      .drop("__cum")
  }
}
