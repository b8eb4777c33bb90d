package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) dedup as a DataFrame-first library API —
  * NearDup's twin for the vector side, over a consumer's OWN
  * embeddings. The candidate stage is signed-random-projection LSH:
  * corpus-independent ±1 hyperplanes (derived from md5, so
  * deterministic everywhere) give each vector a 32-bit sign signature
  * in one narrow map — no training, no corpus statistics, no grid —
  * then banded bit-space retrieval (4 bands × 8 bits) finds candidates
  * with an equi-join, never an all-pairs scan. Verification is exact
  * cosine via the codegen'd CosineSimilarity expression; clustering is
  * the same pointer-jumping components loop the text side uses.
  *
  * Input contract: `idCol` unique long, `vecCol` a fixed-length
  * numeric array of exactly `dims` components.
  */
object SemanticDedup {

  private def normalized(
      emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).as("embedding"))

  /** (vec_id, srp) — the 32-bit sign signature per vector.
    *
    * A vector whose length differs from `dims` fails the job with a
    * clear error. Silently proceeding would be catastrophic, not just
    * wrong: zip_with pads the shorter side with nulls, every dot
    * product goes null, every signature degenerates to 0, and the
    * "candidate" stage becomes an all-pairs cross join with bogus
    * hamming=0 — the exact blow-up this operator exists to avoid.
    */
  def signatures(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    require(dims >= 1, s"dims must be positive, got $dims")
    // coalesce inside the message: for a NULL vector, size() is null
    // and null-rejecting concat would turn the whole diagnostic into
    // raise_error(NULL) — a message-less failure
    val checked = emb.withColumn(vecCol,
      when(size(col(vecCol)) === dims, col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"SemanticDedup: expected $dims-dimension vectors " +
            s"(the dims argument), found length "),
          coalesce(size(col(vecCol)).cast("string"),
            lit("null (missing vector)"))))))
    rawSignatures(checked, idCol, vecCol, dims)
  }

  /** Deterministic ±1 hyperplane component for plane `i`, dimension
    * `j`: parity of the first hex digit of md5("i:j") — reproducible
    * by any engine with an MD5 function, which is what makes the
    * signature oracle-checkable.
    */
  private def srpSign(i: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$i:$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 0) 1L else -1L
  }

  /** 32-bit SRP signatures without the dims guard: quantize each
    * component to floor(x*1000) (exact in both engines; integer sums
    * have no float association hazard), dot against each ±1 plane,
    * take sign bits. One narrow map over the corpus — no shuffle, no
    * state. The oracle-verified s7 query reads through this same
    * definition.
    */
  private[graft] def rawSignatures(
      embDf: DataFrame, idCol: String, vecCol: String,
      dims: Int): DataFrame =
    withSrp(embDf, vecCol, dims)
      .select(col(idCol).cast("long").as("vec_id"), col("srp"))

  /** [[signatures]] keeping the vector column — the band-index rows
    * (KnnBeam.buildBandIndex) embed the vector beside the signature so
    * candidate SCORING never rejoins the corpus. Same dims validation,
    * same srp expression: one signature semantics.
    */
  private[graft] def signaturesWithVec(
      emb: DataFrame, idCol: String, vecCol: String,
      dims: Int): DataFrame = {
    val checked = emb.withColumn(vecCol,
      when(size(col(vecCol)) === dims, col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"SemanticDedup: expected $dims-dimension vectors " +
            s"(the dims argument), found length "),
          coalesce(size(col(vecCol)).cast("string"),
            lit("null (missing vector)"))))))
    withSrp(checked, vecCol, dims)
      .select(col(idCol).cast("long").as("vec_id"), col("srp"),
        col(vecCol).as("vec"))
  }

  /** Adds the 32-bit `srp` column to ANY frame with a `vecCol` vector
    * column, keeping every other column — a stateless narrow map, so
    * it is legal on an unbounded STREAM (the StreamingKnnIngest gate
    * reads through this same definition the batch index uses, the
    * StreamingNearDup precedent for MinHash).
    */
  private[graft] def withSrp(
      embDf: DataFrame, vecCol: String, dims: Int): DataFrame = {
    // Column-based HOF, not expr(s"transform($vecCol, ...)"): splicing
    // a caller-supplied column name into SQL text breaks (or resolves
    // the wrong attribute) when the name needs backticks
    val qv = transform(col(vecCol),
      x => floor(x.cast("double") * 1000).cast("long"))
    // project the quantized vector ONCE; 32 plane aggregates read the
    // projected column instead of re-evaluating the transform each
    val srp = (0 until 32).map { i =>
      val signs = array((0 until dims).map(j => lit(srpSign(i, j))): _*)
      val dot = aggregate(
        zip_with(col("__sd_qv"), signs, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    embDf.withColumn("__sd_qv", qv)
      .withColumn("srp", srp)
      .drop("__sd_qv")
  }

  /** (vec_a, vec_b, hamming) — banded signature collisions within
    * `maxHamming` bits. By pigeonhole, any pair within Hamming
    * distance 3 of the 32-bit signature agrees on at least one whole
    * 8-bit band, so recall is structural up to that distance.
    */
  def candidatePairs(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxHamming: Int = 10): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 32,
      s"maxHamming must be in [0, 32], got $maxHamming")
    val sig = signatures(emb, idCol, vecCol, dims).localCheckpoint(true)
    // the full signature rides along in the band rows, so the
    // verification XOR needs no join-back against sig — the two
    // re-fetch joins that would otherwise shuffle the candidate set
    // twice more are the avoidable cost in this hot path
    val bands = (0 until 4).map { b =>
      sig.select(col("vec_id"), col("srp"), lit(b).as("band"),
        shiftright(col("srp"), b * 8).bitwiseAND(0xff).as("bv"))
    }.reduce(_.unionByName(_))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.srp").as("fa"), col("y.srp").as("fb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("vec_a", "vec_b", "hamming")
  }

  /** (vec_a, vec_b, hamming, cosine) — candidates verified by exact
    * cosine similarity ≥ `minCosine`. The embedding join is an
    * equi-join on the candidate ids, so only candidate vectors are
    * ever fetched.
    */
  def verifiedPairs(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxHamming: Int = 10,
      minCosine: Double = 0.35): DataFrame = {
    require(minCosine >= -1.0 && minCosine <= 1.0,
      s"minCosine must be in [-1, 1], got $minCosine")
    val e = normalized(emb, idCol, vecCol)
    candidatePairs(emb, idCol, vecCol, dims, maxHamming)
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("qv")),
        Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("nv")),
        Seq("vec_b"))
      .withColumn("cosine",
        graft.functions.VectorExprs.cosine_similarity(col("qv"), col("nv")))
      .filter(col("cosine") >= minCosine)
      .select("vec_a", "vec_b", "hamming", "cosine")
  }

  /** (vec_id, component) for every vector in a semantic-dup cluster;
    * component = the cluster's minimum vec id (its canonical vector).
    */
  def clusters(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      maxHamming: Int = 10,
      minCosine: Double = 0.35): DataFrame = {
    val edges = verifiedPairs(emb, idCol, vecCol, dims, maxHamming, minCosine)
      .select("vec_a", "vec_b")
    ConnectedComponents.run(edges, "vec_a", "vec_b")
      .select(col("id").as("vec_id"), col("component"))
  }
}
