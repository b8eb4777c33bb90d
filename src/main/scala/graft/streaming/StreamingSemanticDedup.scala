package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC (embedding-space) admission gate — the streaming
  * twin of the batch SRP-LSH candidate stage (s7 /
  * `SemanticDedup.candidatePairs`), closing the loop the MinHash gate
  * ([[StreamingNearDup]]) opened: admit a vector into a growing corpus
  * unless one of its SRP bands collides with a vector admitted EARLIER
  * (a previous micro-batch, or a lower vec id within the same batch).
  *
  * The signature derivation is `SemanticDedup.signatures` — the exact
  * corpus-independent ±1-hyperplane expressions the batch side uses,
  * legal on an unbounded stream because they are a stateless per-row
  * narrow map (no training pass, no corpus statistics). The four 8-bit
  * band values are exploded from the one signature pass (a streaming
  * source is not re-scanned per band, unlike the batch union which
  * reads a checkpointed signature table).
  *
  * State shape: one entry per claimed (band, band-value) bucket holding
  * the first admitted vec id AND its 32-bit signature — O(admitted
  * vectors × 4), the corpus fingerprint an embedding-dedup-at-ingest
  * service keeps by definition; no per-pair state. Carrying the owner
  * signature costs 8 bytes per bucket and buys the flag's `hamming`
  * column: the exact owner-vs-arrival bit distance, computed inline, so
  * a consumer can apply the batch side's `maxHamming` policy to the
  * flag stream without any join-back against admitted vectors.
  *
  * Like every LSH stage, band collisions are CANDIDATES: a consumer
  * that needs verified semantic dups re-checks flagged pairs with exact
  * cosine (`VectorExprs.cosine_similarity`) against the named `dup_of`
  * vector — on the flagged subset, not the stream — exactly as d7
  * verifies d4 and s3 verifies s7's bands.
  */
object StreamingSemanticDedup {

  /** One row per (incoming vector, colliding band): the bucket owner it
    * collided with and the exact owner-vs-arrival signature distance.
    */
  case class VecFlag(
      vec_id: Long, band: Int, bv: Int, dup_of: Long, hamming: Int)

  // public: encoder-generated projections cannot access private types
  case class VecBandRow(vec_id: Long, band: Int, bv: Int, srp: Long)
  case class VecBucketState(firstVec: Long, firstSrp: Long)

  /** (vec_id, band, bv, srp) band rows for a (id, vector) frame —
    * batch or streaming. One signature map, bands exploded in-row.
    */
  def bandRows(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64): DataFrame =
    graft.operators.SemanticDedup.signatures(emb, idCol, vecCol, dims)
      .select(col("vec_id"), col("srp"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("srp"), b * 8).bitwiseAND(0xff)
              .cast("int").as("bv"))
        }: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"),
        col("bb.bv").as("bv"), col("srp"))

  /** The stateful gate over a STREAMING (id, vector) frame: emits a
    * [[VecFlag]] per band collision with an earlier vector. Vectors
    * with no emitted flags are novel (admitted); flagged vectors name
    * the bucket's first admitted vector as `dup_of`. Corpus identity is
    * permanent (NoTimeout) — for an aging corpus, the horizon pattern
    * of [[StreamingNearDup.gateWithHorizon]] transplants unchanged.
    */
  def gate(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64): Dataset[VecFlag] = {
    val session = emb.sparkSession
    import session.implicits._
    bandRows(emb, idCol, vecCol, dims).as[VecBandRow]
      .groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState[VecBucketState, VecFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, bv), rows, state) =>
          // vec-id order makes within-batch admission deterministic
          // (micro-batch row order is not)
          val sorted = rows.toSeq.sortBy(_.vec_id)
          val existing = state.getOption
          var first = existing
          val out = Seq.newBuilder[VecFlag]
          sorted.foreach { r =>
            first match {
              case None =>
                first = Some(VecBucketState(r.vec_id, r.srp))
              case Some(f) if f.firstVec == r.vec_id =>
                () // replayed owner: not a collision with itself
              case Some(f) =>
                out += VecFlag(r.vec_id, band, bv, f.firstVec,
                  java.lang.Long.bitCount(f.firstSrp ^ r.srp))
            }
          }
          // collisions don't change the bucket owner — write state
          // only when the bucket is newly claimed
          if (existing.isEmpty) first.foreach(state.update)
          out.result().iterator
      }
  }
}
