package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming ANN-ingest candidate gate — the streaming twin of
  * [[graft.operators.KnnBeam.insertBatch]]'s batch-vs-index LSH join,
  * for growing a vector index from an unbounded stream: an arriving
  * vector emits a verified candidate edge (exact cosine, Hamming-gated)
  * against every EARLIER-admitted vector sharing one of its SRP band
  * buckets.
  *
  * The signature derivation is [[graft.operators.SemanticDedup]]'s
  * `withSrp` — the exact expression the batch index uses, legal here
  * because it is a stateless narrow map (the [[StreamingNearDup]]
  * round-6 precedent). Banding is the FIXED 4×8-bit scheme: the
  * adaptive width the batch build sizes from a corpus count has no
  * streaming analog (no count on an unbounded stream), so — like
  * [[StreamingEntityMatch]] — the state-size/selectivity contract is
  * enforced by a LOUD `maxResidents` cap per bucket instead: a stream
  * whose bucket outgrows it needs the batch path (or a re-banded
  * gate), not silent per-arrival O(residents²) degradation.
  *
  * State: per (band, bucket), the admitted residents' (id, srp,
  * vector) — the O(admitted × bands) index fingerprint an
  * ingest-time ANN service keeps by definition (RocksDB at scale).
  * Each arrival verifies against residents IN THE STATE FUNCTION
  * (exact cosine, the same sequential-double accumulation as the
  * codegen'd [[graft.functions.VectorExprs.cosine_similarity]], so
  * emitted scores are bit-identical to the batch scorer's), then
  * admits itself. Determinism: within a micro-batch, arrivals process
  * in vec_id order.
  *
  * Emissions are PER-BUCKET candidates: a pair colliding in k bands
  * emits k times (with the band attached) — exactly the multiplicity
  * the batch banded join produces before its `distinct()`; consumers
  * dedupe on (lo, hi) and cut to graphDegree downstream, where the
  * per-node global view exists. [[StreamingKnnIngestSpec]] pins
  * SET-parity of the deduped pairs (and their cosines) against the
  * batch `insertBatch` candidate stage on a replayed corpus.
  */
object StreamingKnnIngest {

  case class BandRow(
      vec_id: Long, srp: Long, band: Int, bv: Int, vec: Seq[Float])
  case class CandEdge(
      vec_id: Long, nbr: Long, band: Int, hamming: Int, cosine: Double)
  case class BucketState(residents: Seq[(Long, Long, Seq[Float])])

  /** The batch scorer's exact semantics (sequential double over
    * floats) so streaming cosines hash-match batch cosines.
    */
  private[graft] def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = a(i).toDouble; val yi = b(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** (vec_id, srp, band, bv, vec) band rows — batch or streaming. */
  def bandRows(vecs: DataFrame, dims: Int = 64): DataFrame = {
    val sig = graft.operators.SemanticDedup
      .withSrp(vecs, "embedding", dims)
    (0 until 4).map { b =>
      sig.select(F.col("vec_id").cast("long").as("vec_id"),
        F.col("srp"), F.lit(b).as("band"),
        F.shiftright(F.col("srp"), b * 8).bitwiseAND(0xff)
          .cast("int").as("bv"),
        F.col("embedding").as("vec"))
    }.reduce(_ unionByName _)
  }

  /** The stateful gate over a STREAMING (vec_id, embedding) frame. */
  def gate(vecs: DataFrame, dims: Int = 64, maxHamming: Int = 16,
      maxResidents: Int = 256): Dataset[CandEdge] = {
    require(maxResidents >= 1,
      s"StreamingKnnIngest: maxResidents must be >= 1, got $maxResidents")
    require(maxHamming >= 0 && maxHamming <= 32,
      s"StreamingKnnIngest: maxHamming must be in [0, 32], got $maxHamming")
    val session = vecs.sparkSession
    import session.implicits._
    bandRows(vecs, dims).as[BandRow]
      .groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState[BucketState, CandEdge](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state) =>
          val sorted = rows.toSeq.sortBy(_.vec_id)
          val residents = scala.collection.mutable.ArrayBuffer.from(
            state.getOption.map(_.residents).getOrElse(Seq.empty))
          val seen = scala.collection.mutable.HashSet.from(
            residents.iterator.map(_._1))
          val admittedBefore = residents.size
          val out = Seq.newBuilder[CandEdge]
          sorted.foreach { r =>
            if (!seen.contains(r.vec_id)) { // replay guard, O(1)
              residents.foreach { case (rid, rsrp, rvec) =>
                val ham = java.lang.Long.bitCount(rsrp ^ r.srp)
                if (ham <= maxHamming)
                  out += CandEdge(r.vec_id, rid, band, ham,
                    cosine(r.vec, rvec))
              }
              if (residents.size >= maxResidents)
                throw new IllegalStateException(
                  s"StreamingKnnIngest: bucket (band=$band) outgrew " +
                    s"maxResidents=$maxResidents — the fixed 8-bit " +
                    "band space cannot absorb this stream; move to " +
                    "the batch adaptive-band index (KnnBeam." +
                    "insertBatch) or raise the cap deliberately")
              seen += r.vec_id
              residents += ((r.vec_id, r.srp, r.vec))
            }
          }
          if (residents.size != admittedBefore)
            state.update(BucketState(residents.toSeq))
          out.result().iterator
      }
  }
}
