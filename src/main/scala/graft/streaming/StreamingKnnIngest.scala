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
  case class BandRowTs(
      vec_id: Long, srp: Long, band: Int, bv: Int, vec: Seq[Float],
      ts: java.sql.Timestamp)
  /** Residents carry their admission event time for horizon eviction:
    * (vec_id, srp, vec, tsMillis).
    */
  case class BucketStateTs(
      residents: Seq[(Long, Long, Seq[Float], Long)])

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

  /** The SLIDING-HORIZON variant of [[gate]] — the round-14 verdict's
    * unbounded-state fix ([[gate]] keeps buckets forever, so state
    * grows with distinct buckets over an unbounded stream): an
    * arrival emits candidate edges only against residents admitted
    * AT OR BEFORE it and within `horizon` of its event time (checked
    * inline, so correctness never depends on timer latency — the
    * [[StreamingNearDup.gateWithHorizon]] owner-age semantic applied
    * per resident), and residents whose horizon has passed the
    * watermark are EVICTED — state is O(vectors admitted within the
    * horizon × bands), which is what lets an ingest-time ANN gate
    * run forever when index identity ages out (recency-windowed
    * retrieval, crawl freshness tiers).
    *
    * Per-resident aging, not per-bucket: a bucket holds a LIST of
    * residents, each admitted at its own event time, so pruning drops
    * individual residents (resident.ts + horizon < watermark — they
    * can never match a future ≥-watermark arrival) while the bucket's
    * younger residents keep matching. The EventTimeTimeout is armed
    * to the OLDEST live resident's horizon (re-armed every
    * invocation — fMGWS clears a group's timer whenever its function
    * runs); on firing, expired residents drop and the bucket removes
    * itself when empty. An arrival that PRECEDES a resident in event
    * time (out-of-order within lateness) simply does not match it —
    * the earlier vector is its own entity and admits itself.
    * `maxResidents` caps LIVE residents (aged-out ones free
    * capacity); replay of a live resident is ignored, replay of an
    * evicted one re-admits (at-least-once, the NearDup re-claim
    * behavior). Input needs an event-time `ts` column with a
    * watermark already applied.
    */
  def gateWithHorizon(
      vecs: DataFrame,
      horizon: java.time.Duration,
      dims: Int = 64, maxHamming: Int = 16,
      maxResidents: Int = 256): Dataset[CandEdge] = {
    require(maxResidents >= 1,
      s"StreamingKnnIngest: maxResidents must be >= 1, got $maxResidents")
    require(maxHamming >= 0 && maxHamming <= 32,
      s"StreamingKnnIngest: maxHamming must be in [0, 32], got $maxHamming")
    val horizonMs = horizon.toMillis
    require(horizonMs > 0, "horizon must be positive")
    val session = vecs.sparkSession
    import session.implicits._
    import org.apache.spark.sql.streaming.GroupState
    val sig = graft.operators.SemanticDedup
      .withSrp(vecs, "embedding", dims)
    (0 until 4).map { b =>
      sig.select(F.col("vec_id").cast("long").as("vec_id"),
        F.col("srp"), F.lit(b).as("band"),
        F.shiftright(F.col("srp"), b * 8).bitwiseAND(0xff)
          .cast("int").as("bv"),
        F.col("embedding").as("vec"), F.col("ts"))
    }.reduce(_ unionByName _)
      .as[BandRowTs]
      .groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState[BucketStateTs, CandEdge](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), rows, state: GroupState[BucketStateTs]) =>
          val wm = state.getCurrentWatermarkMs()
          def live(rs: Seq[(Long, Long, Seq[Float], Long)]) =
            rs.filter(_._4 + horizonMs >= wm)
          def rearm(rs: Seq[(Long, Long, Seq[Float], Long)]): Unit =
            if (rs.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rs.map(_._4).min + horizonMs, wm + 1))
          if (state.hasTimedOut) {
            val kept = live(state.getOption
              .map(_.residents).getOrElse(Seq.empty))
            if (kept.isEmpty) state.remove()
            else { state.update(BucketStateTs(kept)); rearm(kept) }
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id))
            val before = state.getOption
              .map(_.residents).getOrElse(Seq.empty)
            val residents = scala.collection.mutable.ArrayBuffer
              .from(live(before)) // inline prune: expired can never match
            val seen = scala.collection.mutable.HashSet.from(
              residents.iterator.map(_._1))
            val out = Seq.newBuilder[CandEdge]
            sorted.foreach { r =>
              if (!seen.contains(r.vec_id)) { // replay guard, O(1)
                val t = r.ts.getTime
                residents.foreach { case (rid, rsrp, rvec, rts) =>
                  // owner-age per resident: admitted at or before the
                  // arrival, within horizon
                  if (rts <= t && t - rts <= horizonMs) {
                    val ham = java.lang.Long.bitCount(rsrp ^ r.srp)
                    if (ham <= maxHamming)
                      out += CandEdge(r.vec_id, rid, band, ham,
                        cosine(r.vec, rvec))
                  }
                }
                if (residents.size >= maxResidents)
                  throw new IllegalStateException(
                    s"StreamingKnnIngest: bucket (band=$band) holds " +
                      s"$maxResidents LIVE residents — the fixed " +
                      "8-bit band space cannot absorb this stream " +
                      "within the horizon; move to the batch " +
                      "adaptive-band index (KnnBeam.insertBatchIndexed)" +
                      " or raise the cap deliberately")
                seen += r.vec_id
                residents += ((r.vec_id, r.srp, r.vec, t))
              }
            }
            val now = residents.toSeq
            if (now != before) state.update(BucketStateTs(now))
            rearm(now) // RE-ARM every invocation (fMGWS clears timers)
            out.result().iterator
          }
      }
  }
}
