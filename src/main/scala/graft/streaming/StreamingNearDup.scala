package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming near-duplicate gate — the streaming twin of the batch
  * MinHash-LSH candidate pipeline (d4), for admitting documents into a
  * growing corpus: an incoming document is flagged when any of its LSH
  * bands collides with a document admitted EARLIER (a previous
  * micro-batch, or a lower doc id within the same batch).
  *
  * The signature/banding derivation is `TextQueries.bandedSignature` —
  * the exact expressions the batch pipeline uses, reusable here
  * verbatim because round 6 made it a stateless per-row map (no
  * explode+groupBy shuffle), which is also what makes it legal on an
  * unbounded stream without a streaming aggregation.
  *
  * State shape: one entry per (band, band-hash) bucket holding the
  * first admitted doc id — O(admitted docs × bands), the corpus
  * fingerprint a dedup-at-ingest service has to keep by definition.
  * It lives in the state store (RocksDB at scale), partitioned by
  * bucket hash; there is no per-pair state and no cross-partition
  * coordination. For sliding-horizon dedup (only suppress dups within
  * N days) swap NoTimeout for a watermark + timeout eviction — corpus
  * identity here is permanent, so the gate keeps buckets forever.
  *
  * Like the batch pipeline, band collisions are CANDIDATES (the LSH
  * false-positive rate applies); a consumer that needs verified
  * near-dups re-checks flagged pairs with exact Jaccard, exactly as d7
  * verifies d4 — on the tiny flagged subset, not the stream.
  */
object StreamingNearDup {

  /** One row per (incoming doc, colliding band). */
  case class BandFlag(doc_id: Long, band: Int, bh: String, dup_of: Long)

  // public: encoder-generated projections cannot access private types
  case class BandRow(doc_id: Long, band: Int, bh: String)
  // just the first-admitted doc: buckets live forever (NoTimeout), so
  // every extra field is paid O(admitted docs × bands) in the state
  // store — a hit counter nobody read used to live here.
  // COMPATIBILITY: dropping that `hits` field changed the state-store
  // encoder schema, so a checkpoint written by a pre-round-6 build
  // cannot be resumed by this one (state-store schema check fails).
  // Restart such a stream from a fresh checkpoint, replaying the
  // source; there is no state-migration path for this gate.
  case class BucketState(firstDoc: Long)

  /** (doc_id, band, bh) banded-signature rows for a (doc_id, text)
    * frame — batch or streaming.
    */
  def bandRows(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.bandedSignature(docs)

  /** The stateful gate over a STREAMING (doc_id, text) frame: emits a
    * BandFlag per band collision with an earlier document. Documents
    * with no emitted flags are novel (admitted); flagged documents
    * name the bucket's first admitted doc as `dup_of`.
    */
  def gate(docs: DataFrame): Dataset[BandFlag] = {
    val session = docs.sparkSession
    import session.implicits._
    bandRows(docs).as[BandRow]
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketState, BandFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, bh), rows, state) =>
          // doc-id order makes within-batch admission deterministic
          // (micro-batch row order is not)
          val sorted = rows.toSeq.sortBy(_.doc_id)
          val existing = state.getOption
          var first = existing.map(_.firstDoc)
          val out = Seq.newBuilder[BandFlag]
          sorted.foreach { r =>
            first match {
              case None =>
                first = Some(r.doc_id)
              case Some(f) if f == r.doc_id =>
                () // replayed first doc: not a collision with itself
              case Some(f) =>
                out += BandFlag(r.doc_id, band, bh, f)
            }
          }
          // collisions don't change the bucket owner — write state
          // only when the bucket is newly claimed (a state-store
          // write per touched bucket per batch is the alternative)
          if (existing.isEmpty) first.foreach(f => state.update(BucketState(f)))
          out.result().iterator
      }
  }

  /** One row per (incoming doc, colliding band) with event time. */
  case class BandRowTs(
      doc_id: Long, band: Int, bh: String, ts: java.sql.Timestamp)

  /** Bucket owner + its event time, for horizon eviction. */
  case class BucketStateTs(firstDoc: Long, firstTsMillis: Long)

  /** The SLIDING-HORIZON variant of [[gate]]: a document only counts
    * as a duplicate of one admitted within `horizon` of the
    * watermark, and buckets idle past the horizon are EVICTED — state
    * is O(docs admitted within the horizon) instead of O(all docs
    * ever), which is what lets the gate run forever on an unbounded
    * stream whose corpus identity ages out (news dedup, crawl
    * recency windows).
    *
    * The semantic is OWNER-AGE based, applied identically in two
    * places: an arrival is a duplicate iff the bucket's owner was
    * admitted within `horizon` of the arrival's event time (checked
    * inline, so correctness never depends on timer firing latency),
    * and the EventTimeTimeout that garbage-collects the bucket is
    * armed once at claim time to ownerTs + horizon (collisions do not
    * extend it — they're already not duplicates beyond that point).
    * An arrival past the owner's horizon re-claims the bucket as the
    * new owner — and so does an arrival whose event time PRECEDES the
    * owner's (an out-of-order, within-lateness arrival is the earlier
    * document: it becomes the owner rather than being attributed as a
    * duplicate of a doc admitted later in event time). The input needs
    * an event-time column `ts` with a watermark already applied (the
    * caller chooses lateness).
    */
  def gateWithHorizon(
      docs: DataFrame,
      horizon: java.time.Duration): Dataset[BandFlag] = {
    val session = docs.sparkSession
    import session.implicits._
    val horizonMs = horizon.toMillis
    require(horizonMs > 0, "horizon must be positive")
    // ts rides the banding as a kept column — joining it back would
    // be a stream-stream self-join (watermarks, state, latency); the
    // signature derivation is a stateless per-row map either way
    graft.queries.TextQueries
      .bandedSignature(docs, keep = Seq("ts"))
      .as[BandRowTs]
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketStateTs, BandFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, bh), rows, state) =>
          if (state.hasTimedOut) {
            // the owner's horizon passed: forget the bucket
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            val before = state.getOption
            var cur = before
            val out = Seq.newBuilder[BandFlag]
            sorted.foreach { r =>
              cur match {
                case Some(s) if s.firstDoc == r.doc_id =>
                  () // replay of the owner: not a self-collision
                case Some(s)
                    if r.ts.getTime >= s.firstTsMillis &&
                      r.ts.getTime - s.firstTsMillis <= horizonMs =>
                  // duplicate of an owner admitted AT OR BEFORE the
                  // arrival, within horizon — owner-before-arrival is
                  // part of the contract, so a negative delta never
                  // attributes an arrival to a LATER-admitted doc
                  out += BandFlag(r.doc_id, band, bh, s.firstDoc)
                case _ =>
                  // bucket empty, its owner aged out relative to this
                  // arrival, or the arrival PRECEDES the owner in
                  // event time (a within-lateness out-of-order
                  // arrival IS the earlier document): (re-)claim it
                  cur = Some(BucketStateTs(r.doc_id, r.ts.getTime))
              }
            }
            // write state only when (re-)claimed, but RE-ARM the
            // timeout on EVERY invocation: fMGWS clears a group's
            // timer whenever the function runs for it, so a collision
            // that didn't re-set the timestamp would silently disarm
            // eviction (observed: buckets surviving forever).
            cur.foreach { s =>
              if (cur != before) state.update(s)
              // a claim whose horizon already sits behind the
              // watermark would be rejected (no timeouts in the
              // past) — clamp to just above it; the bucket then
              // evicts on the next trigger
              state.setTimeoutTimestamp(math.max(
                s.firstTsMillis + horizonMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
