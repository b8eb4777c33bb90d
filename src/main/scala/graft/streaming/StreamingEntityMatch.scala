package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming entity-match gate — the ingest twin of
  * [[graft.operators.EntityResolution]], for attributing incoming
  * records to a growing master-data corpus: an arriving record is
  * flagged when any of its blocking-key buckets holds an
  * earlier-admitted record within `maxEdits` exact edit distance.
  *
  * Twin of [[StreamingNearDup]] with one structural difference: a
  * bucket collision there IS the (candidate) signal, while here the
  * verifier runs INSIDE the state function — so the bucket must
  * retain every admitted (rec_id, name) in it, not just the first
  * owner. That list is the O(admitted records × keys) corpus
  * fingerprint the gate keeps by definition; with blocking keys
  * chosen the [[graft.operators.EntityResolution]] way (selective
  * enough that blocks hold ~1 record), each bucket's list stays a
  * handful of entries — the same Σ|block|² discipline, applied to
  * state size instead of join fan-out.
  *
  * Semantics (deterministic): within a micro-batch, records process
  * in rec_id order; an arrival matching a bucket-resident record
  * (earliest resident wins) emits a MatchFlag and does not claim
  * THAT bucket; a novel-in-this-bucket arrival claims residence.
  * Residence is PER-BUCKET by construction — bucket state functions
  * run independently, so a record matched under one key may still
  * claim a bucket under another key where it was novel. Flags are
  * therefore verified match EDGES whose attribution can CHAIN
  * (7 → 3 → 1): exactly the edge stream the batch
  * [[graft.operators.EntityResolution.resolve]] closes transitively
  * — run it over the admitted corpus when closed entity ids (not
  * ingest-time attribution) are the product. Per-record attribution
  * consumers take the min `match_of` per rec_id across keys.
  */
object StreamingEntityMatch {

  case class KeyRow(rec_id: Long, name: String, ki: Int, bk: String)
  case class MatchFlag(rec_id: Long, ki: Int, bk: String, match_of: Long)
  case class BlockState(admitted: Seq[(Long, String)])
  case class KeyRowTs(rec_id: Long, name: String,
      ts: java.sql.Timestamp, ki: Int, bk: String)
  /** Residents carry their admission event time for horizon eviction:
    * (rec_id, name, tsMillis).
    */
  case class BlockStateTs(admitted: Seq[(Long, String, Long)])

  /** Classic DP edit distance — the state-function verifier (Column
    * `levenshtein` only exists in query plans). Early-exits via the
    * band trick are deliberately absent: names here are short keys,
    * and the plain O(len²) loop is branch-predictable.
    */
  private[graft] def editDistance(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** One row per (record, blocking key) — the stateless per-row map
    * that keys the state store. `blockKeys` are Columns over
    * (rec_id, name), evaluated in the PLAN (codegen'd), so the
    * state function never recomputes them.
    */
  def keyRows(records: DataFrame, blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "StreamingEntityMatch: need >= 1 key")
    records.select(F.col("rec_id"), F.col("name"),
      F.posexplode(F.array(blockKeys: _*)).as(Seq("ki", "bk")))
  }

  /** The stateful gate over a STREAMING (rec_id, name) frame.
    *
    * MIGRATION (round 14 → ): `maxResidents` was introduced with
    * default 64 — a BREAKING default for a pre-round-14 stream whose
    * blocking key legitimately holds more residents per bucket: it now
    * dies with the named IllegalStateException below mid micro-batch
    * instead of silently degrading. That loud-over-silent trade is
    * this repo's convention (the cap marks the key as not selective
    * enough to bound per-arrival cost); a caller who measured and
    * accepts larger buckets passes an explicit higher cap at the call
    * site, which also documents the accepted per-arrival budget.
    *
    * STATE-SIZE CONTRACT: each bucket's resident list grows by one per
    * novel admission and is scanned once per arrival (the verifier
    * must test residents in admission order — "earliest wins" is the
    * semantics, not an implementation detail), so a hot or
    * low-selectivity blocking key degrades per-arrival cost linearly
    * and state unboundedly — the GlobalOrder lesson applied to state.
    * `maxResidents` makes that failure LOUD: a bucket asked to admit
    * past the cap throws a named error telling the caller to refine
    * the key, instead of quietly going quadratic per micro-batch.
    * The replay guard is a per-batch hash set (built once per bucket
    * invocation, O(1) per row), not a list scan.
    */
  def gate(records: DataFrame, blockKeys: Seq[Column],
      maxEdits: Int, maxResidents: Int = 64): Dataset[MatchFlag] = {
    require(maxResidents >= 1,
      s"StreamingEntityMatch: maxResidents must be >= 1, got $maxResidents")
    val session = records.sparkSession
    import session.implicits._
    keyRows(records, blockKeys).as[KeyRow]
      .groupByKey(r => (r.ki, r.bk))
      .flatMapGroupsWithState[BlockState, MatchFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((ki, bk), rows, state) =>
          val sorted = rows.toSeq.sortBy(_.rec_id)
          val admitted = scala.collection.mutable.ArrayBuffer.from(
            state.getOption.map(_.admitted).getOrElse(Seq.empty))
          val seen = scala.collection.mutable.HashSet.from(
            admitted.iterator.map(_._1))
          val grew = admitted.size
          val out = Seq.newBuilder[MatchFlag]
          sorted.foreach { r =>
            // replay guard, O(1): guards ADMITTED ids only (matched
            // arrivals re-verify on replay, exactly as before — the
            // flag re-emits, at-least-once)
            if (!seen.contains(r.rec_id)) {
              admitted.find(a => editDistance(a._2, r.name) <= maxEdits)
              match {
                case Some((ownerId, _)) =>
                  out += MatchFlag(r.rec_id, ki, bk, ownerId)
                case None =>
                  if (admitted.size >= maxResidents)
                    throw new IllegalStateException(
                      s"StreamingEntityMatch: bucket (ki=$ki, bk=$bk) " +
                        s"outgrew maxResidents=$maxResidents — the " +
                        "blocking key is not selective enough to bound " +
                        "per-arrival verification; refine the key " +
                        "domain (or raise the cap deliberately)")
                  seen += r.rec_id
                  admitted += ((r.rec_id, r.name))
              }
            }
          }
          if (admitted.size != grew) state.update(BlockState(admitted.toSeq))
          out.result().iterator
      }
  }

  /** The SLIDING-HORIZON variant of [[gate]] — the round-14 verdict's
    * unbounded-state fix: an arrival matches only residents admitted
    * AT OR BEFORE it and within `horizon` of its event time (checked
    * inline, per resident — the [[StreamingNearDup.gateWithHorizon]]
    * owner-age semantic on a resident LIST), and residents whose
    * horizon has passed the watermark are EVICTED, so state is
    * O(records admitted within the horizon × keys) — master-data
    * attribution whose corpus identity ages out (session stitching,
    * recent-arrivals dedup) can run forever.
    *
    * Earliest-resident-wins is preserved WITHIN the horizon: the
    * verifier scans residents in admission order and takes the first
    * in-horizon edit-distance match. A no-match arrival claims
    * residence with its own event time; an arrival that PRECEDES a
    * resident in event time does not match it (the earlier record is
    * its own entity). The EventTimeTimeout re-arms every invocation
    * to the oldest live resident's horizon; on firing, expired
    * residents drop and an empty bucket removes itself.
    * `maxResidents` caps LIVE residents. Replay of a live resident is
    * ignored; replay of an evicted one re-admits (at-least-once).
    * Input needs (rec_id, name, ts) with a watermark on `ts`.
    */
  def gateWithHorizon(
      records: DataFrame, blockKeys: Seq[Column], maxEdits: Int,
      horizon: java.time.Duration,
      maxResidents: Int = 64): Dataset[MatchFlag] = {
    require(maxResidents >= 1,
      s"StreamingEntityMatch: maxResidents must be >= 1, got $maxResidents")
    require(blockKeys.nonEmpty, "StreamingEntityMatch: need >= 1 key")
    val horizonMs = horizon.toMillis
    require(horizonMs > 0, "horizon must be positive")
    val session = records.sparkSession
    import session.implicits._
    records.select(F.col("rec_id"), F.col("name"), F.col("ts"),
        F.posexplode(F.array(blockKeys: _*)).as(Seq("ki", "bk")))
      .as[KeyRowTs]
      .groupByKey(r => (r.ki, r.bk))
      .flatMapGroupsWithState[BlockStateTs, MatchFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((ki, bk), rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          def live(rs: Seq[(Long, String, Long)]) =
            rs.filter(_._3 + horizonMs >= wm)
          def rearm(rs: Seq[(Long, String, Long)]): Unit =
            if (rs.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(rs.map(_._3).min + horizonMs, wm + 1))
          if (state.hasTimedOut) {
            val kept = live(state.getOption
              .map(_.admitted).getOrElse(Seq.empty))
            if (kept.isEmpty) state.remove()
            else { state.update(BlockStateTs(kept)); rearm(kept) }
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.rec_id))
            val before = state.getOption
              .map(_.admitted).getOrElse(Seq.empty)
            val admitted = scala.collection.mutable.ArrayBuffer
              .from(live(before)) // inline prune
            val seen = scala.collection.mutable.HashSet.from(
              admitted.iterator.map(_._1))
            val out = Seq.newBuilder[MatchFlag]
            sorted.foreach { r =>
              if (!seen.contains(r.rec_id)) { // replay guard, O(1)
                val t = r.ts.getTime
                admitted.find { case (_, nm, rts) =>
                  rts <= t && t - rts <= horizonMs &&
                    editDistance(nm, r.name) <= maxEdits
                } match {
                  case Some((ownerId, _, _)) =>
                    out += MatchFlag(r.rec_id, ki, bk, ownerId)
                  case None =>
                    if (admitted.size >= maxResidents)
                      throw new IllegalStateException(
                        s"StreamingEntityMatch: bucket (ki=$ki, " +
                          s"bk=$bk) holds $maxResidents LIVE " +
                          "residents — the blocking key is not " +
                          "selective enough within the horizon; " +
                          "refine the key domain (or raise the cap " +
                          "deliberately)")
                    seen += r.rec_id
                    admitted += ((r.rec_id, r.name, t))
                }
              }
            }
            val now = admitted.toSeq
            if (now != before) state.update(BlockStateTs(now))
            rearm(now) // RE-ARM every invocation (fMGWS clears timers)
            out.result().iterator
          }
      }
  }
}
