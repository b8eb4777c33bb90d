package graft

import graft.streaming.{StreamingEntityMatch, StreamingKnnIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Horizon-evicted variants of the two resident-list streaming gates
  * (round-14 verdict item 5): candidates/matches only fire against
  * residents admitted within the horizon, aged-out residents stop
  * matching AND leave the state store (numRowsTotal bounded by the
  * horizon's admissions), and the per-resident aging keeps a bucket's
  * younger residents live while its older ones evict.
  */
class StreamingHorizonGatesSpec extends SparkSpecBase {

  private val t0 = 1700000000000L
  private def ts(offsetSec: Long) =
    new java.sql.Timestamp(t0 + offsetSec * 1000)

  // two vectors with identical SRP signatures (same vector → hamming
  // 0, cosine 1) plus an unrelated one; 64-dim floats
  private def vec(seed: Int): Seq[Float] =
    (0 until 64).map(j => ((seed * 31 + j * 7) % 13 - 6).toFloat / 3f)

  private def stateRows(
      query: org.apache.spark.sql.streaming.StreamingQuery): Long =
    query.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty =>
        p.stateOperators.map(_.numRowsTotal).sum
    }.getOrElse(-1L)

  test("knn horizon gate: edges fire only against residents within " +
      "the horizon; aged-out residents stop matching and evict from " +
      "the state store") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val query = StreamingKnnIngest.gateWithHorizon(
        input.toDF().toDF("vec_id", "embedding", "ts")
          .withWatermark("ts", "0 seconds"),
        java.time.Duration.ofSeconds(10))
      .writeStream.outputMode("append")
      .format("memory").queryName("knn_horizon").start()
    def pairs() = spark.table("knn_horizon")
      .select("vec_id", "nbr").distinct()
      .as[(Long, Long)].collect().toSet
    try {
      // t+0: vector A admitted; t+5 (inside horizon): its copy emits
      // an edge against it
      input.addData((1L, vec(1), ts(0)))
      query.processAllAvailable()
      input.addData((2L, vec(1), ts(5)))
      query.processAllAvailable()
      assert(pairs() == Set((2L, 1L)), s"got ${pairs()}")

      // t+20: past A's horizon (and 2's) — the same vector emits NO
      // edge; it admits itself as a fresh resident
      input.addData((3L, vec(1), ts(20)))
      query.processAllAvailable()
      assert(pairs() == Set((2L, 1L)),
        s"aged-out resident still matched: ${pairs()}")

      // t+25: within vector 3's horizon only — edges against 3, not
      // against the aged-out 1 or 2 (per-resident aging)
      input.addData((4L, vec(1), ts(25)))
      query.processAllAvailable()
      assert(pairs() == Set((2L, 1L), (4L, 3L)), s"got ${pairs()}")

      // push the watermark far past every horizon: buckets evict —
      // only the t+100 arrival's own residency can remain
      input.addData((5L, vec(7), ts(100)))
      query.processAllAvailable()
      input.addData((6L, vec(9), ts(101)))
      query.processAllAvailable()
      val after = stateRows(query)
      assert(after >= 0 && after <= 8,
        s"aged-out residents were not evicted: $after state rows")
    } finally query.stop()
  }

  test("entity horizon gate: matches respect the horizon per " +
      "resident, earliest-in-horizon wins, and state evicts") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingEntityMatch.gateWithHorizon(
        input.toDF().toDF("rec_id", "name", "ts")
          .withWatermark("ts", "0 seconds"),
        Seq(substring(col("name"), 1, 3)),
        maxEdits = 2,
        horizon = java.time.Duration.ofSeconds(10))
      .writeStream.outputMode("append")
      .format("memory").queryName("em_horizon").start()
    def flags() = spark.table("em_horizon")
      .select("rec_id", "match_of").distinct()
      .as[(Long, Long)].collect().toSet
    try {
      // t+0 and t+2: two spellings admitted (2 matches 1 within
      // horizon → flagged, does NOT claim)
      input.addData((1L, "smithson", ts(0)))
      query.processAllAvailable()
      input.addData((2L, "smithsen", ts(2)))
      query.processAllAvailable()
      assert(flags() == Set((2L, 1L)), s"got ${flags()}")

      // t+20: past 1's horizon — same name does not match, claims
      input.addData((3L, "smithson", ts(20)))
      query.processAllAvailable()
      assert(flags() == Set((2L, 1L)),
        s"aged-out resident still matched: ${flags()}")

      // t+25: matches the NEW resident 3 (earliest IN-HORIZON wins,
      // not earliest ever)
      input.addData((4L, "smithsen", ts(25)))
      query.processAllAvailable()
      assert(flags() == Set((2L, 1L), (4L, 3L)), s"got ${flags()}")

      // watermark far ahead: everything evicts except the new claim
      input.addData((5L, "unrelated", ts(200)))
      query.processAllAvailable()
      input.addData((6L, "different", ts(201)))
      query.processAllAvailable()
      val after = stateRows(query)
      assert(after >= 0 && after <= 2,
        s"aged-out residents were not evicted: $after state rows")
    } finally query.stop()
  }

  test("knn horizon gate: an out-of-order arrival preceding a " +
      "resident does not match it — the earlier vector is its own " +
      "entity — and a younger resident keeps matching while an older " +
      "one ages out in the same bucket") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val query = StreamingKnnIngest.gateWithHorizon(
        input.toDF().toDF("vec_id", "embedding", "ts")
          .withWatermark("ts", "30 seconds"),
        java.time.Duration.ofSeconds(10))
      .writeStream.outputMode("append")
      .format("memory").queryName("knn_ooo").start()
    def pairs() = spark.table("knn_ooo")
      .select("vec_id", "nbr").distinct()
      .as[(Long, Long)].collect().toSet
    try {
      // t+5 admitted first; the t+3 arrival PRECEDES it in event time
      // → no edge (rts <= t fails), both now resident
      input.addData((1L, vec(1), ts(5)))
      query.processAllAvailable()
      input.addData((2L, vec(1), ts(3)))
      query.processAllAvailable()
      assert(pairs() == Set.empty,
        s"out-of-order arrival matched a later resident: ${pairs()}")
      // t+12: within BOTH residents' horizons → edges against both
      input.addData((3L, vec(1), ts(12)))
      query.processAllAvailable()
      assert(pairs() == Set((3L, 1L), (3L, 2L)), s"got ${pairs()}")
      // t+14: within 1's horizon (t+5+10=15) and 3's (t+12+10=22)
      // but past 2's (t+3+10=13) → per-resident aging: edges against
      // 1 and 3, none against 2
      input.addData((4L, vec(1), ts(14)))
      query.processAllAvailable()
      assert(pairs() == Set((3L, 1L), (3L, 2L), (4L, 1L), (4L, 3L)),
        s"got ${pairs()}")
    } finally query.stop()
  }
}
