package graft

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup gate: collision flags must match the batch LSH
  * banding run over the same corpus, and admission must respect
  * arrival order (earlier batch wins; lower doc id wins within a
  * batch).
  */
class StreamingNearDupSpec extends SparkSpecBase {

  // distinct 24-word texts — enough shingles that two different texts
  // never share a MinHash band by accident at this size
  private def text(seed: String): String =
    (1 to 24).map(i => s"$seed$i").mkString(" ")

  private val docA = 1L -> text("alpha")
  private val docB = 2L -> text("beta")
  private val docC = 3L -> docA._2 // exact copy of A, later wave
  private val docD = 4L -> text("delta")
  private val docE = 5L -> docD._2 // exact copy of D, same wave

  test("collides only against earlier-admitted documents, across and " +
      "within micro-batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val query = StreamingNearDup.gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_flags").start()
    try {
      // wave 1: two novel docs — nothing flags
      input.addData(docA, docB)
      query.processAllAvailable()
      assert(spark.table("neardup_flags").count() == 0)

      // wave 2: C duplicates A (cross-batch), E duplicates D
      // (same batch, D has the lower id and wins admission)
      input.addData(docC, docD, docE)
      query.processAllAvailable()
      val flags = spark.table("neardup_flags")
        .select("doc_id", "band", "dup_of")
        .as[(Long, Int, Long)].collect().toSet
      // every band of an exact copy collides → 2 rows per duplicate
      assert(flags == Set((3L, 0, 1L), (3L, 1, 1L),
        (5L, 0, 4L), (5L, 1, 4L)), s"got $flags")

      // wave 3: replaying an admitted doc id is not a self-collision;
      // a fresh copy of B still flags against B
      input.addData(docA, 6L -> docB._2)
      query.processAllAvailable()
      val extra = spark.table("neardup_flags")
        .filter(col("doc_id").isin(1L, 6L))
        .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
      assert(extra == Set((6L, 2L)), s"got $extra")
    } finally query.stop()
  }

  test("bucket state survives a checkpoint restart: a doc admitted in " +
      "leg 1 still flags its duplicate in leg 2") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup-restart")
    val sink = s"$dir/flags"
    val checkpoint = s"$dir/checkpoint"
    val input = MemoryStream[(Long, String)]
    def start() = StreamingNearDup
      .gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingNearDup.BandFlag],
            _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(sink)
      }
      .option("checkpointLocation", checkpoint)
      .start()

    val q1 = start()
    try {
      input.addData(docA, docB)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(docC) // duplicate of A, admitted before the restart
      val deadline = System.currentTimeMillis + 120000
      def emitted() = scala.util.Try(
        spark.read.parquet(sink).count() >= 2).getOrElse(false)
      while (!emitted() && System.currentTimeMillis < deadline)
        Thread.sleep(100)
    } finally q2.stop()

    val flags = spark.read.parquet(sink)
      .select("doc_id", "band", "dup_of")
      .as[(Long, Int, Long)].collect().toSet
    assert(flags == Set((3L, 0, 1L), (3L, 1, 1L)), s"got $flags")
  }

  test("streamed flag set matches the batch banding over the same " +
      "corpus: a doc flags iff it shares a band with an earlier doc") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq(docA, docB, docC, docD, docE)
    val input = MemoryStream[(Long, String)]
    val query = StreamingNearDup.gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_parity").start()
    val streamedFlagged = try {
      // one doc per micro-batch → arrival order == doc-id order
      corpus.foreach { doc =>
        input.addData(doc)
        query.processAllAvailable()
      }
      spark.table("neardup_parity").select("doc_id")
        .as[Long].collect().toSet
    } finally query.stop()

    // batch expectation from the SAME banding: docs sharing any
    // (band, bh) with a lower doc id
    val bands = StreamingNearDup.bandRows(
      corpus.toDF("doc_id", "text"))
    val expect = bands.as("a").join(bands.as("b"), Seq("band", "bh"))
      .filter(col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id")).as[Long].collect().toSet
    assert(streamedFlagged == expect && expect == Set(3L, 5L),
      s"streamed=$streamedFlagged batch=$expect")
  }

  test("randomized parity: for seeded corpora with planted duplicates " +
      "and random wave splits, streamed flags == batch banding rule") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // 12 docs: ~half are copies of an earlier doc (planted dups)
      val corpus = (1L to 12L).map { id =>
        if (id > 1 && rnd.nextBoolean())
          id -> text(s"s$seed-d${rnd.nextInt(id.toInt - 1) + 1}-")
        else id -> text(s"s$seed-d$id-")
      }
      val input = MemoryStream[(Long, String)]
      val query = StreamingNearDup
        .gate(input.toDF().toDF("doc_id", "text"))
        .writeStream.outputMode("append")
        .format("memory").queryName(s"neardup_rand_$seed").start()
      val streamed = try {
        // random wave boundaries, ids still arrive in increasing order
        corpus.grouped(1 + rnd.nextInt(4)).foreach { wave =>
          input.addData(wave: _*)
          query.processAllAvailable()
        }
        spark.table(s"neardup_rand_$seed").select("doc_id")
          .as[Long].collect().toSet
      } finally query.stop()

      val bands = StreamingNearDup.bandRows(corpus.toDF("doc_id", "text"))
      val expect = bands.as("a").join(bands.as("b"), Seq("band", "bh"))
        .filter(col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id")).as[Long].collect().toSet
      assert(streamed == expect, s"seed=$seed: $streamed vs $expect")
    }
  }

  test("state-store size is exactly one row per distinct LSH bucket: " +
      "linear in admitted docs, flat under duplicate-only waves") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the O(admitted × bands) claim, measured: numRowsTotal from the
    // state operator's progress metrics, pinned against the batch-side
    // count of distinct (band, bh) buckets over everything fed so far
    def expectedBuckets(docs: Seq[(Long, String)]): Long =
      StreamingNearDup.bandRows(docs.toDF("doc_id", "text"))
        .select("band", "bh").distinct().count()

    val input = MemoryStream[(Long, String)]
    val query = StreamingNearDup.gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_state").start()
    def stateRows(): Long =
      query.recentProgress.reverse.collectFirst {
        case p if p.stateOperators.nonEmpty =>
          p.stateOperators.map(_.numRowsTotal).sum
      }.getOrElse(-1L)
    try {
      val perDoc = expectedBuckets(Seq(1L -> text("st1-")))
      assert(perDoc > 0)

      // wave 1: 5 novel docs
      val wave1 = (1L to 5L).map(i => i -> text(s"st$i-"))
      input.addData(wave1: _*)
      query.processAllAvailable()
      assert(stateRows() == expectedBuckets(wave1) &&
        stateRows() == 5 * perDoc,
        s"state ${stateRows()} != ${5 * perDoc}")

      // wave 2: duplicates ONLY (copies of wave 1) — collisions create
      // no new buckets and rewrite no owners, so state must not grow
      input.addData((6L to 10L).map(i => i -> text(s"st${i - 5}-")): _*)
      query.processAllAvailable()
      assert(stateRows() == 5 * perDoc,
        s"duplicate wave grew state to ${stateRows()}")

      // wave 3: 45 more novel docs — 10x the admitted corpus, state
      // exactly 10x wave 1's: linear in ADMISSIONS, not in rows seen
      val wave3 = (11L to 55L).map(i => i -> text(s"st$i-"))
      input.addData(wave3: _*)
      query.processAllAvailable()
      assert(stateRows() == expectedBuckets(wave1 ++ wave3) &&
        stateRows() == 50 * perDoc,
        s"state ${stateRows()} != ${50 * perDoc} after 10x admissions")
    } finally query.stop()
  }

  test("horizon gate: duplicates flag only against an owner admitted " +
      "within the horizon; aged-out buckets re-claim and state evicts") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0 + offsetSec * 1000)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = StreamingNearDup.gateWithHorizon(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "0 seconds"),
        java.time.Duration.ofSeconds(10))
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_horizon").start()
    def flags() = spark.table("neardup_horizon")
      .select("doc_id", "dup_of").distinct()
      .as[(Long, Long)].collect().toSet
    def stateRows(): Long =
      query.recentProgress.reverse.collectFirst {
        case p if p.stateOperators.nonEmpty =>
          p.stateOperators.map(_.numRowsTotal).sum
      }.getOrElse(-1L)
    try {
      // t+0: A admitted; t+5 (inside horizon): copy flags against A
      input.addData((1L, text("ha-"), ts(0)))
      query.processAllAvailable()
      input.addData((2L, text("ha-"), ts(5)))
      query.processAllAvailable()
      assert(flags() == Set((2L, 1L)), s"got ${flags()}")

      // t+20 (past A's horizon): the same content does NOT flag — it
      // re-claims the bucket as the new owner...
      input.addData((3L, text("ha-"), ts(20)))
      query.processAllAvailable()
      assert(flags() == Set((2L, 1L)), s"aged-out owner still flagged: ${flags()}")

      // ...and a copy within the NEW owner's horizon flags against IT
      input.addData((4L, text("ha-"), ts(25)))
      query.processAllAvailable()
      assert(flags() == Set((2L, 1L), (4L, 3L)), s"got ${flags()}")

      // advance the watermark far past every horizon with an
      // unrelated doc: the old buckets evict — state is bounded by
      // the horizon's admissions, not by history
      input.addData((5L, text("hb-"), ts(100)))
      query.processAllAvailable()
      input.addData((6L, text("hc-"), ts(101)))
      query.processAllAvailable()
      val after = stateRows()
      // only the t+100/t+101 claims can still be live (2 bands each)
      assert(after <= 4,
        s"aged-out buckets were not evicted: $after state rows")
    } finally query.stop()
  }

  test("horizon gate: a within-lateness out-of-order arrival re-claims " +
      "the bucket instead of flagging against a later-admitted owner") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1700000000000L
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0 + offsetSec * 1000)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    // 30s lateness so an arrival 2s behind the owner is late-but-kept
    val query = StreamingNearDup.gateWithHorizon(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "30 seconds"),
        java.time.Duration.ofSeconds(10))
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_ooo").start()
    def flags() = spark.table("neardup_ooo")
      .select("doc_id", "dup_of").distinct()
      .as[(Long, Long)].collect().toSet
    try {
      // t+5: doc 1 claims the bucket
      input.addData((1L, text("oo-"), ts(5)))
      query.processAllAvailable()
      // t+3, arriving AFTER doc 1: precedes the owner in event time —
      // it IS the earlier document, so it re-claims (no flag against
      // the later-admitted doc 1)
      input.addData((2L, text("oo-"), ts(3)))
      query.processAllAvailable()
      assert(flags() == Set.empty,
        s"out-of-order arrival attributed to a later owner: ${flags()}")
      // t+4: within the NEW owner's horizon — flags against doc 2
      input.addData((3L, text("oo-"), ts(4)))
      query.processAllAvailable()
      assert(flags() == Set((3L, 2L)), s"got ${flags()}")
    } finally query.stop()
  }
}
