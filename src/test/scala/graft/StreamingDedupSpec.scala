package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming exact dedup — the streaming twin of d1_dedup_exact.
  *
  * `dropDuplicatesWithinWatermark` is the only scale-safe shape: state
  * for a key is dropped once the watermark passes it, so state size is
  * bounded by the dedup horizon instead of growing with the whole
  * stream's key cardinality (which an unwatermarked `dropDuplicates`
  * would hold forever — a guaranteed OOM on an unbounded 100 TB/day
  * feed).
  */
class StreamingDedupSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicates within the watermark horizon are dropped, state expires after") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = input.toDF().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
    val query = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      // batch 1: two copies of doc 1, one of doc 2 → doc 1 emitted once
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "a"),
        (1L, ts("2024-01-01 10:01:00"), "a-dup"),
        (2L, ts("2024-01-01 10:02:00"), "b"))
      query.processAllAvailable()
      assert(spark.table("dedup_out").select("doc_id").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L))

      // batch 2: doc 1 again, still inside the horizon → suppressed
      input.addData((1L, ts("2024-01-01 10:05:00"), "a-again"))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // batch 3: advance the watermark far past doc 1's state, then
      // re-send doc 1 → its state has expired, so it is emitted anew.
      // (This is the documented horizon semantics, not a bug: the
      // operator guarantees no duplicates only WITHIN the watermark.)
      input.addData((9L, ts("2024-01-01 11:00:00"), "advance"))
      query.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:59:00"), "a-new-epoch"))
      query.processAllAvailable()
      val docs = spark.table("dedup_out").select("doc_id").as[Long]
        .collect().sorted.toSeq
      assert(docs == Seq(1L, 1L, 2L, 9L), docs.toString)
    } finally query.stop()
  }

  test("batch parity: streaming dedup emits the same doc_ids as batch dropDuplicates") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq.tabulate(60)(i =>
      ((i % 20).toLong, ts(f"2024-01-01 10:${i / 3}%02d:00"), s"t$i"))
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = input.toDF().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("doc_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_parity").start()
    try {
      rows.grouped(25).foreach { g =>
        input.addData(g: _*); query.processAllAvailable()
      }
      val streamed = spark.table("dedup_parity").select("doc_id")
        .as[Long].collect().sorted.toSeq
      val batch = rows.toDF("doc_id", "ts", "text")
        .dropDuplicates("doc_id").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(streamed == batch)
    } finally query.stop()
  }
}
