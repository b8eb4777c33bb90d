package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of q50's data-quality audit: expectation counters
  * (total, violations per rule) are PURE SUMS, so the audit of a
  * growing corpus is maintainable per micro-batch — each batch is
  * audited ALONE (one conditional-aggregate pass over just the batch)
  * and the counters added into the running audit. After any sequence
  * of batches the running audit must equal the one-shot audit over
  * everything ingested: the monitoring shape a 100 TB ingest actually
  * runs (audit work per cycle is batch-sized, never history-sized,
  * and the stored state is rule-cardinality rows).
  */
class StreamingDqAuditSpec extends SparkSpecBase {

  /** Per-batch audit: every rule from ONE conditional-aggregate scan
    * (the q50 shape) over rows (k: nullable string, v: long).
    */
  private def audit(batch: DataFrame): DataFrame =
    batch.agg(count(lit(1)).as("total"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(col("v") < 0L || col("v") > 100L, 1L).otherwise(0L))
          .as("v_range"))
      .select(col("total"), expr(
        "stack(2, 'k_not_null', v_null, 'v_range_0_100', v_range)" +
          " AS (rule, violations)"))
      .select(col("rule"), col("total"), col("violations"))

  private def mergeAudits(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("rule")
      .agg(sum(col("total")).as("total"),
        sum(col("violations")).as("violations"))

  test("per-batch-merged audit equals the one-shot audit after every batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Option[String], Long)]
    var running: Option[DataFrame] = None
    var ingested: List[(Option[String], Long)] = Nil

    val query = input.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val part = audit(batch)
        running = Some(running.fold(part)(prior =>
          mergeAudits(prior, part)).localCheckpoint(true))
        ()
      }
      .start()

    def assertRunningEqualsFull(): Unit = {
      val got = running.get.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val n = ingested.size.toLong
      val want = Map(
        "k_not_null" -> ((n, ingested.count(_._1.isEmpty).toLong)),
        "v_range_0_100" ->
          ((n, ingested.count(r => r._2 < 0L || r._2 > 100L).toLong)))
      assert(got == want)
    }

    try {
      val b0 = List(Some("a") -> 5L, None -> 7L, Some("b") -> 101L)
      input.addData(b0: _*); query.processAllAvailable()
      ingested ++= b0
      assertRunningEqualsFull()

      val b1 = List(Some("c") -> -1L, Some("d") -> 100L) // boundary row passes
      input.addData(b1: _*); query.processAllAvailable()
      ingested ++= b1
      assertRunningEqualsFull()

      val b2 = List(None -> -5L, Some("e") -> 0L) // row violating BOTH rules
      input.addData(b2: _*); query.processAllAvailable()
      ingested ++= b2
      assertRunningEqualsFull()
    } finally query.stop()
  }
}
