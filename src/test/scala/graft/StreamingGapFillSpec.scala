package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingGapFill
import graft.streaming.StreamingGapFill.{Filled, Obs}

/** The streamed gap fill must equal the batch spine+LOCF (q49's
  * derivation) over everything ingested so far — gap rows emitted by
  * the closing observation, values carried from the last observed
  * bin, across micro-batch boundaries and for multiple interleaved
  * series. Plus the maxGapBins safety valve: a poisoned series emits
  * a bounded run, never millions of rows in one trigger.
  */
class StreamingGapFillSpec extends SparkSpecBase {

  test("streamed fill equals the batch spine+LOCF after every wave") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Obs]
    val q = StreamingGapFill.fill(input.toDS()).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("gapfill_out")
      .start()

    var ingested: List[Obs] = Nil

    def assertParity(): Unit = {
      val got = spark.table("gapfill_out").as[Filled].collect()
        .map(f => (f.series, f.bin, f.value, f.is_gap)).sorted.toSeq
      val want = StreamingGapFill
        .batchReference(ingested.toDF())
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
        .sorted.toSeq
      assert(got == want)
    }

    try {
      // wave 0: two series, in-batch gap for a (bins 1,2,5 → 3,4 gaps)
      val w0 = List(Obs("a", 1L, 10L), Obs("a", 2L, 20L), Obs("a", 5L, 50L),
        Obs("b", 7L, 70L))
      input.addData(w0: _*); q.processAllAvailable()
      ingested ++= w0
      assertParity()

      // wave 1: cross-batch gaps — 'a' resumes after 5 (6,7 gaps with
      // LOCF 50), 'b' continues adjacently (no gap)
      val w1 = List(Obs("a", 8L, 80L), Obs("b", 8L, 81L))
      input.addData(w1: _*); q.processAllAvailable()
      ingested ++= w1
      assertParity()

      // wave 2: new series appears mid-stream; 'a' long-ish gap
      val w2 = List(Obs("c", 100L, 1L), Obs("a", 12L, 120L))
      input.addData(w2: _*); q.processAllAvailable()
      ingested ++= w2
      assertParity()
    } finally q.stop()
  }

  test("maxGapBins bounds the emitted run for a poisoned series") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Obs]
    val q = StreamingGapFill.fill(input.toDS(), maxGapBins = 3L)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("gapfill_bounded")
      .start()
    try {
      input.addData(Obs("x", 0L, 5L)); q.processAllAvailable()
      // a bin a million steps ahead: only the LAST 3 gap bins emit
      input.addData(Obs("x", 1000000L, 9L)); q.processAllAvailable()
      val got = spark.table("gapfill_bounded").as[Filled].collect()
        .map(f => (f.bin, f.value, f.is_gap)).sorted.toSeq
      val want = Seq((0L, 5L, false),
        (999997L, 5L, true), (999998L, 5L, true), (999999L, 5L, true),
        (1000000L, 9L, false))
      assert(got == want)
    } finally q.stop()
  }
}
