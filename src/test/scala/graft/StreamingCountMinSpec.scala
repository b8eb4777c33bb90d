package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.CountMin

/** The CMS is a plain mergeable aggregate, so the SAME
  * CountMin.sketch code runs unmodified as a streaming aggregation —
  * no twin implementation to drift. After every ingested wave the
  * streamed cells (Complete mode) must equal the batch sketch of
  * everything ingested so far: continuous heavy-hitter counting with
  * cell-sized state (depth·width counters), never per-token state.
  */
class StreamingCountMinSpec extends SparkSpecBase {

  test("streamed cells equal the batch sketch after every wave") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(String, Long)]
    val q = CountMin
      .sketch(input.toDS().toDF("tok", "n"), "tok", "n",
        depth = 4, width = 64)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("cms_stream")
      .start()

    var ingested: List[(String, Long)] = Nil
    def assertParity(): Unit = {
      val streamed = spark.table("cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = CountMin
        .sketch(ingested.toDF("tok", "n"), "tok", "n",
          depth = 4, width = 64)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    }

    try {
      val w0 = List(("alpha", 1L), ("beta", 1L), ("alpha", 1L))
      input.addData(w0: _*); q.processAllAvailable()
      ingested ++= w0
      assertParity()

      // wave 2 extends existing cells AND opens new ones
      val w1 = List(("alpha", 1L), ("gamma", 2L), ("delta", 1L))
      input.addData(w1: _*); q.processAllAvailable()
      ingested ++= w1
      assertParity()

      // point estimates from the live streamed cells stay one-sided
      val est = CountMin.estimate(
          Seq("alpha", "gamma").toDF("tok"), "tok",
          spark.table("cms_stream"), depth = 4, width = 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est("alpha") >= 3L && est("gamma") >= 2L)
    } finally q.stop()
  }
}
