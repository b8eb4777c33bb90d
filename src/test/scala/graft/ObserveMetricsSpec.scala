package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingFlightSession.Observation

/** `Dataset.observe` — the zero-cost operational-metrics channel a
  * production pipeline hangs its data-quality alerts on: metrics ride
  * the existing job (no second pass over the data) and surface through
  * QueryExecutionListener (batch) / StreamingQueryProgress (stream).
  */
class ObserveMetricsSpec extends SparkSpecBase {

  test("batch observe reports row counts and null counts in one pass") {
    import SparkTestSession.spark.implicits._
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val m = qe.observedMetrics.get("gate")
        if (m.isDefined) seen = m
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq(("a", Some(1)), ("b", None), ("c", Some(3)))
        .toDF("k", "v")
        .observe("gate",
          count(lit(1)).as("rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("null_v"))
      df.write.format("noop").mode("overwrite").save()
      // listener delivery is async on the listener bus
      val deadline = System.currentTimeMillis + 20000
      while (seen.isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(seen.isDefined, "observed metrics never reached the listener")
      assert(seen.get.getAs[Long]("rows") == 3L)
      assert(seen.get.getAs[Long]("null_v") == 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming observe surfaces per-batch metrics in progress events") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Observation]
    val query = input.toDS()
      .observe("ingest",
        count(lit(1)).as("rows"),
        sum(when(col("velocity").isNull, 1L).otherwise(0L))
          .as("null_velocity"))
      .writeStream.outputMode("append")
      .format("memory").queryName("observe_out")
      .start()
    try {
      input.addData(
        Observation("aa0001", 1L, Some(80.0), Some(12.0)),
        Observation("aa0002", 2L, None, Some(10.0)),
        Observation("aa0003", 3L, Some(90.0), None))
      query.processAllAvailable()
      val deadline = System.currentTimeMillis + 20000
      def metric = query.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("ingest"))).lastOption
      while (metric.isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(metric.isDefined, "no observed metrics in progress events")
      assert(metric.get.getAs[Long]("rows") == 3L)
      assert(metric.get.getAs[Long]("null_velocity") == 1L)
    } finally query.stop()
  }
}
