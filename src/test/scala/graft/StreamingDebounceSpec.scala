package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDebounce
import graft.streaming.StreamingDebounce.{Ev, Verdict}

/** The streamed debounce must emit exactly the batch gaps-and-islands
  * verdicts (q56's shape) over everything ingested so far — including
  * the burst-CHAIN case that separates it from a last-kept rate
  * limiter, and chains crossing micro-batch boundaries.
  */
class StreamingDebounceSpec extends SparkSpecBase {

  private val H = 3600000000L // one hour in micros

  test("streamed verdicts equal the batch gaps-and-islands after " +
      "every wave, including cross-batch burst chains") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val q = StreamingDebounce.debounce(input.toDS()).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("debounce_out")
      .start()

    var ingested: List[Ev] = Nil

    def assertParity(): Unit = {
      val got = spark.table("debounce_out").as[Verdict].collect()
        .map(v => (v.key, v.event_id, v.kept)).sorted.toSeq
      val want = StreamingDebounce.batchReference(ingested.toDF())
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
        .sorted.toSeq
      assert(got == want)
    }

    try {
      // wave 0: a burst chain 0h, 0.5h, 1.2h — every gap < 1h, ONE
      // burst, only the first kept (a last-kept rate limiter would
      // wrongly re-emit the 1.2h event); plus an isolated key
      val w0 = List(Ev("a", 1L, 0L), Ev("a", 2L, H / 2),
        Ev("a", 3L, H * 12 / 10), Ev("b", 4L, 0L))
      input.addData(w0: _*); q.processAllAvailable()
      ingested ++= w0
      assertParity()

      // wave 1: 'a' resumes ≥ 1h after its LAST event (2.3h vs 1.2h)
      // → new burst, kept; 'b' bounces at 0.9h → dropped — and the
      // chain continues across the batch boundary
      val w1 = List(Ev("a", 5L, H * 23 / 10), Ev("b", 6L, H * 9 / 10))
      input.addData(w1: _*); q.processAllAvailable()
      ingested ++= w1
      assertParity()

      // wave 2: 'b' at 1.7h — only 0.8h after its last ARRIVAL
      // (0.9h), so still the same burst and dropped, even though it
      // is 1.7h past b's kept event; 'c' appears fresh
      val w2 = List(Ev("b", 7L, H * 17 / 10), Ev("c", 8L, 5L))
      input.addData(w2: _*); q.processAllAvailable()
      ingested ++= w2
      assertParity()

      // wave 3: everyone silent past the gap → all kept
      val w3 = List(Ev("a", 9L, H * 40 / 10), Ev("b", 10L, H * 40 / 10),
        Ev("c", 11L, H * 40 / 10))
      input.addData(w3: _*); q.processAllAvailable()
      ingested ++= w3
      assertParity()
    } finally q.stop()
  }

  test("equal-timestamp ties keep only the lowest event id") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingDebounce.debounce(input.toDS()).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("debounce_ties")
      .start()
    try {
      input.addData(Ev("k", 7L, 100L), Ev("k", 3L, 100L))
      q.processAllAvailable()
      val got = spark.table("debounce_ties").as[Verdict].collect()
        .map(v => (v.event_id, v.kept)).sorted.toSeq
      assert(got == Seq((3L, true), (7L, false)))
    } finally q.stop()
  }

  test("a cross-batch late arrival is flagged, dropped, and does not " +
      "rewind the state") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingDebounce.debounce(input.toDS()).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("debounce_late")
      .start()
    try {
      input.addData(Ev("k", 1L, H * 3))
      q.processAllAvailable()
      // a later batch delivers an EARLIER event: contract violation —
      // flagged late, never kept
      input.addData(Ev("k", 2L, H))
      q.processAllAvailable()
      // the state must still say lastSeen=3h, not 1h: 3.5h is only
      // 0.5h after the last legitimate arrival, so it stays dropped
      // (a rewound state would wrongly keep it)
      input.addData(Ev("k", 3L, H * 35 / 10))
      q.processAllAvailable()
      val got = spark.table("debounce_late").as[Verdict].collect()
        .map(v => (v.event_id, v.kept, v.late)).sorted.toSeq
      assert(got == Seq((1L, true, false), (2L, false, true),
        (3L, false, false)))
      // and on-time rows everywhere else carry late=false
      assert(spark.table("debounce_late").as[Verdict].collect()
        .count(_.late) == 1)
    } finally q.stop()
  }
}
