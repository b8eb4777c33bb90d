package graft

import graft.streaming.StreamingFlightSession
import graft.streaming.StreamingFlightSession.{CompletedFlight, Observation}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row
import scala.util.Random

/** Randomized batch↔streaming parity: seeded random observation
  * scenarios run through BOTH the batch two-phase pipeline and the
  * flatMapGroupsWithState twin must emit identical completed-flight
  * logs. This is the strongest guarantee that the two execution modes
  * implement one semantics.
  */
class RandomScenarioParitySpec extends SparkSpecBase {

  private val t0 = 1712338000L

  private def randomScenario(rng: Random): Seq[Seq[Observation]] = {
    val keys = Seq("k1", "k2", "k3")
    (0 until 5).map { batch =>
      keys.filter(_ => rng.nextDouble() < 0.8).map { k =>
        val vel = rng.nextInt(4) match {
          case 0 => Some(0.0)
          case 1 => Some(rng.nextDouble() * 9)
          case 2 => Some(10 + rng.nextDouble() * 200)
          case _ => None
        }
        val vr = rng.nextInt(4) match {
          case 0 => Some(0.0)
          case 1 => Some(-(1 + rng.nextDouble() * 5))
          case 2 => Some(1 + rng.nextDouble() * 5)
          case _ => None
        }
        Observation(k, t0 + 300L * batch, vel, vr)
      }
    }
  }

  private def runBatchPipeline(
      batches: Seq[Seq[Observation]]): Seq[(String, Int, Long)] = {
    val emptyMeta = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.metadata)
    var state = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.source)
    val out = Seq.newBuilder[(String, Int, Long)]
    batches.zipWithIndex.foreach { case (obs, i) =>
      val states = df(Schemas.states, obs.map(o => Row(o.icao24,
        java.lang.Long.valueOf(o.last_contact),
        o.velocity.map(java.lang.Double.valueOf).orNull,
        o.vertical_rate.map(java.lang.Double.valueOf).orNull)): _*)
      // horizon 0 disables eviction: streaming timeouts are
      // processing-time and never fire in-test, so strict parity
      // requires comparing the un-evicted state machines (eviction
      // itself is covered by ReplayParitySpec).
      val merged = ActiveFlightsJob.stateUpdate(states, state, 0L)
      val split = CompleteFlightsJob.transform(merged, emptyMeta)
      out ++= split.complete
        .select("icao24", "flight_duration_minutes", "landed_at")
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getTimestamp(2).toInstant.getEpochSecond))
      state = df(Schemas.source, split.active.collect().toSeq: _*)
    }
    out.result().sorted
  }

  private var run = 0
  private def runStreaming(
      batches: Seq[Seq[Observation]]): Seq[(String, Int, Long)] = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    run += 1
    val name = s"parity_out_$run"
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlights(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach(b => if (b.nonEmpty) input.addData(b: _*))
      val n = batches.map(_.size).sum
      val deadline = System.currentTimeMillis + 120000
      while (query.recentProgress.map(_.numInputRows).sum < n &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
    } finally query.stop()
    spark.table(name).as[CompletedFlight].collect().toSeq
      .map(f => (f.icao24, f.flight_duration_minutes,
        f.landed_at.toInstant.getEpochSecond)).sorted
  }

  test("batch and streaming agree on seeded random scenarios") {
    (1 to 4).foreach { seed =>
      val scenario = randomScenario(new Random(seed))
      val batch = runBatchPipeline(scenario)
      val streaming = runStreaming(scenario)
      assert(batch == streaming,
        s"seed=$seed\nscenario=$scenario\nbatch=$batch\nstreaming=$streaming")
    }
  }
}
