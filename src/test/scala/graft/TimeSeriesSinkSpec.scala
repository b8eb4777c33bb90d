package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.sources.TimeSeriesSink
import graft.sources.TimeSeriesSink.{BatchWriter, TimeSeriesStore}

/** The connector-shaped sink's contract: idempotent driver-side
  * collection create, per-partition writers with bounded batches,
  * exactly-once row delivery, empty partitions opening nothing.
  */
class TimeSeriesSinkSpec extends SparkSpecBase {

  // executor-side state must land somewhere inspectable: local-mode
  // tasks share the JVM, so a static registry keyed by run id works as
  // the "remote store"
  private def freshRun(): String = {
    val id = s"run-${InMemoryStore.runCounter.incrementAndGet()}"
    InMemoryStore.reset(id)
    id
  }

  private def flight(i: Int): Flight = Flight(
    icao24 = f"ic$i%05d", flight_duration_minutes = 60 + i,
    landed_at = new Timestamp(1700000000000L + i * 1000L),
    registration = Some(s"N$i"), model = Some("A320"),
    manufacturer_icao = Some("AIB"), owner = None, operator = None,
    built = None)

  private def ds(n: Int, partitions: Int) = {
    val session = spark
    import session.implicits._
    spark.createDataset((1 to n).map(flight)).repartition(partitions)
  }

  test("rows arrive exactly once, in batches bounded by batchSize") {
    val run = freshRun()
    TimeSeriesSink.writeFlights(ds(1000, 8), new InMemoryStore(run),
      batchSize = 64)
    val batches = InMemoryStore.batches(run)
    assert(batches.forall(_.size <= 64), "a batch exceeded batchSize")
    val all = batches.flatten
    assert(all.size == 1000, s"expected 1000 docs, got ${all.size}")
    assert(all.map(_.icao24).distinct.size == 1000, "duplicated docs")
    // 8 partitions × 125 rows → ceil(125/64)=2 batches each
    assert(batches.size >= 8 && batches.size <= 16, s"${batches.size} batches")
  }

  test("the collection is created once, on the driver, idempotently") {
    val run = freshRun()
    val store = new InMemoryStore(run)
    TimeSeriesSink.writeFlights(ds(100, 4), store, batchSize = 50)
    assert(InMemoryStore.createCalls(run).get() == 1,
      "ensureCollection must run exactly once (driver), not per task")
    assert(InMemoryStore.ttl(run).get("flights") ==
      TimeSeriesSink.FlightsExpirationSeconds)
    // second write: create is called again but reports "already exists"
    TimeSeriesSink.writeFlights(ds(10, 2), store, batchSize = 50)
    assert(InMemoryStore.createdFlags(run).intValue() == 1,
      "re-create of an existing collection must be a no-op")
  }

  test("empty partitions open no writer") {
    val run = freshRun()
    // 5 rows over 32 partitions → at least 27 empty partitions
    TimeSeriesSink.writeFlights(ds(5, 32), new InMemoryStore(run),
      batchSize = 10)
    assert(InMemoryStore.writersOpened(run).get() <= 5,
      "empty partitions must not open connections")
    assert(InMemoryStore.batches(run).flatten.size == 5)
  }

  test("the streaming session feeds the connector sink through " +
      "foreachBatch — the reference's per-cycle insert shape") {
    import graft.streaming.StreamingFlightSession
    import graft.streaming.StreamingFlightSession.Observation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val run = freshRun()
    val store = new InMemoryStore(run)
    val t0 = 1712338000L
    val input = MemoryStream[Observation]
    val metadata = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        "ab0001", "AB-CDE", "B737", "BOEING", "Own Co", "Demo Air",
        "2000-02-01"))),
      Schemas.metadata)
    val query = StreamingFlightSession
      .enrichedFlights(spark, input.toDS(), metadata)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TimeSeriesSink.writeFlights(
          batch.as[Flight], store, batchSize = 100)
      }
      .start()
    try {
      // takeoff → cruise → landed-and-stopped: exactly one completion
      input.addData(Observation("ab0001", t0, Some(80.0), Some(12.0)))
      input.addData(Observation("ab0001", t0 + 300, Some(230.0), Some(-2.0)))
      input.addData(Observation("ab0001", t0 + 600, Some(0.0), Some(0.0)))
      val deadline = System.currentTimeMillis + 120000
      while (InMemoryStore.batches(run).flatten.size < 1 &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
    } finally query.stop()

    val docs = InMemoryStore.batches(run).flatten
    assert(docs.size == 1, s"expected 1 completed flight, got $docs")
    assert(docs.head.icao24 == "ab0001")
    assert(docs.head.flight_duration_minutes == 10)
    assert(docs.head.model.contains("B737"),
      "metadata enrichment must reach the sink")
    assert(InMemoryStore.ttl(run).get("flights") ==
      TimeSeriesSink.FlightsExpirationSeconds)
  }

  test("every writer that was opened is closed, even with empty batches") {
    val run = freshRun()
    TimeSeriesSink.writeFlights(ds(200, 4), new InMemoryStore(run),
      batchSize = 64)
    assert(InMemoryStore.writersOpened(run).get() ==
      InMemoryStore.writersClosed(run).get())
  }
}

/** Serializable store double: instances carry only the run id; all
  * state lives in the static registry (shared JVM in local mode).
  */
class InMemoryStore(runId: String) extends TimeSeriesStore {
  override def ensureCollection(
      name: String, timeField: String, metaField: String,
      expireAfterSeconds: Long): Boolean = {
    InMemoryStore.createCalls(runId).incrementAndGet()
    val created = InMemoryStore.collections(runId)
      .putIfAbsent(name, s"$timeField/$metaField") == null
    if (created) {
      InMemoryStore.createdFlags(runId).incrementAndGet()
      InMemoryStore.ttl(runId).put(name, expireAfterSeconds)
    }
    created
  }

  override def newWriter(collection: String): BatchWriter = {
    InMemoryStore.writersOpened(runId).incrementAndGet()
    new BatchWriter {
      override def insertMany(docs: Seq[Flight]): Unit =
        InMemoryStore.addBatch(runId, docs)
      override def close(): Unit =
        InMemoryStore.writersClosed(runId).incrementAndGet()
    }
  }
}

object InMemoryStore {
  val runCounter = new AtomicInteger(0)
  private val state =
    new ConcurrentHashMap[String, RunState]()

  final class RunState {
    val createCalls = new AtomicInteger(0)
    val createdFlags = new AtomicInteger(0)
    val writersOpened = new AtomicInteger(0)
    val writersClosed = new AtomicInteger(0)
    val collections = new ConcurrentHashMap[String, String]()
    val ttl = new ConcurrentHashMap[String, Long]()
    val batches =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[Seq[Flight]]())
  }

  def reset(runId: String): Unit = state.put(runId, new RunState)
  private def s(runId: String): RunState = state.get(runId)

  def createCalls(runId: String): AtomicInteger = s(runId).createCalls
  def createdFlags(runId: String): AtomicInteger = s(runId).createdFlags
  def writersOpened(runId: String): AtomicInteger = s(runId).writersOpened
  def writersClosed(runId: String): AtomicInteger = s(runId).writersClosed
  def collections(runId: String): ConcurrentHashMap[String, String] =
    s(runId).collections
  def ttl(runId: String): ConcurrentHashMap[String, Long] = s(runId).ttl
  def addBatch(runId: String, b: Seq[Flight]): Unit =
    s(runId).batches.add(b)
  def batches(runId: String): Seq[Seq[Flight]] = {
    import scala.jdk.CollectionConverters._
    s(runId).batches.asScala.toSeq
  }
}
