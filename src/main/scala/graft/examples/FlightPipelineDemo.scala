package graft.examples

import graft._
import org.apache.spark.sql.{Row, SparkSession}

/** End-to-end demo of the flight-utilization pipeline: three synthetic
  * micro-batches flow through the state update (ActiveFlightsJob) and
  * the completion split (CompleteFlightsJob) with a real parquet state
  * handoff between batches, exactly like the production loop
  * (reference DAG shape: src/dags/flight_utilization.py:72-78).
  *
  * Usage: runMain graft.examples.FlightPipelineDemo /tmp/graft-demo
  *
  * One aircraft (ab0001) takes off in batch 1, cruises in batch 2, and
  * lands in batch 3 — so the final completed-flights sink must contain
  * exactly one enriched flight record.
  */
object FlightPipelineDemo {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-flight-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Versioned state locations: Spark cannot lazily read and
    // overwrite the same path in one job (unlike the reference's eager
    // pandas read-modify-overwrite), and at cluster scale a
    // write-new-then-swap-pointer state table is the durable pattern
    // anyway. Each phase writes the next version; the previous one
    // stays readable until the batch commits.
    var stateVersion = 0
    def statePath(v: Int) = s"$workDir/state_v$v.parquet"
    val sinkPath = s"$workDir/flights"
    val t0 = 1712338000L

    // Aircraft metadata dimension (normally the daily CSV refresh).
    val metadata = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("ab0001", "AB-CDE", "Boeing 737", "BOEING", "Lease Co",
          "Demo Air", "2000-02-01"))),
      Schemas.metadata)

    // Three snapshots: climb-out, cruise, landed-and-stopped.
    val batches = Seq(
      Seq(Row("ab0001", java.lang.Long.valueOf(t0), java.lang.Double.valueOf(80.0),
        java.lang.Double.valueOf(12.0))),
      Seq(Row("ab0001", java.lang.Long.valueOf(t0 + 300), java.lang.Double.valueOf(230.0),
        java.lang.Double.valueOf(-2.0))),
      Seq(Row("ab0001", java.lang.Long.valueOf(t0 + 600), java.lang.Double.valueOf(0.0),
        java.lang.Double.valueOf(0.0))),
    )

    batches.zipWithIndex.foreach { case (rows, idx) =>
      val now = t0 + 300L * idx
      val states = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), Schemas.states)
      // Phase A: merge snapshot with persisted state.
      val prior =
        Sources.readParquetOrEmpty(spark, statePath(stateVersion), Schemas.source)
      val updated = ActiveFlightsJob.stateUpdate(states, prior, now - 1200)
      Sources.writeState(updated, statePath(stateVersion + 1))
      stateVersion += 1
      // Phase B: classify, emit completed flights, persist survivors.
      val source =
        Sources.readParquetOrEmpty(spark, statePath(stateVersion), Schemas.source)
      val out = CompleteFlightsJob.transform(source, metadata)
      Sources.writeState(out.active, statePath(stateVersion + 1))
      stateVersion += 1
      Sources.writeFlights(out.complete, sinkPath)
      println(s"=== batch $idx ===")
      println(s"state after batch:")
      Sources.readParquetOrEmpty(spark, statePath(stateVersion), Schemas.source)
        .orderBy("icao24").show(false)
    }

    println("=== completed flights sink ===")
    spark.read.parquet(sinkPath).show(false)

    // Connector-shaped alternative sink (reference db.py parity):
    // driver-side TTL'd collection create, per-partition batched
    // insertMany through the typed Flight record.
    import spark.implicits._
    val completed = spark.read.parquet(sinkPath)
      .drop("landed_date").as[graft.Flight]
    val store = new DemoStore
    graft.sources.TimeSeriesSink.writeFlights(completed, store,
      batchSize = 100)
    println(s"=== connector sink: ${DemoStore.inserted.get()} docs in " +
      s"${DemoStore.batches.get()} batches (TTL " +
      s"${graft.sources.TimeSeriesSink.FlightsExpirationSeconds}s) ===")
    spark.stop()
  }
}

/** Minimal in-JVM store double for the demo: counts what a real
  * Mongo/JDBC client would receive (state is static — executor tasks
  * share the JVM in local mode).
  */
class DemoStore extends graft.sources.TimeSeriesSink.TimeSeriesStore {
  override def ensureCollection(
      name: String, timeField: String, metaField: String,
      expireAfterSeconds: Long): Boolean =
    DemoStore.created.compareAndSet(false, true)

  override def newWriter(collection: String)
      : graft.sources.TimeSeriesSink.BatchWriter =
    new graft.sources.TimeSeriesSink.BatchWriter {
      override def insertMany(docs: Seq[graft.Flight]): Unit = {
        DemoStore.inserted.addAndGet(docs.size)
        DemoStore.batches.incrementAndGet()
      }
      override def close(): Unit = ()
    }
}

object DemoStore {
  val created = new java.util.concurrent.atomic.AtomicBoolean(false)
  val inserted = new java.util.concurrent.atomic.AtomicInteger(0)
  val batches = new java.util.concurrent.atomic.AtomicInteger(0)
}
