package graft.sources

import org.apache.spark.sql.Dataset

import graft.Flight

/** Connector-shaped time-series sink: the distributed twin of the
  * reference's document-store write path (reference:
  * complete_flights/db.py:42-79 — idempotent collection create with a
  * TTL, typed documents, `insert_many` batching).
  *
  * Shape, not vendor: `TimeSeriesStore` is the minimal client surface a
  * Mongo/JDBC/HTTP bulk API exposes. The Spark side is the part that
  * matters at scale and is fully real here:
  *   - collection create runs ONCE, on the driver, before the job —
  *     not once per task (N executors racing idempotent DDL);
  *   - each partition opens its own client (`newWriter` runs inside
  *     the executor task — connections are never serialized from the
  *     driver) and writes `batchSize`-bounded `insertMany` calls, so
  *     driver memory is never on the data path and a 1000-partition
  *     write is 1000 independent bulk streams;
  *   - empty partitions open no connection at all (the reference's
  *     "Empty document. Nothing to write" guard, per partition).
  *
  * Delivery semantics: AT-LEAST-ONCE, like the reference's
  * `insert_many` — a task retry re-sends its partition's batches. A
  * real store makes this effectively-once by writing through a natural
  * key (`_id` = (icao24, landed_at) upsert); the `BatchWriter`
  * implementation owns that choice, the Spark side deliberately does
  * not buffer or coordinate.
  *
  * The parquet path (`Sources.writeFlights` + `RetentionJob`) remains
  * the engine-native sink; this is the connector-parity alternative.
  */
object TimeSeriesSink {

  /** What a concrete store must provide. `newWriter` is called on
    * EXECUTORS — implementations must be constructible there (carry
    * config, not connections).
    */
  trait TimeSeriesStore extends Serializable {
    /** Idempotent: create the TTL'd time-series collection if absent,
      * return true if this call created it
      * (reference: db.py:44-57 — CollectionInvalid swallowed).
      */
    def ensureCollection(
        name: String, timeField: String, metaField: String,
        expireAfterSeconds: Long): Boolean

    /** Per-partition writer; closed when the partition finishes. */
    def newWriter(collection: String): BatchWriter
  }

  trait BatchWriter extends AutoCloseable {
    def insertMany(docs: Seq[Flight]): Unit
  }

  val FlightsExpirationSeconds: Long = 60L * 60 * 24 * 365

  /** Write a typed completed-flights Dataset through the store. */
  def writeFlights(
      flights: Dataset[Flight],
      store: TimeSeriesStore,
      collection: String = "flights",
      batchSize: Int = 1000): Unit = {
    require(batchSize > 0, "batchSize must be positive")
    // driver-side, once — not a per-task race on idempotent DDL
    store.ensureCollection(collection, timeField = "landed_at",
      metaField = "icao24", expireAfterSeconds = FlightsExpirationSeconds)
    flights.foreachPartition { (it: Iterator[Flight]) =>
      if (it.hasNext) {
        val w = store.newWriter(collection)
        try it.grouped(batchSize).foreach(b => w.insertMany(b.toSeq))
        finally w.close()
      }
    }
  }
}
