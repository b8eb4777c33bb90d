package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 connector generating deterministic ADS-B-style state
  * snapshots — the connector slot the reference fills with an HTTP
  * client (`/api/states/all`), rebuilt as a first-class distributed
  * source: the scan is split into `partitions` independent input
  * partitions (each executor generates its own range — nothing is
  * funnelled through the driver), and required-column pushdown means a
  * projection of 2 of the 4 columns only materializes those 2.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-states")
  *     .option("rows", 1000000).option("partitions", 32)
  *     .option("seed", 42).load()
  * }}}
  *
  * Rows are a pure function of (seed, row index) — splitmix64 — so any
  * subset, any partitioning, and repeated reads agree exactly.
  */
class StatesV2Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-states"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatesV2Source.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatesV2Table(new CaseInsensitiveStringMap(properties))
}

object StatesV2Source {
  val schema: StructType = StructType(Seq(
    StructField("icao24", StringType, nullable = false),
    StructField("last_contact", LongType, nullable = false),
    StructField("velocity", DoubleType, nullable = true),
    StructField("vertical_rate", DoubleType, nullable = true)))

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

class StatesV2Table(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = "graft_states"
  override def schema(): StructType = StatesV2Source.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the load-time options as table properties; the
    // per-read options arrive here. Merge with read options winning.
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    new StatesV2ScanBuilder(merged)
  }
}

class StatesV2ScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var required: StructType = StatesV2Source.schema
  private var countStarPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // COUNT(*) with no grouping is answerable from the `rows` option
  // alone — complete pushdown, zero rows generated. Everything else
  // stays in Spark.
  override def supportCompletePushDown(
      aggregation: aggregate.Aggregation): Boolean =
    isBareCountStar(aggregation)

  override def pushAggregation(
      aggregation: aggregate.Aggregation): Boolean = {
    countStarPushed = isBareCountStar(aggregation)
    countStarPushed
  }

  private def isBareCountStar(a: aggregate.Aggregation): Boolean =
    a.groupByExpressions.isEmpty &&
      a.aggregateExpressions.length == 1 &&
      a.aggregateExpressions.head.isInstanceOf[aggregate.CountStar]

  override def build(): Scan = StatesV2Scan(
    rows = options.getLong("rows", 1000L),
    partitions = options.getInt("partitions", 4),
    seed = options.getLong("seed", 0L),
    rowsPerBatch = options.getLong("rowsPerBatch", 100L),
    maxRows = options.getLong("maxRows", 1000L),
    required = required,
    countStarPushed = countStarPushed)
}

case class StatesV2RangePartition(start: Long, end: Long, seed: Long)
  extends InputPartition

case class StatesV2Scan(
    rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long, maxRows: Long, required: StructType,
    countStarPushed: Boolean = false)
  extends Scan with Batch {

  override def readSchema(): StructType =
    if (countStarPushed)
      StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    else required

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    if (countStarPushed) Array(StatesV2RangePartition(0L, 1L, seed))
    else StatesV2Scan.splitRange(0L, rows, partitions, seed)

  override def createReaderFactory(): PartitionReaderFactory =
    if (countStarPushed) new StatesV2CountFactory(rows)
    else new StatesV2ReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new StatesV2MicroBatchStream(
      rowsPerBatch, maxRows, partitions, seed, required)
}

object StatesV2Scan {
  def splitRange(
      start: Long, end: Long, partitions: Int, seed: Long)
      : Array[InputPartition] = {
    val total = end - start
    val n = math.max(1, partitions)
    val per = (total + n - 1) / n
    (0 until n).iterator
      .map(i => StatesV2RangePartition(
        start + i * per, math.min(end, start + (i + 1) * per), seed))
      .filter(p => p.end > p.start)
      .toArray
  }
}

/** Offset = number of rows emitted so far; rows keep the same pure
  * (seed, index) derivation as the batch scan, so a streamed prefix
  * equals the batch read of the same length. `maxRows` bounds the
  * stream (latestOffset stops advancing), which is what lets tests —
  * and backfill jobs — drain it to completion.
  */
case class StatesV2Offset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class StatesV2MicroBatchStream(
    rowsPerBatch: Long, maxRows: Long, partitions: Int, seed: Long,
    required: StructType) extends MicroBatchStream {

  private var latest = 0L

  override def initialOffset(): Offset = StatesV2Offset(0L)

  override def latestOffset(): Offset = {
    latest = math.min(maxRows, latest + rowsPerBatch)
    StatesV2Offset(latest)
  }

  override def deserializeOffset(json: String): Offset =
    StatesV2Offset(json.toLong)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] =
    StatesV2Scan.splitRange(
      start.asInstanceOf[StatesV2Offset].n,
      end.asInstanceOf[StatesV2Offset].n, partitions, seed)

  override def createReaderFactory(): PartitionReaderFactory =
    new StatesV2ReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Complete COUNT(*) pushdown: one partition, one row, no generation. */
class StatesV2CountFactory(rows: Long) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow(rows)
      override def close(): Unit = ()
    }
}

class StatesV2ReaderFactory(required: StructType)
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatesV2RangePartition]
    // bind the projection once per partition, not per row
    val getters: Array[Long => Any] = required.fields.map { f =>
      f.name match {
        case "icao24" => (h: Long) =>
          UTF8String.fromString("%06x".format(h & 0xffffffL))
        case "last_contact" => (h: Long) =>
          1700000000L + ((h >>> 24) & 0xfffffL)
        case "velocity" => (h: Long) =>
          if (((h >>> 8) % 13) == 0) null
          else ((h >>> 16) % 2000L).toDouble / 10.0
        case "vertical_rate" => (h: Long) =>
          if (((h >>> 12) % 17) == 0) null
          else ((h >>> 20) % 600L).toDouble / 10.0 - 30.0
        case other =>
          throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        val h = StatesV2Source.splitmix64(p.seed + i)
        InternalRow.fromSeq(getters.map(_(h)).toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
