package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import graft.sources.{StatesV2Scan, StatesV2Source}

/** Runtime (join-driven) filtering and statistics reporting on the
  * states DSv2 connector.
  */
class StatesV2RuntimeFilterSpec extends SparkSpecBase {

  private def read(rows: Long, partitions: Int): DataFrame =
    spark.read.format("graft-states")
      .option("rows", rows).option("partitions", partitions)
      .option("seed", 7).load()

  test("the scan reports row-count and size statistics to Catalyst") {
    val df = read(10000, 4)
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(10000)) ||
      stats.sizeInBytes == BigInt(10000L * 48L),
      s"expected source-reported stats, got $stats")
    // a pushed limit shrinks the estimate with it
    val lim = read(10000, 4).limit(5)
    assert(lim.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(10L * 48L))
  }

  test("runtime filters prune generation inside the readers") {
    val full = read(5000, 1).collect()
    val wanted = full.take(40).map(_.getString(0)).distinct.take(8)

    val scan = StatesV2Scan(
      rows = 5000, partitions = 1, seed = 7,
      rowsPerBatch = 100, maxRows = 5000,
      required = StatesV2Source.schema)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("icao24", wanted.toArray[Any])))
    val factory = scan.createReaderFactory()
    val reader = factory.createReader(scan.planInputPartitions().head)
    var n = 0
    while (reader.next()) {
      assert(wanted.contains(reader.get().getUTF8String(0).toString))
      n += 1
    }
    val expected = full.count(r => wanted.contains(r.getString(0)))
    assert(n == expected && n > 0,
      s"runtime-filtered reader emitted $n rows, expected $expected")
  }

  test("runtime filters ride the re-planned partitions into the " +
      "COLUMNAR reader (the factory predates them)") {
    // Spark forces the reader factory at physical planning — before a
    // DPP subquery delivers its IN-set — so filters baked into the
    // factory would miss every runtime filter; they must travel via
    // planInputPartitions(), which IS re-invoked after filter().
    val full = read(5000, 1).collect()
    val wanted = full.take(40).map(_.getString(0)).distinct.take(8)
    val scan = StatesV2Scan(
      rows = 5000, partitions = 1, seed = 7,
      rowsPerBatch = 100, maxRows = 5000,
      required = StatesV2Source.schema, columnar = true)
    val factory = scan.createReaderFactory() // created BEFORE filter()
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("icao24", wanted.toArray[Any])))
    val part = scan.planInputPartitions().head // re-planned AFTER
    assert(factory.asInstanceOf[graft.sources.StatesV2ReaderFactory]
      .supportColumnarReads(part))
    val reader = factory.createColumnarReader(part)
    var n = 0
    while (reader.next()) {
      val batch = reader.get()
      n += batch.numRows()
      val it = batch.rowIterator()
      while (it.hasNext) {
        assert(wanted.contains(it.next().getUTF8String(0).toString))
      }
    }
    val expected = full.count(r => wanted.contains(r.getString(0)))
    assert(n == expected && n > 0,
      s"columnar reader emitted $n rows, expected $expected pruned")
  }

  test("unsupported runtime filter shapes are ignored, not applied") {
    val scan = StatesV2Scan(
      rows = 100, partitions = 1, seed = 7,
      rowsPerBatch = 100, maxRows = 100,
      required = StatesV2Source.schema)
    // a filter on a column the eval cannot derive must not drop rows
    scan.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("no_such_column", "x")))
    val reader = scan.createReaderFactory()
      .createReader(scan.planInputPartitions().head)
    var n = 0
    while (reader.next()) n += 1
    assert(n == 100)
  }

  test("joining a selective broadcast dim triggers dynamic pruning of the scan") {
    // the dim must keep a real Filter node in its plan — a
    // constant-foldable local dim collapses to LocalRelation and DPP
    // sees no selective predicate to propagate
    val fact = read(200000, 8)
    val dim = read(2000, 1)
      .filter(pmod(col("last_contact"), lit(97L)) === 0L)
      .select(col("icao24").as("dim_icao"), col("last_contact").as("dim_lc"))
    val joined = fact.join(broadcast(dim), col("icao24") === col("dim_icao"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery on the scan:\n${plan.take(2500)}")
    // and the pruned result is exactly the unpruned join
    val dimKeys = dim.collect().map(_.getString(0)).toSet
    val expected = fact.collect().count(r => dimKeys.contains(r.getString(0)))
    assert(joined.count() == expected && expected > 0)
  }
}
