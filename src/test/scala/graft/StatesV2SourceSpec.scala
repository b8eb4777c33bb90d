package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DSv2 states connector: deterministic content, real partition
  * planning (each split generates independently on the executors), and
  * required-column pushdown reaching the scan.
  */
class StatesV2SourceSpec extends SparkSpecBase {

  private def read(rows: Long, partitions: Int, seed: Long = 42L): DataFrame =
    spark.read.format("graft-states")
      .option("rows", rows).option("partitions", partitions)
      .option("seed", seed).load()

  test("row count, split count, and schema are as requested") {
    val df = read(rows = 10007, partitions = 5)
    assert(df.count() == 10007)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.columns.toSeq ==
      Seq("icao24", "last_contact", "velocity", "vertical_rate"))
  }

  test("content is deterministic and independent of the split count") {
    val a = read(10007, 5).orderBy("icao24", "last_contact").collect().toSeq
    val b = read(10007, 13).orderBy("icao24", "last_contact").collect().toSeq
    assert(a == b)
    assert(a.exists(_.isNullAt(2)), "null velocities must appear")
  }

  test("a different seed produces different content") {
    val a = read(1000, 4, seed = 1L).agg(sum("last_contact")).head().getLong(0)
    val b = read(1000, 4, seed = 2L).agg(sum("last_contact")).head().getLong(0)
    assert(a != b)
  }

  test("required-column pushdown prunes the scan to the projected columns") {
    val df = read(1000, 4).select("icao24", "velocity")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 scans print the pruned output list on the BatchScan node
    assert("BatchScan graft_states\\[icao24#\\d+, velocity#\\d+\\]".r
      .findFirstIn(plan).isDefined, s"pruning missing in:\n$plan")
    assert(!plan.contains("last_contact"), s"unpruned column in:\n$plan")
  }

  test("count(*) is answered by aggregate pushdown without generating rows") {
    val df = read(rows = 123456789L, partitions = 4)
    val counted = df.agg(count(lit(1)))
    val plan = counted.queryExecution.executedPlan.toString
    // pushed: the scan's output IS the count; no per-row generation.
    // (123M rows would take minutes if actually generated.) The time
    // bound is generous — parallel suites contend for the 4 local
    // cores, and the REAL check is the plan assertion below.
    val t0 = System.nanoTime()
    assert(counted.head().getLong(0) == 123456789L)
    assert((System.nanoTime() - t0) / 1e9 < 60.0, "count must not scan")
    assert(plan.contains("PushedAggregates: [COUNT(*)]") ||
      plan.contains("count(*)"), s"pushdown missing in:\n$plan")
  }

  test("micro-batch streaming drains to maxRows and equals the batch prefix") {
    val session = spark
    import session.implicits._
    val q = spark.readStream.format("graft-states")
      .option("rowsPerBatch", 300).option("maxRows", 1000)
      .option("partitions", 4).option("seed", 42L).load()
      .writeStream.outputMode("append")
      .format("memory").queryName("states_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("states_stream")
        .orderBy("icao24", "last_contact").collect().toSeq
      val batch = read(rows = 1000, partitions = 4, seed = 42L)
        .orderBy("icao24", "last_contact").collect().toSeq
      assert(streamed.size == 1000)
      assert(streamed == batch,
        "streamed prefix must equal the batch read of the same length")
    } finally q.stop()
  }

  test("filter pushdown: fully-pushed predicates leave no Spark Filter " +
      "and match the unpushed row set") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val pred = col("velocity") >= 100.0 && col("icao24").startsWith("0")
    val filtered = read(20011, 7).filter(pred)

    // every supported conjunct pushed → Catalyst drops its Filter node
    val residualFilters = filtered.queryExecution.optimizedPlan.collect {
      case f: LFilter => f
    }
    assert(residualFilters.isEmpty,
      s"expected no residual Filter, got:\n${filtered.queryExecution.optimizedPlan}")
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedFilters"), "scan description must surface pushed filters")

    // pushed evaluation must agree exactly with Spark-side evaluation
    // over the full generated set (nulls included)
    val sparkSide = read(20011, 7).collect()
      .filter(r => !r.isNullAt(2) && r.getDouble(2) >= 100.0 &&
        r.getString(0).startsWith("0"))
    val got = filtered.collect()
    assert(got.length == sparkSide.length && got.length > 0)
    assert(got.sortBy(r => (r.getString(0), r.getLong(1))).toSeq ==
      sparkSide.sortBy(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("filter pushdown honors SQL null semantics under negation") {
    // NOT(velocity = 5.0): rows with NULL velocity must NOT pass
    val df = read(20011, 7).filter(!(col("velocity") === 5.0))
    assert(df.collect().forall(r => !r.isNullAt(2)),
      "NULL velocity rows must be rejected by NOT(=) like Spark would")
    // and IS NULL itself is pushable and correct
    val nulls = read(20011, 7).filter(col("velocity").isNull)
    assert(nulls.collect().forall(_.isNullAt(2)))
    assert(nulls.count() > 0)
  }

  test("pushed In / Not(In) with a NULL literal follow SQL three-valued " +
      "logic") {
    val base = read(20011, 7)
    // IN (100.0, NULL): TRUE only on a match — matches Spark exactly
    val in = base.filter(col("velocity").isin(100.0, null)).collect()
    val expected = base.collect()
      .filter(r => !r.isNullAt(2) && r.getDouble(2) == 100.0)
    assert(in.length == expected.length && in.nonEmpty)
    // NOT IN with a NULL literal is never TRUE (match → FALSE,
    // no match → UNKNOWN): must return zero rows, like Spark
    assert(base.filter(!col("velocity").isin(100.0, null)).count() == 0)
  }

  test("unsupported predicate shapes remain as residual Spark filters") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // contains() maps to StringContains, which the source declines
    val df = read(5003, 4).filter(col("icao24").contains("ab"))
    val residual = df.queryExecution.optimizedPlan.collect {
      case f: LFilter => f
    }
    assert(residual.nonEmpty, "residual filter must stay in Spark")
    assert(df.count() ==
      read(5003, 4).collect().count(_.getString(0).contains("ab")))
  }

  test("count(*) pushdown is disabled on a filtered scan") {
    val df = read(10007, 4).filter(col("velocity") >= 100.0)
    val n = df.count()
    val expected = read(10007, 4).collect()
      .count(r => !r.isNullAt(2) && r.getDouble(2) >= 100.0)
    assert(n == expected,
      "filtered count must reflect the filter, not the rows option")
  }

  test("unfiltered scans read vectorized when opted in: ColumnarToRow " +
      "in the plan, identical content to the row path") {
    val df = spark.read.format("graft-states")
      .option("rows", 20000).option("partitions", 4).option("seed", 42L)
      .option("columnar", true).load()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"expected the vectorized read path:\n$plan")
    // row path still serves filtered scans — force it via a pushed
    // filter that keeps every row, and compare content
    val rowPath = read(20000, 4).filter(col("icao24").isNotNull)
    assert(df.collect().toSeq == rowPath.collect().toSeq)
    // nulls survive vectorization (velocity/vertical_rate are nullable)
    assert(df.filter(col("velocity").isNull).count() > 0)
  }

  test("limit pushdown: unfiltered limit generates only the prefix") {
    val df = read(100000, 8).limit(7)
    val got = df.collect()
    assert(got.length == 7)
    // deterministic source: the pushed prefix equals the full read's
    // first 7 rows in partition-index order
    assert(got.toSeq == read(100000, 8).collect().take(7).toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(df.queryExecution.optimizedPlan.toString.contains("PushedLimit") ||
      plan.contains("PushedLimit"), s"limit was not pushed:\n$plan")
  }

  test("limit pushdown composes with filters as a per-partition cap") {
    val base = read(20011, 4).filter(col("velocity") > 150.0)
    val df = base.limit(9)
    val got = df.collect()
    assert(got.length == 9)
    assert(got.forall(r => r.getDouble(2) > 150.0))
    // partial push: Spark keeps its own global Limit on top
    assert(df.queryExecution.optimizedPlan.toString.contains("GlobalLimit") ||
      df.queryExecution.executedPlan.toString.contains("Limit"))
  }

  test("a stopped-and-restarted stream resumes from the checkpoint " +
      "without re-emitting rows") {
    val ckpt = java.nio.file.Files.createTempDirectory("sv2-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("sv2-out").toString
    def start(maxRows: Long) = spark.readStream.format("graft-states")
      .option("rowsPerBatch", 150).option("maxRows", maxRows)
      .option("partitions", 4).option("seed", 42L).load()
      .writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .outputMode("append").start()

    def sunk(): Long =
      try spark.read.parquet(out).count() catch { case _: Exception => 0L }

    def drainTo(n: Long, q: org.apache.spark.sql.streaming.StreamingQuery)
        : Unit =
      try {
        val deadline = System.currentTimeMillis + 120000
        while (sunk() < n && System.currentTimeMillis < deadline)
          Thread.sleep(100)
        assert(sunk() == n, s"expected $n sunk rows, got ${sunk()}")
      } finally q.stop()

    // phase 1: drain to the CONFIGURED bound (a batch boundary — a
    // mid-batch stop() races the sink commit and makes row counts
    // nondeterministic), then stop
    drainTo(450, start(maxRows = 450))
    // phase 2: restart from the checkpoint with a higher bound — must
    // resume at 450, not regress to offset 0
    drainTo(900, start(maxRows = 900))

    val rows = spark.read.parquet(out)
    assert(rows.count() == 900,
      s"restart re-emitted or lost rows: ${rows.count()} != 900")
    // exact prefix parity with the batch read — no duplicates, no gaps
    val streamed = rows.orderBy("icao24", "last_contact").collect().toSeq
    val batch = read(rows = 900, partitions = 4, seed = 42L)
      .orderBy("icao24", "last_contact").collect().toSeq
    assert(streamed == batch)
  }

  test("Trigger.AvailableNow drains to maxRows across batches, then " +
      "terminates") {
    val out = java.nio.file.Files.createTempDirectory("sv2-an-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sv2-an-ck").toString
    val q = spark.readStream.format("graft-states")
      .option("rowsPerBatch", 150).option("maxRows", 600)
      .option("partitions", 4).option("seed", 42L).load()
      .writeStream.option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    assert(q.awaitTermination(120000), "AvailableNow query must terminate")
    assert(spark.read.parquet(out).count() == 600,
      "AvailableNow must drain to maxRows, not stop after one batch")
  }

  test("latestOffset never regresses below a checkpoint-restored offset") {
    import graft.sources.{StatesV2MicroBatchStream, StatesV2Offset}
    val s = new StatesV2MicroBatchStream(
      rowsPerBatch = 100L, maxRows = 1000L, partitions = 4, seed = 42L,
      required = graft.sources.StatesV2Source.schema)
    // restart: Spark restores the committed offset via deserializeOffset
    s.deserializeOffset("600")
    val latest = s.latestOffset().asInstanceOf[StatesV2Offset]
    assert(latest.n >= 600L,
      s"latestOffset ${latest.n} regressed below the restored offset 600 — " +
        "restart would re-plan and re-emit already-committed rows")
    // and it still advances by rowsPerBatch from there, capped at maxRows
    assert(latest.n == 700L)
  }

  test("the source feeds the reference state-update pipeline end to end") {
    val states = read(5000, 8)
      .filter(col("velocity").isNotNull)
    // the flight-shaped projection the reference applies to /states/all
    val projected = states.select(
      col("icao24"), col("last_contact"),
      col("velocity"), col("vertical_rate"))
    assert(projected.count() > 4000) // ~1/13 nulls dropped
    val perIcao = projected.groupBy("icao24").count()
    assert(perIcao.count() > 0)
  }
}
