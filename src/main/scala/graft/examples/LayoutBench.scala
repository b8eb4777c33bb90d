package graft.examples

import graft.operators.ZOrder
import graft.queries.Derived
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what Z-ordering buys: bytes actually read for a 2-D box
  * query (user range × time range) over the events table, written
  * (a) sorted by user only — the 1-D layout that prunes one dimension
  * and scans everything for the other — and (b) Z-ordered on
  * (user, hour). Same data, same files count, same query; the only
  * difference is row order, which is what parquet min/max row-group
  * stats see. At 100 TB this gap is the difference between a scan
  * that touches one executor's worth of files and one that touches
  * the whole table.
  *
  * Usage: runMain graft.examples.LayoutBench [sfDir]
  */
object LayoutBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/tmp/graft-layout"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // one row group per ~16 KB (4 KB pages) so row-group stats have
      // granularity on a 100k-row local table comparable to 128 MB
      // groups on a 100 TB one; both layouts get the same setting
      .config("spark.hadoop.parquet.block.size", s"${16 * 1024}")
      .config("spark.hadoop.parquet.page.size", s"${4 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Derived.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("hour"),
        col("event_type"), col("value"))

    ev.sort("user_id")
      .coalesce(8).write.mode("overwrite").parquet(s"$out/by_user")
    // bits=20: epoch-hours (~500k) wrap a 16-bit key (see ZOrder doc)
    ZOrder.layout(ev, col("user_id"), col("hour"), numFiles = 8, bits = 20)
      .write.mode("overwrite").parquet(s"$out/zorder")

    // box: ~30% of users × ~3% of hours — the shape a "these users,
    // last night" investigation takes. The user-sorted layout must
    // read the full 30% user band (hour stats are useless inside it);
    // the Z-layout touches only the band's few matching hour cells.
    val (u0, u1) = (100L, 549L)
    val Array(h0, h1) = ev.agg(min("hour"), max("hour")).head() match {
      case r => Array(r.getLong(0), r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 32)
    }

    @volatile var bytes = 0L
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        bytes += e.taskMetrics.inputMetrics.bytesRead
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(df: DataFrame): (Long, Long) = {
      bytes = 0L
      val n = df
        .filter(col("user_id").between(u0, u1) &&
          col("hour").between(h0, h1))
        .count()
      org.apache.spark.sql.graft.bridge.drainListeners(spark)
      (n, bytes)
    }

    // Footer floor: a never-matching predicate still pays the
    // per-task footer + column-index reads (~150 KB here — a fixed
    // cost that is noise against 128 MB row groups at scale but
    // dominates a 100k-row table). Subtract it so the reported ratio
    // reflects DATA bytes, the part that scales with the table.
    def floor(df: DataFrame): Long = {
      bytes = 0L
      df.filter(col("user_id").between(-5L, -1L)).count()
      org.apache.spark.sql.graft.bridge.drainListeners(spark)
      bytes
    }

    // warmup listings/footers, then measure
    Seq("by_user", "zorder").foreach { l =>
      measure(spark.read.parquet(s"$out/$l"))
    }
    val results = Seq("by_user", "zorder").map { l =>
      val df = spark.read.parquet(s"$out/$l")
      val f = floor(df)
      val (n, b) = measure(df)
      println(f"[layout] $l%-8s rows=$n%6d bytesRead=$b%10d footerFloor=$f%8d")
      l -> (n, b - f)
    }.toMap
    val (rowsU, bytesU) = results("by_user")
    val (rowsZ, bytesZ) = results("zorder")
    require(rowsU == rowsZ, s"layouts disagree: $rowsU vs $rowsZ")
    println(f"[layout] zorder reads ${bytesZ.toDouble / bytesU * 100}%.1f%% " +
      "of the 1-D layout's data bytes for the 2-D box")
    spark.stop()
  }
}
