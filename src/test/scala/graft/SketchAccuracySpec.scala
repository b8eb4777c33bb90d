package graft

import org.apache.spark.sql.functions._

/** The two sketch queries are rows-only at the oracle gate (their
  * outputs are approximate by construction); this spec pins what CAN
  * be guaranteed — the documented error bounds against the exact
  * answers on the same input.
  */
class SketchAccuracySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("HLL distinct counts stay within the configured relative error") {
    val rsd = 0.05 // approx_count_distinct's default rsd
    val exact = SparkEntry.queries("q14_users_per_type")(spark, dir)
      .select("event_type", "users")
    val approx = SparkEntry.queries("q15_approx_users_per_type")(spark, dir)
      .select("event_type", "approx_users")
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getLong(1).toDouble
      val a = r.getLong(2).toDouble
      // 5 sigma of the advertised rsd — fails on a real regression
      // (wrong column, wrong sketch width), never on sketch noise.
      assert(math.abs(a - e) / e <= 5 * rsd,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("approximate median stays within the accuracy epsilon") {
    val exact = SparkEntry.queries("q20_value_percentiles")(spark, dir)
    val approx = SparkEntry.queries("q26_approx_percentiles")(spark, dir)
    val e = exact.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = approx.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getString(0)
      val a = r.getDouble(1)
      val ex = e(key)
      // GK sketch, accuracy 1000: rank error ≤ n/1000 (a couple of
      // ranks per group here) — value drift well under 5% of the exact
      // median on this distribution.
      assert(math.abs(a - ex) <= math.max(0.05 * math.abs(ex), 1e-6),
        s"$key p50: approx $a vs exact $ex")
    }
  }

  test("HLL sketches are mergeable: union of shard sketches equals the " +
      "whole-corpus sketch") {
    // THE property that makes sketch aggregation distribute: partial
    // per-shard sketches map-side combine into exactly the result the
    // single-pass sketch gives. Datasketches HLL with fixed lgK is
    // deterministic, so equality is exact, not approximate.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), pmod(col("user_id"), lit(4)).as("shard"))
    val whole = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("n"))
      .head().getLong(0)
    val merged = events
      .groupBy("shard")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head().getLong(0)
    assert(merged == whole,
      s"shard-merged estimate $merged != whole-corpus estimate $whole")
    val exact = events.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }
}
