package graft

import org.apache.spark.sql.functions._

/** The sketch queries carry full hash oracles via accuracy-contract
  * outputs (exact values + a derived error-band/bracket column); this
  * spec pins the documented error bounds against the exact answers on
  * the same input, exercising the live sketches directly.
  */
class SketchAccuracySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("HLL distinct counts stay within the configured relative error") {
    // q15's output IS the accuracy contract: err_band =
    // floor(|approx - exact| / exact / 0.15), derived from the live
    // sketch. Band 0 means the estimate landed within 15% relative
    // error — ~7.5 sigma of the configured rsd=0.02, so a non-zero
    // band is a real regression (wrong column, wrong sketch width),
    // never sketch noise. Cross-check `users` against q14's exact
    // counts so the companion column is verified too.
    val rows = SparkEntry.queries("q15_approx_users_per_type")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L,
        s"${r.getString(0)}: err_band ${r.getLong(2)} != 0")
    }
    val exact = SparkEntry.queries("q14_users_per_type")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"${r.getString(0)}: q15 users ${r.getLong(1)} != q14 exact")
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
