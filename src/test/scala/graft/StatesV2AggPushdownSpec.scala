package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partial aggregate pushdown on the graft-states DSv2 connector:
  * per-partition pre-aggregation must agree exactly with Spark-side
  * aggregation over the raw rows, compose with pushed filters, and be
  * visible in the plan.
  */
class StatesV2AggPushdownSpec extends SparkSpecBase {

  private val N = 5000L

  private def states: DataFrame =
    spark.read.format("graft-states")
      .option("rows", N).option("partitions", 8).option("seed", 7)
      .load()

  /** The same rows with pushdown defeated: materialized locally, so
    * any aggregate over them is computed wholly by Spark.
    */
  private lazy val raw: DataFrame = {
    val rows = states.collect().toIndexedSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), states.schema)
  }

  private def explainString(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain(true) }
    out.toString
  }

  test("grouped min/max/sum/count match the no-pushdown computation") {
    val agg = (df: DataFrame) => df
      .groupBy("icao24")
      .agg(count(lit(1)).as("n"), count(col("velocity")).as("nv"),
        min("velocity").as("mn"), max("velocity").as("mx"),
        sum("last_contact").as("s"))
    assertSameRows(agg(states), agg(raw).collect().toSeq)
    val plan = explainString(agg(states))
    assert(plan.contains("PushedAggregation"),
      s"aggregation was not pushed:\n$plan")
  }

  test("global (ungrouped) aggregates merge partials across partitions") {
    // double sums are merge-order-sensitive in the last bits; round
    // so pushed (8 range partials) vs raw (4 partials) compare stably
    val agg = (df: DataFrame) => df.agg(
      min("velocity").as("mn"), max("velocity").as("mx"),
      round(sum("velocity"), 4).as("sv"), count(col("vertical_rate")).as("nr"))
    assertSameRows(agg(states), agg(raw).collect().toSeq)
    assert(explainString(agg(states)).contains("PushedAggregation"))
  }

  test("aggregate pushdown composes with pushed filters") {
    val agg = (df: DataFrame) => df
      .filter(col("velocity") > 100.0)
      .groupBy("icao24")
      .agg(count(lit(1)).as("n"), max("vertical_rate").as("mx"))
    assertSameRows(agg(states), agg(raw).collect().toSeq)
    val plan = explainString(agg(states))
    assert(plan.contains("PushedAggregation") &&
      plan.contains("PushedFilters"))
  }

  test("min/max on the string column push down") {
    val agg = (df: DataFrame) => df.agg(
      min("icao24").as("lo"), max("icao24").as("hi"))
    assertSameRows(agg(states), agg(raw).collect().toSeq)
    assert(explainString(agg(states)).contains("PushedAggregation"))
  }

  test("distinct declines the push; avg pushes as its sum/count parts") {
    // a distinct partial cannot be merged — must stay in Spark
    val d = states.agg(countDistinct(col("icao24")).as("u"))
    assert(!explainString(d).contains("PushedAggregation"))
    assertSameRows(d, raw.agg(countDistinct(col("icao24")).as("u")).collect().toSeq)
    // Spark decomposes avg into mergeable sum+count partials and
    // pushes THOSE — the final plan divides the merged sums
    // (rounded: double partial-merge order differs between plans)
    val a = states.agg(round(avg("velocity"), 6).as("a"))
    val plan = explainString(a)
    assert(plan.contains("sum_velocity") && plan.contains("count_velocity"),
      s"expected avg to push as sum+count partials:\n$plan")
    assertSameRows(a, raw.agg(round(avg("velocity"), 6).as("a")).collect().toSeq)
  }

  test("bare count(*) still takes the complete-pushdown path") {
    assert(states.count() == N)
  }
}
