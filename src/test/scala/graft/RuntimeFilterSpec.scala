package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a shuffled join's build side
  * is selective, Catalyst injects a bloom filter of the build-side keys
  * into the probe side's scan — rows that cannot match are dropped
  * BEFORE the shuffle, which at 100 TB is the difference between
  * shuffling the whole fact table and shuffling the matching slice.
  * (Thresholds here are lowered to demo scale; production defaults are
  * 10MB creation / 10GB application side.)
  */
class RuntimeFilterSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  private def withRuntimeFilter[T](body: => T): T = {
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dimension filter injects a bloom filter into the " +
      "fact scan side") {
    withRuntimeFilter {
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
    }
  }

  test("the filtered plan returns exactly the unfiltered join's rows") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    def run(): Long = lineitem.join(orders,
      col("l_orderkey") === col("o_orderkey")).count()
    val withFilter = withRuntimeFilter(run())
    val without = run()
    assert(withFilter == without && withFilter > 0,
      s"bloom pruning changed the result: $withFilter vs $without")
  }
}
