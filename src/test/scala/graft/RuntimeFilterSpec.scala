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

  // Isolated session: suites run in parallel threads against the shared
  // SparkContext, so the runtime-filter confs must live in this spec's
  // OWN SQLConf — mutating the shared session's conf races with plan
  // assertions in concurrently running suites.
  private lazy val rfSession = {
    val s = spark.newSession()
    Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  private def joined(s: org.apache.spark.sql.SparkSession) = {
    val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
  }

  test("a selective dimension filter injects a bloom filter into the " +
      "fact scan side") {
    val plan = joined(rfSession).queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain") &&
      plan.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$plan")
  }

  test("the filtered plan returns exactly the unfiltered join's rows") {
    val withFilter = joined(rfSession).count()
    val without = joined(spark).count()
    assert(withFilter == without && withFilter > 0,
      s"bloom pruning changed the result: $withFilter vs $without")
  }
}
