package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins: two tables bucketed+sorted on the
  * join key join WITHOUT any shuffle exchange — the pre-partitioning
  * strategy that removes the dominant cost of repeated fact-fact joins
  * at scale.
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("join between co-bucketed tables plans no shuffle") {
    // isolated session: broadcast/AQE toggles must not leak into plan
    // assertions in suites running concurrently on the shared session
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS o_bucketed")
    s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    s.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = s.table("li_bucketed")
      .join(s.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
    joined.collect()

    val shuffles = joined.queryExecution.executedPlan.collect {
      case sh: ShuffleExchangeExec => sh
    }
    // exactly ONE shuffle: the groupBy — the join itself is
    // co-located via bucket pruning
    assert(shuffles.size == 1,
      s"expected only the aggregation shuffle, got:\n${joined.queryExecution.executedPlan}")

    // and the result matches the unbucketed join
    val plain = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(s.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
    assertSameRows(joined, plain.collect().toSeq)
  }
}
