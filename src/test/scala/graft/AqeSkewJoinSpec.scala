package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Head-to-head: AQE's runtime skew-join rewrite vs the manual
  * `SaltedJoin` operator on the same synthetically skewed key.
  *
  * AQE splits a skewed sort-merge-join partition at runtime, from map
  * output sizes — zero code changes, but it only applies when (a) the
  * join is a shuffled SMJ/SHJ, (b) the skew crosses its size
  * thresholds, and (c) splitting does not break a downstream operator's
  * required partitioning (a same-key aggregation right after the join
  * suppresses the rewrite). `SaltedJoin` flattens the load in the PLAN,
  * deterministically, for any join the planner picks and regardless of
  * what consumes the output — at the cost of replicating the dimension
  * side `buckets`×. Use AQE as the default; reach for salting when the
  * skew is known and stable, the dimension is small (cheap to
  * replicate) but above the broadcast threshold, or the skewed join
  * feeds a same-key shuffle consumer AQE refuses to split.
  * `examples.SkewBench` measures the same shapes at 10M rows.
  */
class AqeSkewJoinSpec extends SparkSpecBase {

  // Isolated session: suites run in parallel threads against the shared
  // SparkContext, so skew confs must live in this spec's OWN SQLConf —
  // mutating the shared session's conf races with plan assertions in
  // concurrently running suites.
  private lazy val skewSession = {
    val s = spark.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  // ~95% of fact rows share key 7; the pad must be INCOMPRESSIBLE —
  // shuffle blocks are lz4'd and a constant pad compresses below the
  // skew threshold, hiding the skew from AQE's map-output stats.
  private lazy val fact = {
    val session = skewSession
    import session.implicits._
    (1 to 60000).map { i =>
      val key = if (i % 20 != 0) 7L else (i % 50).toLong
      val pad = (0 until 8)
        .map(j => "%016x".format((i * 8L + j) * 0x9E3779B97F4A7C15L))
        .mkString
      (i.toLong, key, pad)
    }.toDF("row_id", "fk", "pad")
  }

  private lazy val dim = {
    val session = skewSession
    import session.implicits._
    (0 to 50).map(k => (k.toLong, s"name_$k")).toDF("dk", "name")
  }

  private def finalPlan(df: DataFrame) = {
    // collect() (not df.write, which builds a SEPARATE query execution)
    // so THIS queryExecution's adaptive plan actually runs and
    // re-optimizes — only then does isSkewJoin reflect the runtime
    // rewrite.
    df.collect()
    df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(df.queryExecution.executedPlan)
  }

  test("AQE rewrites the plain shuffled join as a skew join at runtime") {
    val joined = fact.join(dim, col("fk") === col("dk"))
    // string match: the final SMJ lives inside ResultQueryStage /
    // WholeStageCodegen wrappers that plan.collect does not descend
    // through (query stages have no children)
    val plan = finalPlan(joined).toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join, got:\n$plan")
    assert(plan.contains("skew=true") && plan.contains("skewed"),
      s"AQE did not mark the join skewed:\n$plan")
  }

  test("the salted join needs no runtime rewrite: no skewed SMJ, " +
      "and the same rows as the plain join") {
    val salted = SaltedJoin.inner(fact, dim, "fk", "dk",
      saltFrom = Seq("row_id"), buckets = 8)
    val plan = finalPlan(salted).toString
    assert(!plan.contains("skew=true"),
      s"salted join should already be flat, AQE still split it:\n$plan")

    val got = salted.groupBy("fk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = fact.join(dim, col("fk") === col("dk"))
      .groupBy("fk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("salting composes with a same-key downstream aggregation " +
      "(the shape where AQE declines to split)") {
    // join immediately re-aggregated on the join key: AQE cannot
    // split the skewed partition without breaking the aggregation's
    // required distribution, so the manual operator is the only
    // flattening available for this plan shape.
    val agg = SaltedJoin.inner(fact, dim, "fk", "dk",
        saltFrom = Seq("row_id"), buckets = 8)
      .groupBy("fk").agg(count(lit(1)).as("n"), max("name").as("name"))
    val rows = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(7L) == 57000L)
    assert(rows.values.sum == fact.join(dim, col("fk") === col("dk")).count())
  }
}
