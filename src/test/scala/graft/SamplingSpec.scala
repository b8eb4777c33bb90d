package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** The Sampling library API: stratum coverage, determinism, the
  * weight-proportional selection property, and the plan guard for the
  * group-limit pushdown. Oracle parity for the same expressions is
  * carried by t6/t15, which delegate here.
  */
class SamplingSpec extends SparkSpecBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified covers every stratum with at most n rows, " +
      "deterministically") {
    val a = Sampling.stratified(docs, Seq("lang", "source"), perStratum = 2)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    val b = Sampling.stratified(docs, Seq("lang", "source"), perStratum = 2)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    assert(a == b, "sample must be reproducible")
    val perStratum = Sampling
      .stratified(docs, Seq("lang", "source"), perStratum = 2)
      .groupBy("lang", "source").count()
    assert(perStratum.filter(col("count") > 2).isEmpty)
    // every non-empty stratum is represented
    val strata = docs.select("lang", "source").distinct().count()
    assert(perStratum.count() == strata)
  }

  test("weighted priority favors heavy rows ~proportionally") {
    import spark.implicits._
    // two weight classes, 10:1 — heavy rows should dominate the sample
    val pop = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) 1000L else 100L)).toDF("doc_id", "w")
    val picked = Sampling.weightedPriority(pop, col("w"), n = 200)
      .collect().map(_.getLong(0))
    assert(picked.length == 200)
    val heavy = picked.count(_ % 2 == 0)
    // E[heavy] ≈ 200 · 10/11 ≈ 182; allow a generous band
    assert(heavy > 150, s"heavy rows under-sampled: $heavy of 200")
    // determinism
    val again = Sampling.weightedPriority(pop, col("w"), n = 200)
      .collect().map(_.getLong(0))
    assert(picked.toSeq == again.toSeq)
  }

  test("stratified keeps the WindowGroupLimit pushdown") {
    val plan = Sampling.stratified(docs, Seq("lang"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-stratum rank must prune before the shuffle:\n$plan")
  }

  test("misuse fails fast") {
    intercept[IllegalArgumentException] {
      Sampling.stratified(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedPriority(docs, col("n_chars"), n = 0)
    }
  }
}
