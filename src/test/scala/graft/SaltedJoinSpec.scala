package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salting must not change join semantics, and must actually flatten
  * the per-reducer load of a hot key.
  */
class SaltedJoinSpec extends SparkSpecBase {

  private val buckets = 8

  // 90% of fact rows share one hot key — the straggler shape.
  private lazy val fact = {
    import spark.implicits._
    (1 to 2000).map { i =>
      val key = if (i % 10 != 0) 7L else (i % 50).toLong
      (i.toLong, key, i * 1.5)
    }.toDF("row_id", "fk", "amount")
  }

  private lazy val dim = {
    import spark.implicits._
    (0 to 50).map(k => (k.toLong, s"name_$k")).toDF("dk", "name")
  }

  test("salted inner join returns exactly the plain join's rows") {
    val salted = SaltedJoin.inner(fact, dim, "fk", "dk",
        saltFrom = Seq("row_id"), buckets = buckets)
      .select("row_id", "fk", "amount", "name")
      .collect().toSeq.sortBy(_.getLong(0))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("row_id", "fk", "amount", "name")
      .collect().toSeq.sortBy(_.getLong(0))
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("the hot key's largest reducer group shrinks by ~buckets") {
    val maxPlain = fact.groupBy("fk").count()
      .agg(max("count")).head().getLong(0)
    val maxSalted = fact
      .withColumn("salt", pmod(xxhash64(col("row_id")), lit(buckets)))
      .groupBy("fk", "salt").count()
      .agg(max("count")).head().getLong(0)
    // 1800 hot rows over 8 buckets → ideal 225; allow hash unevenness.
    assert(maxPlain >= 1800, s"skew fixture broken: $maxPlain")
    assert(maxSalted <= maxPlain / (buckets / 2),
      s"salting left a straggler: $maxSalted vs $maxPlain")
  }

  test("salt column does not leak into the result") {
    val out = SaltedJoin.inner(fact, dim, "fk", "dk",
      saltFrom = Seq("row_id"), buckets = buckets)
    assert(!out.columns.contains("__salt"))
  }

  // uniform keys: every key appears ~40×/2000 = 2% ≈ the average
  // reducer share — no measured skew
  private lazy val uniformFact = {
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, (i % 50).toLong, i * 1.5))
      .toDF("row_id", "fk", "amount")
  }

  test("self-tuning: unskewed input measures buckets=1 and plans a " +
      "plain join (no dimension replication)") {
    val b = SaltedJoin.decideBuckets(uniformFact, "fk",
      sampleFraction = 1.0)
    assert(b == 1, s"uniform keys must not salt, got $b buckets")
    val plan = SaltedJoin.auto(uniformFact, dim, "fk", "dk",
        saltFrom = Seq("row_id"), sampleFraction = 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("__salt") && !plan.contains("explode"),
      s"plain path must not replicate the dimension:\n$plan")
  }

  test("self-tuning: measured skew salts, with enough buckets to " +
      "flatten the hot key, and keeps plain-join semantics") {
    val b = SaltedJoin.decideBuckets(fact, "fk", sampleFraction = 1.0)
    assert(b > 1, "90%-hot key must trigger salting")
    val auto = SaltedJoin.auto(fact, dim, "fk", "dk",
        saltFrom = Seq("row_id"), sampleFraction = 1.0)
      .select("row_id", "fk", "amount", "name")
      .collect().toSeq.sortBy(_.getLong(0))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("row_id", "fk", "amount", "name")
      .collect().toSeq.sortBy(_.getLong(0))
    assert(auto == plain)
  }
}
