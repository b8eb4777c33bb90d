package graft

import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** The DataFrame-first NearDup API: planted-corpus behavior, exact
  * parity with the oracle-verified d7/d8/t19 queries (same
  * expressions, so any drift is a bug), and the no-leakage guarantee
  * the split exists for.
  */
class NearDupSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planted = {
    import spark.implicits._
    // a/b: near-dups (one word changed out of 12 → most shingles
    // shared); c: unrelated; d/e: another near-dup family with
    // custom column names to exercise idCol/textCol mapping
    Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (12L, "one two three four five six seven eight nine ten eleven twelve"),
      (13L, "red orange yellow green blue indigo violet cyan magenta white gray black"),
      (14L, "red orange yellow green blue indigo violet cyan magenta white gray pink"))
      .toDF("doc_id", "text")
  }

  test("planted near-dups are found, verified, and clustered; " +
      "unrelated docs are not") {
    val pairs = NearDup.verifiedPairs(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5))
      .toMap
    assert(pairs.contains((10L, 11L)), s"missing planted pair in $pairs")
    assert(pairs.contains((13L, 14L)))
    assert(pairs.keys.forall { case (a, b) => Set(a, b) != Set(10L, 12L) })
    // 12 words → 10 shingles each, 9 shared → jaccard 9/11
    assert(math.abs(pairs((10L, 11L)) - 9.0 / 11.0) < 1e-6)

    val comps = NearDup.clusters(planted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(10L -> 10L, 11L -> 10L, 13L -> 13L, 14L -> 13L))
  }

  test("custom id/text column names map onto the same pipeline") {
    val renamed = planted
      .withColumnRenamed("doc_id", "pk").withColumnRenamed("text", "body")
    val comps = NearDup.clusters(renamed, idCol = "pk", textCol = "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(11L) == 10L && comps(14L) == 13L)
  }

  test("API output is identical to the oracle-verified queries") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val api = NearDup.verifiedPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toSet
    val d7 = SparkEntry.queries("d7_lsh_verified_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toSet
    assert(api == d7)

    val apiClusters = NearDup.clusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d8 = SparkEntry.queries("d8_dedup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(apiClusters == d8)
  }

  test("split assignment aggregates to exactly the t19 query output") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val api = NearDup.leakageSafeSplit(docs)
      .groupBy("split").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t19 = SparkEntry.queries("t19_leakage_safe_split")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(api == t19)
  }

  test("no near-dup family straddles a split boundary") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val split = NearDup.leakageSafeSplit(docs).select("doc_id", "split")
    val comps = NearDup.clusters(docs)
    val sides = split.join(comps, Seq("doc_id"))
      .groupBy("component").agg(countDistinct("split").as("n_sides"))
      .agg(max("n_sides")).head().getLong(0)
    assert(sides == 1L, "a duplicate family crossed a split boundary")
  }

  test("exact dedup keeps the minimum-id member and passes columns through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The  Quick brown fox", "keep"),
      (2L, "the quick Brown   fox", "drop"),  // same normalized text
      (3L, "something else entirely here", "keep"))
      .toDF("doc_id", "text", "tag")
    val out = NearDup.exactDedup(docs).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((1L, "keep"), (3L, "keep")))
  }

  test("null-text documents are not duplicates of each other") {
    import spark.implicits._
    val docs = Seq((1L, null), (2L, null), (3L, "real text here"))
      .toDF("doc_id", "text")
    val kept = NearDup.exactDedup(docs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L),
      "absence of content is not shared content")
  }

  test("misuse fails fast") {
    intercept[IllegalArgumentException] {
      NearDup.clusters(planted, threshold = 1.5)
    }
    intercept[IllegalArgumentException] {
      NearDup.leakageSafeSplit(planted, trainBuckets = 0)
    }
  }
}
