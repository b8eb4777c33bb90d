package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Count-Min invariants the t36 oracle replay can't state directly:
  * one-sided error on EVERY token (not just the top-20), exactness in
  * a collision-free regime, and cell-wise mergeability — the property
  * that makes CMS the distributed-frequency workhorse.
  */
class CountMinSpec extends SparkSpecBase {

  private def freqs(rows: Seq[(String, Long)]) = {
    val session = spark
    import session.implicits._
    rows.toDF("tok", "n")
  }

  test("estimates are exact with few tokens (no collisions at 4x512) " +
      "and never under-count on a colliding sketch") {
    val f = freqs(Seq(("alpha", 5L), ("beta", 3L), ("gamma", 11L)))
    val cms = CountMin.sketch(f, "tok", "n")
    val est = CountMin.estimate(f.select("tok"), "tok", cms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 11L))

    // width 2 forces collisions over 40 tokens: estimates may inflate
    // but can NEVER sit below the true count (the defining invariant)
    val many = freqs((1 to 40).map(i => (s"tok$i", i.toLong)))
    val tight = CountMin.sketch(many, "tok", "n", depth = 3, width = 2)
    val got = CountMin.estimate(many.select("tok"), "tok", tight,
        depth = 3, width = 2)
      .join(many, Seq("tok"))
      .filter(col("cms_est") < col("n")).count()
    assert(got == 0L, "CMS under-counted — one-sided invariant broken")
  }

  test("out-of-corpus tokens get the textbook estimate: an untouched " +
      "cell pins them to 0, and none is silently absent") {
    val f = freqs(Seq(("alpha", 5L), ("beta", 3L)))
    val cms = CountMin.sketch(f, "tok", "n")
    // at 4x512 with 2 corpus tokens, any foreign token has ≥1
    // untouched cell — the true CMS estimate is 0, not a drop
    val probes = freqs(Seq(("alpha", 0L), ("never-seen", 0L),
      ("also-unseen", 0L))).select("tok")
    val est = CountMin.estimate(probes, "tok", cms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map(
      "alpha" -> 5L, "never-seen" -> 0L, "also-unseen" -> 0L))
  }

  test("sketches merge cell-wise: sketch(A) + sketch(B) == sketch(A∪B)") {
    val a = freqs(Seq(("x", 2L), ("y", 7L)))
    val b = freqs(Seq(("x", 3L), ("z", 1L)))
    val merged = CountMin.sketch(a, "tok", "n")
      .unionByName(CountMin.sketch(b, "tok", "n"))
      .groupBy("r", "bucket").agg(sum("c").as("c"))
    val direct = CountMin.sketch(
      freqs(Seq(("x", 5L), ("y", 7L), ("z", 1L))), "tok", "n")
    val m = merged.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dd = direct.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == dd)
  }

  test("depth and width bounds are validated") {
    val f = freqs(Seq(("x", 1L)))
    intercept[IllegalArgumentException] {
      CountMin.sketch(f, "tok", "n", depth = 0)
    }
    intercept[IllegalArgumentException] {
      CountMin.sketch(f, "tok", "n", width = 1)
    }
  }
}
