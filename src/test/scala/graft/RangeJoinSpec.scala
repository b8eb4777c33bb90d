package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import scala.util.Random

/** Binned range join: identical rows to the theta join (including
  * boundary and negative values, intervals spanning many bins), and an
  * equi-join physical plan — no nested loop, no cartesian product.
  */
class RangeJoinSpec extends SparkSpecBase {

  private lazy val (points, intervals) = {
    import spark.implicits._
    val rnd = new Random(42)
    val p = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextDouble() * 200 - 50)).toDF("pid", "v")
    val iv = Seq.tabulate(40) { j =>
      val lo = rnd.nextDouble() * 180 - 60
      // mix of short, long (multi-bin), and degenerate [lo, lo] spans
      val len = j % 3 match {
        case 0 => rnd.nextDouble() * 5
        case 1 => rnd.nextDouble() * 60
        case _ => 0.0
      }
      (j.toLong, lo, lo + len)
    }.toDF("iid", "lo", "hi")
    (p, iv)
  }

  test("matches the theta join exactly, boundaries included") {
    val binned = RangeJoin
      .pointInInterval(points, intervals, "v", "lo", "hi", binWidth = 8.0)
      .select("pid", "iid")
    val theta = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid")
    assert(binned.exceptAll(theta).isEmpty && theta.exceptAll(binned).isEmpty)
    assert(theta.count() > 100, "fixture should produce many matches")
  }

  test("boundary values: a point exactly at lo or hi matches inclusively") {
    import spark.implicits._
    val p = Seq((1L, 10.0), (2L, 20.0), (3L, 9.999999)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, iv, "v", "lo", "hi", 7.0)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L)))
  }

  test("plan is an equi-join on the bin id, not a nested loop") {
    val p = RangeJoin
      .pointInInterval(points, intervals, "v", "lo", "hi", binWidth = 8.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("keyed half-open variant matches the per-key theta join on " +
      "boundary-heavy random data") {
    import spark.implicits._
    val rnd = new Random(7)
    // timestamps clustered on bin-width multiples so exact-boundary
    // pairs (tts == lo, tts == hi) occur often — the off-by-one zone
    def ts() = rnd.nextInt(20).toLong * 60L + rnd.nextInt(3) * 30L
    val pts = Seq.tabulate(300)(i =>
      (s"u${rnd.nextInt(5)}", i.toLong, ts())).toDF("k", "pid", "v")
    val ivs = Seq.tabulate(120) { j =>
      val lo = ts()
      (s"u${rnd.nextInt(5)}", j.toLong, lo, lo + 60L)
    }.toDF("k", "iid", "lo", "hi")
    val binned = RangeJoin
      .pointInIntervalKeyed(pts, ivs, Seq("k"), "v", "lo", "hi",
        binWidth = 60L)
      .select("pid", "iid")
    val theta = pts.join(ivs.withColumnRenamed("k", "k2"),
        col("k") === col("k2")
          && col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid")
    assert(binned.exceptAll(theta).isEmpty
      && theta.exceptAll(binned).isEmpty)
    assert(theta.count() > 50, "fixture should produce many matches")
  }

  test("keyed variant: same timestamp under a different key never " +
      "matches; hi is exclusive, lo inclusive") {
    import spark.implicits._
    val pts = Seq(("a", 1L, 100L), ("b", 2L, 100L), ("a", 3L, 160L))
      .toDF("k", "pid", "v")
    val ivs = Seq(("a", 9L, 100L, 160L)).toDF("k", "iid", "lo", "hi")
    val got = RangeJoin
      .pointInIntervalKeyed(pts, ivs, Seq("k"), "v", "lo", "hi", 60L)
      .select("pid").collect().map(_.getLong(0)).sorted
    // pid 1: key+lo-inclusive ✓; pid 2: wrong key; pid 3: hi-exclusive
    assert(got.sameElements(Array(1L)))
  }
}
