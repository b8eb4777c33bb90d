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
}
