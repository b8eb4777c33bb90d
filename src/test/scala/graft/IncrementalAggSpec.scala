package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg

/** The MV-maintenance merge law: merging per-batch summaries must be
  * indistinguishable from one aggregate over everything — for any
  * batch split, any merge grouping, and groups present on either one
  * side or both. (q45's DuckDB oracle pins the same law cross-engine
  * at corpus scale; this spec pins it on adversarial tiny frames the
  * corpus can't represent: empty deltas, disjoint groups, negatives.)
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keys = Seq("k")

  private def rowsDf(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("k", "v")

  private def full(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.map(_._2)
      k -> ((xs.size.toLong, xs.sum, xs.min, xs.max))
    }

  private def collect(df: DataFrame): Map[String, (Long, Long, Long, Long)] =
    df.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap

  test("merge of two partials equals the full aggregate (incl. disjoint groups)") {
    val a = Seq("x" -> 5L, "x" -> -3L, "y" -> 7L)
    val b = Seq("x" -> 10L, "z" -> 0L, "z" -> -9L)
    val merged = IncrementalAgg.merge(
      Seq(IncrementalAgg.partial(rowsDf(a), keys, "v"),
        IncrementalAgg.partial(rowsDf(b), keys, "v")), keys)
    assert(collect(merged) == full(a ++ b))
  }

  test("empty delta is the merge identity") {
    val a = Seq("x" -> 5L, "y" -> 7L)
    val empty = rowsDf(Nil)
    val merged = IncrementalAgg.merge(
      Seq(IncrementalAgg.partial(rowsDf(a), keys, "v"),
        IncrementalAgg.partial(empty, keys, "v")), keys)
    assert(collect(merged) == full(a))
  }

  test("merge is independent of batch grouping (associativity over 3 batches)") {
    val a = Seq("x" -> 1L, "y" -> 2L)
    val b = Seq("x" -> 3L, "z" -> 4L)
    val c = Seq("y" -> -5L, "z" -> 6L, "z" -> 6L)
    val p = Seq(a, b, c).map(r => IncrementalAgg.partial(rowsDf(r), keys, "v"))
    val allAtOnce = IncrementalAgg.merge(p, keys)
    val leftFold = IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(p(0), p(1)), keys), p(2)), keys)
    assert(collect(allAtOnce) == full(a ++ b ++ c))
    assert(collect(leftFold) == full(a ++ b ++ c))
  }

  test("property: any random rows, any split point — merge == full aggregate") {
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (k, v)
    val prop = Prop.forAll(Gen.listOf(rowGen), Gen.chooseNum(0, 100)) {
      (rows: List[(String, Long)], splitPct: Int) =>
        val cut = rows.size * splitPct / 100
        val (a, b) = rows.splitAt(cut)
        val merged = IncrementalAgg.merge(
          Seq(IncrementalAgg.partial(rowsDf(a), keys, "v"),
            IncrementalAgg.partial(rowsDf(b), keys, "v")), keys)
        collect(merged) == full(rows)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("merged state column names match the declared contract") {
    val p = IncrementalAgg.partial(rowsDf(Seq("x" -> 1L)), keys, "v")
    assert(p.columns.toSeq == keys ++ IncrementalAgg.stateCols)
    val m = IncrementalAgg.merge(Seq(p, p), keys)
    assert(m.columns.toSeq == keys ++ IncrementalAgg.stateCols)
  }
}
