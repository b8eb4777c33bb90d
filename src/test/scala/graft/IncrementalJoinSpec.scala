package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalJoin

/** The join delta-rule: V_old ∪ (ΔA ⨝ B_new) ∪ (A_old ⨝ ΔB) must be
  * the same MULTISET as the full recompute A_new ⨝ B_new — for any
  * split of either side, including empty deltas, keys that exist only
  * in a delta, and many-to-many key multiplicity (where a double-
  * counted ΔA⨝ΔB term would inflate counts). q48's DuckDB oracle pins
  * the same law against the corpus; this spec pins it on adversarial
  * tiny frames and randomized splits.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def aDf(rows: Seq[(Int, String)]): DataFrame = rows.toDF("k", "av")
  private def bDf(rows: Seq[(Int, String)]): DataFrame = rows.toDF("k", "bv")

  /** Reference multiset join computed in plain Scala. */
  private def fullJoin(
      as: Seq[(Int, String)], bs: Seq[(Int, String)]): Seq[(Int, String, String)] =
    for ((k, av) <- as; (k2, bv) <- bs if k == k2) yield (k, av, bv)

  private def collect(df: DataFrame): Seq[(Int, String, String)] =
    df.select("k", "av", "bv").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq

  private def maintained(
      aOld: Seq[(Int, String)], aDelta: Seq[(Int, String)],
      bOld: Seq[(Int, String)], bDelta: Seq[(Int, String)]): DataFrame =
    IncrementalJoin.view(
      aDf(aOld).join(bDf(bOld), Seq("k")),
      aDf(aOld), aDf(aDelta), bDf(bOld), bDf(bDelta), Seq("k"))

  private def assertMultisetEq(
      got: Seq[(Int, String, String)], want: Seq[(Int, String, String)]): Unit =
    assert(got.sorted == want.sorted)

  test("both sides receive a delta; overlap keys, delta-only keys, m:n keys") {
    val aOld = Seq(1 -> "a1", 1 -> "a2", 2 -> "a3")
    val aNew = Seq(1 -> "a4", 3 -> "a5")
    val bOld = Seq(1 -> "b1", 3 -> "b2")
    val bNew = Seq(1 -> "b3", 2 -> "b4", 4 -> "b5")
    assertMultisetEq(
      collect(maintained(aOld, aNew, bOld, bNew)),
      fullJoin(aOld ++ aNew, bOld ++ bNew))
  }

  test("empty deltas add nothing (view identity)") {
    val aOld = Seq(1 -> "a1", 2 -> "a2")
    val bOld = Seq(1 -> "b1", 1 -> "b2")
    assertMultisetEq(
      collect(maintained(aOld, Nil, bOld, Nil)),
      fullJoin(aOld, bOld))
  }

  test("delta-only key joining delta-only key appears exactly once") {
    // The ΔA⨝ΔB corner: produced by the ΔA ⨝ B_new term only; a
    // naive ΔA⨝B_new ∪ A_new⨝ΔB formulation would emit it twice.
    val aNew = Seq(9 -> "a1")
    val bNew = Seq(9 -> "b1")
    assertMultisetEq(
      collect(maintained(Nil, aNew, Nil, bNew)),
      Seq((9, "a1", "b1")))
  }

  test("property: random rows, random split points — maintained == recompute") {
    val rowGen = for {
      k <- Gen.chooseNum(1, 6)
      v <- Gen.alphaLowerStr.map(_.take(3))
    } yield (k, v)
    val prop = Prop.forAll(
      Gen.listOf(rowGen), Gen.listOf(rowGen),
      Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) {
      (as: List[(Int, String)], bs: List[(Int, String)],
       aPct: Int, bPct: Int) =>
        val (aOld, aNew) = as.splitAt(as.size * aPct / 100)
        val (bOld, bNew) = bs.splitAt(bs.size * bPct / 100)
        collect(maintained(aOld, aNew, bOld, bNew)).sorted ==
          fullJoin(as, bs).sorted
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
