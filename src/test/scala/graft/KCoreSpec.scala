package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

/** k-core peeling vs a plain Scala reference: hand goldens for the
  * structural cases (chain peels away, triangle survives 2-core,
  * cascading peel, budget truncation) and randomized graphs for the
  * rest. p8's DuckDB oracle pins the same unrolled rounds
  * cross-engine at corpus scale.
  */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges ++ edges.map(_.swap)

  private def run(
      edges: Seq[(Long, Long)], k: Long, rounds: Int): Map[Long, Long] =
    KCore.run(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: same fixed-budget synchronous peel. */
  private def reference(
      edges: Seq[(Long, Long)], k: Long, rounds: Int): Map[Long, Long] = {
    var e = edges.distinct
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._2).view.mapValues(_.size).toMap
      val alive = deg.filter(_._2 >= k).keySet
      e = e.filter { case (s, d) => alive(s) && alive(d) }
    }
    e.groupBy(_._2).view.mapValues(_.size.toLong).toMap
  }

  test("a chain peels away entirely; a triangle survives the 2-core") {
    val chain = sym(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(run(chain, k = 2, rounds = 4) == Map.empty)
    val tri = sym(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L))
    assert(run(tri, k = 2, rounds = 4) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cascading peel: removing a leaf drags down its neighbor next " +
      "round") {
    // triangle + pendant path 3-4-5: 5 drops (deg 1), then 4 drops
    val g = sym(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L))
    val got = run(g, k = 2, rounds = 4)
    assert(got.keySet == Set(1L, 2L, 3L), got)
    // an insufficient budget stops mid-cascade: after 1 round node 4
    // is still present (its pendant dropped this round)
    assert(run(g, k = 2, rounds = 1).keySet == Set(1L, 2L, 3L, 4L))
  }

  test("zero rounds returns the input graph's degrees") {
    val g = sym(Seq(1L -> 2L))
    assert(run(g, k = 5, rounds = 0) == Map(1L -> 1L, 2L -> 1L))
  }

  test("randomized graphs match the reference for all budgets and k") {
    val genEdges = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(1, 30)
      e <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield e
    val prop = Prop.forAll(genEdges, Gen.choose(1L, 3L),
      Gen.choose(0, 4)) {
      (edges: List[(Long, Long)], k: Long, rounds: Int) =>
        edges.isEmpty ||
          run(sym(edges), k, rounds) == reference(sym(edges).distinct, k, rounds)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status)
  }
}
