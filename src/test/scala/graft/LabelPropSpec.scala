package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

/** Label propagation vs a plain Scala reference: hand goldens for the
  * structural cases (bridged triangles split into two communities
  * where CC would merge them; deterministic smallest-label tie-break;
  * star collapse) and randomized digraphs for everything else. p6's
  * DuckDB oracle pins the same unrolled rounds cross-engine at corpus
  * scale with an independently-written row_number argmax.
  */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges ++ edges.map(_.swap)

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.run(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: synchronous rounds, mode of in-neighbor labels, ties
    * to the smallest label.
    */
  private def reference(
      edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val e = edges.distinct
    val in = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = e.map(_._1).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      // only CURRENTLY-LABELED in-neighbors vote (the operator's join
      // drops unlabeled srcs); a node whose voters all dropped out
      // drops out itself, matching the operator
      labels = in.flatMap { case (v, srcs) =>
        val voted = srcs.flatMap(labels.get)
        if (voted.isEmpty) None
        else Some(v -> voted.groupBy(identity).view.mapValues(_.size)
          .toSeq.map { case (l, c) => (-c, l) }.min._2)
      }.toMap
    }
    labels
  }

  test("bridged triangles: two communities where CC would report one " +
      "component") {
    val g = sym(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L))
    val got = run(g, 3)
    // the bridge does not flood: {1,2,3} and {4,5,6} keep distinct labels
    assert(got(1L) == got(2L) && got(2L) == got(3L), got)
    assert(got(4L) == got(5L) && got(5L) == got(6L), got)
    assert(got(1L) != got(4L), got)
  }

  test("star: leaves adopt the hub's label; round parity oscillation " +
      "is deterministic") {
    val g = sym(Seq(10L -> 1L, 10L -> 2L, 10L -> 3L))
    // round 1: leaves -> 10's label (10); hub -> min leaf (1)
    assert(run(g, 1) == Map(10L -> 1L, 1L -> 10L, 2L -> 10L, 3L -> 10L))
    // round 2: leaves -> 1 (hub's r1 label); hub -> 10 (all leaves say 10)
    assert(run(g, 2) == Map(10L -> 10L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("tie-break: equal votes resolve to the smallest label") {
    // node 9 hears {1, 2} once each -> must take 1
    val g = Seq(1L -> 9L, 2L -> 9L, 9L -> 1L, 9L -> 2L)
    assert(run(g, 1)(9L) == 1L)
  }

  test("zero rounds returns self-labels") {
    val g = sym(Seq(1L -> 2L))
    assert(run(g, 0) == Map(1L -> 1L, 2L -> 2L))
  }

  test("randomized digraphs match the reference for all round budgets") {
    val genEdges = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 40)
      e <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield e
    val prop = Prop.forAll(genEdges, Gen.choose(0, 4)) {
      (edges: List[(Long, Long)], rounds: Int) =>
        edges.isEmpty || run(edges, rounds) == reference(edges, rounds)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status)
  }

  test("the FORCED frontier path (frontierFraction=1) matches the " +
      "reference too — carry-forward, entry, and drop-out all exact") {
    val genEdges = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(1, 40)
      e <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield e
    def runFrontier(
        edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
      LabelProp.run(edges.toDF("src", "dst"), "src", "dst", rounds,
          frontierFraction = 1.0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Prop.forAll(genEdges, Gen.choose(0, 4)) {
      (edges: List[(Long, Long)], rounds: Int) =>
        edges.isEmpty ||
          runFrontier(edges, rounds) == reference(edges, rounds)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status)
  }
}
