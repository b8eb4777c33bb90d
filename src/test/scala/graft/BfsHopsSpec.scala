package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BfsHops

/** BFS hop distances vs a plain Scala reference BFS: hand goldens for
  * the structural cases (chain, diamond min-path, unreachable node,
  * seed-in-cycle, round-budget truncation) and randomized digraphs for
  * everything else. p5's DuckDB oracle pins the same unrolled rounds
  * cross-engine at corpus scale.
  */
class BfsHopsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(
      edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] =
    BfsHops.run(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node"), "node", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: level-synchronous BFS capped at `rounds` hops. */
  private def reference(
      edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct.toSet
    for (i <- 1 to rounds) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> i.toLong)
      frontier = next
    }
    dist
  }

  test("chain: hops count up; nodes past the round budget stay absent") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    assert(run(chain, Seq(1L), 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("diamond: min over paths wins; revisits never increase a distance") {
    // 1→2→4 (2 hops) and 1→3a→3b→4 (3 hops): node 4 must report 2.
    val g = Seq(1L -> 2L, 2L -> 4L, 1L -> 30L, 30L -> 31L, 31L -> 4L)
    assert(run(g, Seq(1L), 4) ==
      Map(1L -> 0L, 2L -> 1L, 30L -> 1L, 31L -> 2L, 4L -> 2L))
  }

  test("multi-source: each node takes its NEAREST seed; seeds stay 0 in cycles") {
    val g = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 9L -> 3L)
    assert(run(g, Seq(1L, 9L), 3) ==
      Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("isolated seed appears at 0; unreachable nodes are absent") {
    val g = Seq(1L -> 2L)
    assert(run(g, Seq(1L, 7L), 2) == Map(1L -> 0L, 2L -> 1L, 7L -> 0L))
  }

  test("property: random digraphs match a plain Scala BFS") {
    val edgeGen = for {
      a <- Gen.chooseNum(1L, 12L); b <- Gen.chooseNum(1L, 12L)
      if a != b
    } yield (a, b)
    val prop = Prop.forAll(
      Gen.listOf(edgeGen), Gen.nonEmptyListOf(Gen.chooseNum(1L, 12L)),
      Gen.chooseNum(0, 5)) {
      (edges: List[(Long, Long)], seeds: List[Long], rounds: Int) =>
        run(edges, seeds, rounds) == reference(edges, seeds, rounds)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
