package graft

import graft.operators.TriangleCount
import scala.util.Random

/** TriangleCount vs a brute-force driver-side reference on random
  * graphs, plus the closed-form shapes (cliques, cycles, stars) and
  * the input edge cases the operator normalizes away.
  */
class TriangleCountSpec extends SparkSpecBase {

  private def referenceCounts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = collection.mutable.Map(nodes.map(_ -> 0L): _*)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      (x, y, z) = (nodes(i), nodes(j), nodes(k))
      if und((x, y)) && und((x, z)) && und((y, z))
    } Seq(x, y, z).foreach(n => counts(n) += 1L)
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    TriangleCount.run(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches brute force on random graphs") {
    val rnd = new Random(13L)
    for (round <- 0 until 3) {
      val n = 40
      val edges = Seq.fill(160)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == referenceCounts(edges), s"round $round")
    }
  }

  test("closed forms: K5, C5, star") {
    // K5: every node is in C(4,2) = 6 triangles
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // C5: a 5-cycle has no triangles
    val c5 = (10L until 14L).map(i => (i, i + 1)) :+ (14L, 10L)
    // star: the skew shape degree orientation exists for — no wedge
    // at the hub ever closes, and none should be enumerated there
    val star = (1L to 8L).map(i => (0L + 20L, i + 20L))
    val got = run(k5 ++ c5 ++ star)
    assert((0L to 4L).forall(got(_) == 6L))
    assert((10L to 14L).forall(got(_) == 0L))
    assert((20L to 28L).forall(got(_) == 0L))
  }

  test("duplicate edges, reversed edges, and self-loops do not double-count") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = tri ++ tri.map(_.swap) ++ Seq((1L, 1L), (2L, 2L), (1L, 2L))
    assert(run(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
