package graft

import graft.operators.ConnectedComponents
import scala.collection.mutable
import scala.util.Random

/** Connected components vs a driver-side union-find reference on
  * random graphs, plus the shapes dedup graphs actually take.
  */
class ConnectedComponentsSpec extends SparkSpecBase {

  private def referenceComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on random graphs") {
    val rnd = new Random(7L)
    for (round <- 0 until 3) {
      val n = 120
      val edges = Seq.fill(90)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == referenceComponents(edges), s"round $round")
    }
  }

  test("cliques, chains, and singletons-with-self-pairs resolve to min ids") {
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val chain = (10L until 15L).map(i => (i, i + 1))
    val pair = Seq((100L, 101L))
    val got = run(clique ++ chain ++ pair)
    assert((0L to 3L).forall(got(_) == 0L))
    assert((10L to 15L).forall(got(_) == 10L))
    assert(got(100L) == 100L && got(101L) == 100L)
  }

  test("a long chain converges within the iteration budget") {
    val chain = (0L until 40L).map(i => (i + 1, i)) // worst case: reversed
    val got = run(chain)
    assert((0L to 40L).forall(got(_) == 0L))
  }
}
