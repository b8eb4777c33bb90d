package graft

import org.apache.spark.sql.Row
import graft.operators.PageRank

/** Fixed-point PageRank: hand-computed goldens, determinism, and the
  * zero-iteration base case.
  */
class PageRankSpec extends SparkSpecBase {

  // symmetric chain a—b—c: deg(a)=deg(c)=1, deg(b)=2
  private def chain = {
    import SparkTestSession.spark.implicits._
    Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("s", "t")
  }

  test("two damped rounds match the hand computation") {
    // r0 = 1,000,000 each.
    // round 1: contrib a→b 1,000,000; b→a 500,000; b→c 500,000; c→b 1,000,000
    //   a = 150,000 + 85*500,000/100   = 575,000
    //   b = 150,000 + 85*2,000,000/100 = 1,850,000
    //   c = 575,000
    // round 2: a→b 575,000; b→a 925,000; b→c 925,000; c→b 575,000
    //   a = 150,000 + 85*925,000/100   = 936,250
    //   b = 150,000 + 85*1,150,000/100 = 1,127,500
    //   c = 936,250
    val got = PageRank.run(chain, "s", "t", iterations = 2)
    assertSameRows(got,
      Seq(Row("a", 936250L), Row("b", 1127500L), Row("c", 936250L)))
  }

  test("zero iterations returns the uniform initial rank") {
    val got = PageRank.run(chain, "s", "t", iterations = 0)
    assertSameRows(got,
      Seq(Row("a", 1000000L), Row("b", 1000000L), Row("c", 1000000L)))
  }

  test("a sink-free star concentrates rank on the hub") {
    import SparkTestSession.spark.implicits._
    // hub h with 3 leaves, symmetric
    val e = Seq(("h", "x"), ("x", "h"), ("h", "y"), ("y", "h"),
      ("h", "z"), ("z", "h")).toDF("s", "t")
    val r = PageRank.run(e, "s", "t", iterations = 5)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r("h") > r("x") && r("x") == r("y") && r("y") == r("z"))
  }

  test("duplicate input edges do not double-count contributions") {
    import SparkTestSession.spark.implicits._
    val dup = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("b", "a"),
      ("b", "c"), ("c", "b")).toDF("s", "t")
    val got = PageRank.run(dup, "s", "t", iterations = 2)
    assertSameRows(got,
      Seq(Row("a", 936250L), Row("b", 1127500L), Row("c", 936250L)))
  }

  test("an all-nodes seed set reproduces classic PageRank exactly") {
    import SparkTestSession.spark.implicits._
    val all = Seq("a", "b", "c").toDF("node")
    val got = PageRank.run(chain, "s", "t", iterations = 2,
      seeds = Some(all))
    assertSameRows(got,
      Seq(Row("a", 936250L), Row("b", 1127500L), Row("c", 936250L)))
  }

  test("personalized rank flows outward from the seed only") {
    import SparkTestSession.spark.implicits._
    // directed path a→b→c plus return edges so every node has
    // out-degree ≥ 1; seed = a only
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "t")
    val seeds = Seq("a").toDF("node")
    val r = PageRank.run(e, "s", "t", iterations = 2,
        seeds = Some(seeds))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    // round 1: a=150000 (+0 from c), b=0+85%·1000000=850000, c=0
    // round 2: a=150000, b=85%·150000=127500, c=85%·850000=722500
    assert(r == Map("a" -> 150000L, "b" -> 127500L, "c" -> 722500L), s"$r")
  }
}
