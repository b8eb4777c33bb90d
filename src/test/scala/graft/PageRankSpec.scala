package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
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

  // ---- the broadcastNodeLimit=0 degradation path: past the node
  // limit the rate join must fall back to a plain shuffled equi-join
  // (no broadcast exchange anywhere) and produce bit-identical ranks.
  // Runs the same co-purchase edge derivation p2/p4 use, on real
  // sf0.001 lineitem, so the fallback is proven on the production
  // query shape, not a toy chain.

  private def copurchaseEdges = {
    import SparkTestSession.spark.implicits._
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" =!= $"b.pk")
      .select($"a.pk".as("src"), $"b.pk".as("dst"))
  }

  private def assertNoBroadcastRounds(plans: Seq[String]): Unit =
    plans.foreach { p =>
      assert(!p.contains("BroadcastExchange") &&
          !p.contains("BroadcastHashJoin") &&
          !p.contains("BroadcastNestedLoop"),
        s"fallback path must not plan any broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fallback rate join must be a shuffled equi-join:\n$p")
    }

  /** Run `body` with AQE's runtime broadcast conversion disabled, so
    * the fallback genuinely EXECUTES shuffled joins (on tiny test data
    * AQE would otherwise re-plan the small rate side back to a
    * broadcast — at real scale, where the fallback matters, the rate
    * table is past every threshold and no such conversion happens).
    * The explicit broadcast() hint on the under-limit path is
    * unaffected: hints override thresholds.
    */
  private def withRuntimeBroadcastDisabled[A](body: => A): A = {
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    keys.foreach(conf.set(_, "-1"))
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("broadcastNodeLimit=0 degrades p2 to a shuffled equi-join " +
      "with bit-identical ranks") {
    withRuntimeBroadcastDisabled {
      val e = copurchaseEdges
      val viaBroadcast = PageRank
        .run(e, "src", "dst", iterations = 3, checkpointEvery = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // capture each round's plan string EAGERLY: the hook fires before
      // the round executes, so the snapshot is the static plan — after
      // execution AQE finalizes the same QueryExecution in place
      val plans = scala.collection.mutable.Buffer[String]()
      val viaShuffle = PageRank
        .run(e, "src", "dst", iterations = 3, checkpointEvery = 2,
          broadcastNodeLimit = 0L,
          inspectRound = df =>
            plans += df.queryExecution.executedPlan.toString)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaShuffle == viaBroadcast,
        "shuffled fallback must reproduce the broadcast-path ranks exactly")
      assert(plans.size == 3)
      assertNoBroadcastRounds(plans.toSeq)
    }
  }

  test("broadcastNodeLimit=0 degrades p4 (seeded) identically") {
    withRuntimeBroadcastDisabled {
      val e = copurchaseEdges
      val seeds = spark.read
        .parquet("/root/testdata/sf0.001/part.parquet")
        .filter(col("p_brand") === "Brand#4")
        .select(col("p_partkey").as("node"))
      val viaBroadcast = PageRank
        .run(e, "src", "dst", iterations = 3, checkpointEvery = 2,
          seeds = Some(seeds))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plans = scala.collection.mutable.Buffer[String]()
      val viaShuffle = PageRank
        .run(e, "src", "dst", iterations = 3, checkpointEvery = 2,
          broadcastNodeLimit = 0L, seeds = Some(seeds),
          inspectRound = df =>
            plans += df.queryExecution.executedPlan.toString)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaShuffle == viaBroadcast,
        "seeded shuffled fallback must reproduce the broadcast-path ranks")
      assertNoBroadcastRounds(plans.toSeq)
    }
  }
}
