package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{BfsHops, KCore, LabelProp}

/** The `broadcastNodeLimit=0` shuffled-fallback path for the three
  * round-11 graph operators, proven the way PageRankSpec proves p2/p4
  * (`PageRankSpec.scala:130,154`): on the REAL p5/p6/p8 co-purchase
  * corpora (sf0.001 lineitem), the fallback must (a) plan NO broadcast
  * anywhere in any round — a plain shuffled equi/semi-join instead —
  * and (b) reproduce the broadcast path's output bit-identically.
  *
  * At 100 TB a graph's node set exceeds any broadcast limit, so this
  * degradation IS the production path; it must not live untested.
  */
class GraphBroadcastFallbackSpec extends SparkSpecBase {

  // same co-purchase derivation PageRankSpec uses on the p2/p4 corpus:
  // parts sharing an order, directed both ways, a≠b
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

  // p8's edge set: support-filtered (pairs co-purchased ≥ 2 times),
  // then symmetrized — a smaller, denser core than the raw graph
  private def kcoreEdges = {
    import SparkTestSession.spark.implicits._
    val e = copurchaseEdges.filter($"src" < $"dst")
      .groupBy("src", "dst")
      .count()
      .filter($"count" >= 2)
      .select("src", "dst")
    e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def brandSeeds = spark.read
    .parquet("/root/testdata/sf0.001/part.parquet")
    .filter(col("p_brand") === "Brand#4")
    .select(col("p_partkey").as("node"))

  private def assertNoBroadcastRounds(plans: Seq[String]): Unit =
    plans.foreach { p =>
      assert(!p.contains("BroadcastExchange") &&
          !p.contains("BroadcastHashJoin") &&
          !p.contains("BroadcastNestedLoop"),
        s"fallback path must not plan any broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"fallback join must be a shuffled equi-join:\n$p")
    }

  /** Disable AQE's runtime broadcast conversion so the fallback
    * genuinely EXECUTES shuffled joins (on tiny test data AQE would
    * re-plan the small node-sized side back to a broadcast — at real
    * scale, where the fallback matters, that side is past every
    * threshold). The explicit broadcast() hint on the under-limit
    * path is unaffected: hints override thresholds.
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

  // capture each round's plan string EAGERLY (the PageRankSpec note):
  // the hook fires before the round executes, so the snapshot is the
  // static plan — after execution AQE finalizes the same
  // QueryExecution in place
  private def planInto(buf: scala.collection.mutable.Buffer[String])
      : DataFrame => Unit =
    df => buf += df.queryExecution.executedPlan.toString

  test("BfsHops: broadcastNodeLimit=0 degrades the p5 relaxation to " +
      "shuffled joins with bit-identical hop distances") {
    withRuntimeBroadcastDisabled {
      val e = copurchaseEdges
      val viaBroadcast = BfsHops
        .run(e, "src", "dst", brandSeeds, "node", rounds = 4,
          checkpointEvery = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plans = scala.collection.mutable.Buffer[String]()
      val viaShuffle = BfsHops
        .run(e, "src", "dst", brandSeeds, "node", rounds = 4,
          checkpointEvery = 2, broadcastNodeLimit = 0L,
          inspectRound = planInto(plans))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaShuffle == viaBroadcast,
        "shuffled fallback must reproduce the broadcast-path hops exactly")
      assert(plans.size == 4)
      assertNoBroadcastRounds(plans.toSeq)
    }
  }

  test("LabelProp: broadcastNodeLimit=0 degrades the p6 vote join to " +
      "shuffled joins with bit-identical labels") {
    withRuntimeBroadcastDisabled {
      val e = copurchaseEdges
      val viaBroadcast = LabelProp
        .run(e, "src", "dst", rounds = 3, checkpointEvery = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plans = scala.collection.mutable.Buffer[String]()
      val viaShuffle = LabelProp
        .run(e, "src", "dst", rounds = 3, checkpointEvery = 2,
          broadcastNodeLimit = 0L, inspectRound = planInto(plans))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaShuffle == viaBroadcast,
        "shuffled fallback must reproduce the broadcast-path labels exactly")
      assert(plans.size == 3)
      assertNoBroadcastRounds(plans.toSeq)
    }
  }

  test("KCore: broadcastNodeLimit=0 degrades the p8 peel to shuffled " +
      "semi-joins with bit-identical core degrees") {
    withRuntimeBroadcastDisabled {
      val e = kcoreEdges
      val viaBroadcast = KCore
        .run(e, "src", "dst", k = 2, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plans = scala.collection.mutable.Buffer[String]()
      val viaShuffle = KCore
        .run(e, "src", "dst", k = 2, rounds = 4,
          broadcastNodeLimit = 0L, inspectRound = planInto(plans))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaShuffle == viaBroadcast,
        "shuffled fallback must reproduce the broadcast-path cores exactly")
      assert(plans.size == 4)
      assertNoBroadcastRounds(plans.toSeq)
    }
  }
}
