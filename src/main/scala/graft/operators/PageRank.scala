package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — the second iterative-graph operator
  * (ConnectedComponents handles reachability; this handles
  * influence/centrality, the ranking a data-curation pipeline uses to
  * weight documents by citation/link structure).
  *
  * All arithmetic is integer: ranks live in micro-units (1.0 ≡
  * 1,000,000), every division is integer division, and the damping
  * update is `150000 + (85 * Σ contrib) div 100` — so the result is
  * bit-identical on ANY engine, which is what makes an iterative
  * floating-point-free oracle possible (the DuckDB side unrolls the
  * same iterations as CTEs).
  *
  * Scale shape: the rank table carries (node, deg, rank), so each
  * round's contribution rate is a pure PROJECTION (no rank⋈degree
  * join), broadcast into the stationary checkpointed edge table — the
  * edges are never shuffled. The per-round contribution aggregation
  * hash-partitions on `node`, the same partitioning the checkpointed
  * rank table already has (localCheckpoint preserves the physical
  * partitioning), so the damping join needs no exchange either: one
  * shuffle per round, total, and it is map-side combined.
  */
object PageRank {

  /** @param edges directed edge list; dangling nodes (no out-edges)
    *              contribute nothing — with symmetric edges every
    *              node has out-degree ≥ 1
    * @return (node, rank) for every node with at least one out-edge,
    *         rank in micro-units after `iterations` damped rounds
    */
  /** @param inspectRound instrumentation hook: called with each
    *        round's (un-checkpointed) rank plan before it executes —
    *        checkpointing erases the round's join shape from the final
    *        plan, so plan-shape tests observe it here
    * @param checkpointEvery truncate lineage every this many rounds.
    *        Rounds BETWEEN checkpoints fuse into one plan executed as
    *        a single multi-stage job chain (shuffle stages are shared
    *        across the per-round broadcast builds), so a short run
    *        pays zero per-round driver synchronization; the interval
    *        bounds plan depth so a long run never re-plans its whole
    *        history.
    * @param seeds PERSONALIZED (topic-sensitive) PageRank: when set,
    *        only the listed nodes (column `node`) receive the damped
    *        reset mass — importance then measures proximity to the
    *        seed topic, the ranking a curation pipeline uses to find
    *        documents/parts related to a seed set. None (the default)
    *        is uniform reset = classic PageRank; the seed table joins
    *        once into the degree table, after which per-round cost is
    *        unchanged.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      broadcastNodeLimit: Long = 5000000L,
      checkpointEvery: Int = 1,
      inspectRound: DataFrame => Unit = _ => (),
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be at least 1, got $checkpointEvery")
    def free(df: DataFrame): Unit =
      org.apache.spark.sql.graft.bridge.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))

    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    // (node, deg, reset): hash-partitioned on node by the groupBy; the
    // checkpoint preserves that partitioning, and every later round's
    // rank table inherits it by construction.
    val degrees = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
    val base = (seeds match {
      case None => degrees.withColumn("reset", lit(1L))
      case Some(sd) => degrees
        .join(sd.select(col("node")).distinct()
          .withColumn("reset", lit(1L)), Seq("node"), "left")
        .na.fill(0L, Seq("reset"))
    }).localCheckpoint(true)

    // The rank table is |nodes| rows; the edge table is |E| — usually
    // orders of magnitude bigger. When the node table fits a
    // broadcast, each round joins the (tiny) per-node contribution
    // rate INTO the stationary checkpointed edges — no edge shuffle,
    // ever. Past the limit it degrades to a plain shuffled equi-join
    // (checkpointed DataFrames report no size stats, so Spark would
    // never choose the broadcast on its own).
    val nNodes = base.count()
    val maybeBroadcast: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeLimit) broadcast _ else identity _

    var rank = base.withColumn("rank", col("reset") * lit(1000000L))
    // the PREVIOUS round-checkpoint, tracked separately: with
    // checkpointEvery > 1, `rank` is often an un-checkpointed
    // intermediate plan, and free() on that would be a silent no-op —
    // superseded checkpoint blocks would then never be released
    var lastCp: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      // deg rides inside the rank table: the rate is a projection,
      // not a join.
      val rate = rank
        .select(col("node").as("src"), expr("rank div deg").as("c"))
      val contrib = e
        .join(maybeBroadcast(rate), "src")
        .select(col("dst").as("node"), col("c"))
        .groupBy("node")
        .agg(sum("c").as("s"))
      // base and contrib are both hash(node)-partitioned with the
      // session shuffle parallelism — the damping join is
      // exchange-free.
      val next = base
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("reset"),
          (col("reset") * lit(150000L) +
            expr("85 * coalesce(s, 0L) div 100")).as("rank"))
      inspectRound(next)
      if (i % checkpointEvery == 0 && i < iterations) {
        val cp = next.localCheckpoint(true)
        // the superseded checkpoint's blocks can never be read again —
        // free them now rather than waiting for the GC-driven
        // ContextCleaner. (e/base stay persisted: the final rounds'
        // un-checkpointed plans still reference them.)
        lastCp.foreach(free)
        lastCp = Some(cp)
        rank = cp
      } else {
        rank = next
      }
    }
    rank.select("node", "rank")
  }
}
