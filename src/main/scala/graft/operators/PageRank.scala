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
  * Scale shape: each iteration is one equi-join (edges × ranks,
  * shuffled on the join key) and one aggregation — the standard
  * distributed PageRank round. No driver-side state beyond the loop
  * counter; each round is `localCheckpoint`ed so lineage (and
  * planning time) stays constant across iterations.
  */
object PageRank {

  /** @param edges directed edge list; dangling nodes (no out-edges)
    *              contribute nothing — with symmetric edges every
    *              node has out-degree ≥ 1
    * @return (node, rank) for every node with at least one out-edge,
    *         rank in micro-units after `iterations` damped rounds
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // node set = sources (with symmetric input this is all nodes);
    // re-materialized once, reused every round on both sides
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)

    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(deg, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node")
        .agg(sum("c").as("s"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(s, 0L) div 100"))
            .as("rank"))
        .localCheckpoint(true)
    }
    rank
  }
}
