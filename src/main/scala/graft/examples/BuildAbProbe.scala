package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Controlled A/B for the build-time corpus-vector broadcast gate
  * (KnnBeam.buildGraph `vecBroadcastBudget`): same binary, same
  * session, alternating A (budget 0 — the unhinted joins, the
  * pre-gate plan) and B (the default budget) builds on one
  * embeddings dir, so box drift cancels. Prints wall per build plus
  * an order-independent edge checksum — A and B must be
  * EDGE-IDENTICAL (the gate is a plan change, never a row change).
  *
  *   runMain graft.examples.BuildAbProbe <embDir> [reps]
  *
  * Meaningful only where the gate engages (corpus vectors past the
  * 8 MB floor — the 100× ScaleBench genemb dir at 200k×64d = 51 MB);
  * below it A and B compile to the same plan by construction.
  */
object BuildAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-emb/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .localCheckpoint(true)
    val n = emb.count()
    println(s"[ab] corpus $dir n=$n")
    def run(label: String, budget: Long): Unit = {
      val t0 = System.nanoTime()
      // buildGraph localCheckpoints eagerly — the call IS the build
      val g = graft.operators.KnnBeam.buildGraph(emb,
        vecBroadcastBudget = budget)
      val t = (System.nanoTime() - t0) / 1e9
      val r = g.agg(count(lit(1)).as("n"),
        sum(hash(col("node"), col("nbr"), col("cosine")).cast("long"))
          .as("chk")).collect().head
      println(f"[ab] $label%-10s build=$t%8.2f s " +
        f"edges=${r.getLong(0)} chk=${r.getLong(1)}")
      org.apache.spark.sql.graft.bridge.checkpointedRdd(g)
        .foreach(_.unpersist(blocking = false))
    }
    for (i <- 0 until reps) {
      run(s"A-unhinted#$i", 0L)
      run(s"B-gated#$i", graft.operators.KnnBeam.VecBroadcastBudget)
    }
    spark.stop()
  }
}
