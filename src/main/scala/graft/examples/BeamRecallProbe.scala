package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s14 calibration probe: live beam-search recall (hits of the exact
  * top-5×10-query set) at each bundled corpus, per candidate config,
  * with build and search WALL TIMES measured separately — the
  * measurement behind both the s14 recall floor and the
  * refine-rounds/seed-count choices. `sweep` sweeps refineRounds ∈
  * {1,2,3,4} (build cost is refine-dominated — the round-13 verdict's
  * "is 4 rounds needed?" question) and seedCount ∈ {64, 128} under
  * the bounded-entry seeds() (fixed ABSOLUTE seed count — round 0 is
  * corpus-independent, the round-13 weak-item fix).
  */
object BeamRecallProbe {

  /** `scale` mode: build vs SERVING wall time measured SEPARATELY at
    * 1×/10×/100× (sf0.1 + the ScaleBench-generated dirs) under the
    * shipped s14 config — the round-13 verdict's missing s14 row.
    * Recall is NOT measured here: the scale generator replicates
    * embedding VECTORS verbatim across disjoint ids (only doc TEXT
    * gets disjoint suffixes), so every vector gains 9 cosine-1.0
    * duplicates and the exact-top-5 set degenerates — timing
    * transfers, neighbor structure does not. Warmup + min-of-2 per
    * phase (the ScaleBench protocol).
    */
  private def scaleMode(spark: SparkSession): Unit = {
    val dirs = Seq("1x" -> "/root/testdata/sf0.1",
      "10x" -> "/tmp/graft-scale/sf1", "100x" -> "/tmp/graft-scale/sf10")
    for ((tag, d) <- dirs) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val n = emb.count()
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      def buildOnce() = graft.operators.KnnBeam.buildGraph(emb,
        refineRounds = 2)
      def time(f: () => Unit): Double = {
        f() // warmup: codegen + JIT
        (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val tBuild = time(() => { buildOnce(); () })
      val graph = buildOnce()
      val entry = graft.operators.KnnBeam.seeds(emb, seedCount = 128)
        .localCheckpoint(true)
      val tServe = time(() =>
        graft.operators.KnnBeam.search(graph, emb, q, entry,
            beam = 24, rounds = 4, topK = 5)
          .write.format("noop").mode("overwrite").save())
      println(f"$tag n=$n build=$tBuild%.2fs serve=$tServe%.2fs")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("scale")) { scaleMode(spark); spark.stop(); return }
    val sweep = args.contains("sweep")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val n = emb.count()
      val cosine = graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("n_id"),
        col("embedding").as("nv"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val exact = broadcast(q).crossJoin(c)
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", cosine)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "n_id")
        .localCheckpoint(true)
      // (refineRounds, beam, searchRounds, seedCount)
      val configs =
        if (sweep) for {
          refine <- Seq(1, 2, 3, 4); seedN <- Seq(64, 128)
        } yield (refine, 24, 4, seedN)
        else Seq((2, 24, 4, 128))
      for ((refine, beam, rounds, seedN) <- configs) {
        val t0 = System.nanoTime()
        // buildGraph localCheckpoints eagerly — the call IS the build
        val graph = graft.operators.KnnBeam.buildGraph(emb,
          refineRounds = refine)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val got = graft.operators.KnnBeam.search(
            graph, emb, q,
            graft.operators.KnnBeam.seeds(emb, seedCount = seedN),
            beam = beam, rounds = rounds, topK = 5)
          .select("q_id", "n_id")
          .localCheckpoint(true)
        val tSearch = (System.nanoTime() - t1) / 1e9
        val hits = got.join(exact, Seq("q_id", "n_id"), "left_semi")
          .count()
        println(f"sf$sf n=$n refine=$refine beam=$beam rounds=$rounds " +
          f"seeds=$seedN hits=$hits/50 build=$tBuild%.2fs search=$tSearch%.2fs")
      }
    }
    spark.stop()
  }
}
