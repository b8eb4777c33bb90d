package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s14 calibration probe: live beam-search recall (hits of the exact
  * top-5×10-query set) at each bundled corpus under the SHIPPED
  * config (refineRounds=4, seedStride=11, beam=24, rounds=4), the
  * measurement behind the s14 recall floor. Round-13 run: 41/38/27
  * hits at sf0.001/0.01/0.1. The sweep arm prints the
  * refine/beam/round sensitivity that picked the config — NN-descent
  * refinement is the decisive lever on this near-unclustered corpus
  * (13→30+ hits at sf0.001 going from 0 to 2 descent rounds).
  */
object BeamRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
      val configs =
        if (sweep) Seq((2, 12, 3, 31), (2, 24, 4, 11), (4, 16, 3, 31),
          (4, 24, 4, 11))
        else Seq((4, 24, 4, 11))
      for ((refine, beam, rounds, stride) <- configs) {
        val graph = graft.operators.KnnBeam.buildGraph(emb,
          refineRounds = refine)
        val got = graft.operators.KnnBeam.search(
            graph, emb, q,
            graft.operators.KnnBeam.seeds(emb, seedStride = stride),
            beam = beam, rounds = rounds, topK = 5)
          .select("q_id", "n_id")
        val hits = got.join(exact, Seq("q_id", "n_id"), "left_semi")
          .count()
        println(s"sf$sf n=$n refine=$refine beam=$beam rounds=$rounds " +
          s"stride=$stride hits=$hits/50")
      }
    }
    spark.stop()
  }
}
