package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.IvfPqStore

/** Calibration for s31_ivfpq_store's recall-contract floor: builds
  * the query's exact maintained-store lineage (base 80% → append the
  * %10==8 wave under the stored models → tombstone %100==17) at each
  * bundled sf and prints how many of the 50 exact live-corpus
  * neighbors the served top-5 recovers — the measured points the
  * floor in `SimilarityQueries` cites.
  *
  * Optional env overrides CALIB_K / CALIB_NPROBE / CALIB_SHORTLIST
  * sweep the store's levers at the scaled dirs (the SCALE.md
  * round-18 decade table) without touching the query's pinned
  * bundled config.
  *
  *   runMain graft.examples.IvfPqCalib [sfDir ...]
  */
object IvfPqCalib {
  def main(args: Array[String]): Unit = {
    val kCells = sys.env.get("CALIB_K").map(_.toInt).getOrElse(8)
    val nprobe = sys.env.get("CALIB_NPROBE").map(_.toInt).getOrElse(2)
    val shortlist =
      sys.env.get("CALIB_SHORTLIST").map(_.toInt).getOrElse(50)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val out = java.nio.file.Files
        .createTempDirectory("graft-ivfpq-calib").toString + "/store"
      IvfPqStore.build(emb.filter(col("vec_id") % 10 < 8),
        "vec_id", "embedding", out, k = kCells)
      IvfPqStore.append(out, emb.filter(col("vec_id") % 10 === 8)
        .select(col("vec_id"), col("embedding").as("vec")))
      val st = IvfPqStore.remove(out,
        emb.filter(col("vec_id") % 100 === 17).select("vec_id"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val served = IvfPqStore.search(st, queries, nprobe = nprobe,
          shortlist = shortlist, k = 5)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val live = emb.filter(
        col("vec_id") % 10 < 9 && col("vec_id") % 100 =!= 17)
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val exact = broadcast(queries)
        .crossJoin(live.select(col("vec_id").as("n_id"),
          col("embedding").as("nv")))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", graft.functions.VectorExprs
          .cosine_similarity(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = exact.count(served.contains)
      println(s"[ivfpq-calib] $d n=${emb.count()} " +
        s"live=${st.count} k=$kCells nprobe=$nprobe " +
        s"shortlist=$shortlist hits=$hits/50")
    }
    spark.stop()
  }
}
