package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Floor-calibration harness for the IVF recall contracts (s5's
  * scaladoc rule: "recalibrate the floor before trusting this
  * contract elsewhere"): measures recall@5 hits out of 50 against
  * the exact brute-force arm at nprobe ∈ {1, 2, 4} of 8 cells on
  * each bundled corpus. s23's floors (10/20/30) were set from this
  * harness's measurements (15-20 / 26-30 / 37-41 at sf0.001-0.1),
  * each above the 50·nprobe/8 random-probe baseline. Run it against
  * a new embedding corpus BEFORE shipping s5/s23-style contracts on
  * it, and set floors between the random baseline and the measured
  * minimum.
  */
object NprobeCalib {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    for (d <- sfs) {
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val model = graft.operators.IvfIndex.train(
        emb, "vec_id", "embedding", k = 8, iters = 3)
      val index = graft.operators.IvfIndex.assign(
        emb.select(col("vec_id").as("n_id"), col("embedding").as("nv")),
        "nv", model)
      val cosine = graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv"))
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val probes = Seq(1, 2, 4).map(np =>
        graft.operators.IvfIndex.probe(qs, "qv", model, np)
          .withColumn("lvl", lit(np))).reduce(_ unionByName _)
      val w = Window.partitionBy("lvl", "q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val ivf5 = broadcast(probes)
        .join(index, col("probe_cell") === col("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", cosine)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("lvl"), col("q_id"), col("n_id"))
      val exact = qs.crossJoin(
          emb.select(col("vec_id").as("n_id"), col("embedding").as("nv")))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", cosine)
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select("q_id", "n_id")
      val hits = exact.join(ivf5, Seq("q_id", "n_id"))
        .groupBy("lvl").count().orderBy("lvl").collect()
      println(s"$d: " +
        hits.map(r => s"np${r.getInt(0)}=${r.getLong(1)}").mkString(" "))
    }
    spark.stop()
  }
}
