package graft.examples

import graft.functions.VectorExprs.cosine_similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native codegen'd cosine vs the zip_with/aggregate
  * higher-order-function formulation over the full sf0.1 embedding
  * cross join (2000×2000 = 4M 64-d pairs).
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val pairs = emb.select(col("embedding").as("qv"))
      .crossJoin(emb.select(col("embedding").as("nv")))
    val hof = expr(
      """aggregate(zip_with(qv, nv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   0D, (acc, v) -> acc + v)
         / (sqrt(aggregate(qv, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
            * sqrt(aggregate(nv, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cos] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 2).foreach { r =>
      time(s"hof r$r")(
        pairs.select(sum(hof)).collect())
      time(s"native r$r")(
        pairs.select(sum(cosine_similarity(col("qv"), col("nv")))).collect())
    }
    spark.stop()
  }
}
