package graft.examples

import graft.functions.VectorExprs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** NearestCell (fused codegen'd k×d loop) vs the higher-order-function
  * formulation (transform + aggregate + array_position) for IVF cell
  * assignment — the full-corpus pass of index construction.
  * Usage: runMain graft.examples.AssignBench [rows]
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val k = 16
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => sin(col("id") * (i + 1)).cast("float")).as("v"))
    val centroids = Array.tabulate(k, dim)((c, i) =>
      math.cos(c * 31 + i).abs)
    val cents = typedlit(centroids.map(_.toSeq).toSeq)

    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      println(f"[assign-bench] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    time(s"native NearestCell ($n rows, k=$k, d=$dim)") {
      vecs.select(VectorExprs.nearest_cell(col("v"), cents).as("cell"))
        .write.format("noop").mode("overwrite").save()
    }
    time(s"HOF transform+argmin ($n rows, k=$k, d=$dim)") {
      val dists = transform(sequence(lit(0), lit(k - 1)),
        c => aggregate(
          zip_with(element_at(cents, c + 1),
            col("v").cast(ArrayType(DoubleType)),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      vecs.select(
          (array_position(dists, array_min(dists)) - 1).cast("int").as("cell"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
