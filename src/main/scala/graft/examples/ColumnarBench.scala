package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the states connector's vectorized read path against the
  * row path on the same 20M-row scan. The aggregate is a non-pushable
  * expression (`sum(velocity * 2)`) so both plans do identical
  * Spark-side work; the row path is forced with an always-true pushed
  * filter (planning-time filters disable columnar reads by design).
  */
object ColumnarBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = 20000000L
    def base = spark.read.format("graft-states")
      .option("rows", rows).option("partitions", 8).option("seed", 7)
      .option("columnar", true).load()

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Double = {
      df.collect() // warmup
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(2)
      println(f"[columnar-bench] $label%-10s median $med%.3f s of ${runs.map(r => f"$r%.3f").mkString(",")}")
      med
    }

    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(round(sum(col("velocity") * 2), 2).as("s"),
        count(col("vertical_rate")).as("n"))

    val columnar = time("columnar")(agg(base))
    val rowBase = spark.read.format("graft-states")
      .option("rows", rows).option("partitions", 8).option("seed", 7)
      .load()
    val rowPath = time("row")(agg(rowBase))
    println(f"[columnar-bench] speedup ${rowPath / columnar}%.2fx over $rows rows")
    spark.stop()
  }
}
