package graft.examples

import graft.operators.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head of the two as-of join implementations on a synthetic
  * quotes/trades workload: N_KEYS keys × N_LEFT probe rows × N_RIGHT
  * quote rows. Usage: runMain graft.examples.AsOfBench [rows-per-side]
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keys = 50000
    val left = spark.range(n).select(
      col("id").as("lid"),
      pmod(hash(col("id")), lit(keys)).cast("long").as("k"),
      (col("id") * 7919 % 1000000000L).as("ts"),
      (col("id") % 97).cast("double").as("amount"))
    val right = spark.range(n).select(
      pmod(hash(col("id") + 1), lit(keys)).cast("long").as("k"),
      (col("id") * 6271 % 1000000000L).as("ts"),
      (col("id") % 89).cast("double").as("quote"))

    def time(label: String)(f: => Unit): Unit = {
      f // warmup: codegen + JIT
      val t0 = System.nanoTime()
      f
      println(f"[asof-bench] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    time("composition (union+window)") {
      AsOfJoin.asofJoin(left, right, "k", "ts", Seq("quote"))
        .write.format("noop").mode("overwrite").save()
    }
    time("native (merge exec)") {
      AsOfJoin.asofJoinNative(left, right, "k", "ts", Seq("quote"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
