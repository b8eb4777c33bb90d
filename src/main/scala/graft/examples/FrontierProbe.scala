package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-round changed-set fractions of the p6 co-purchase
  * corpus — the measurement behind LabelProp's `frontierFraction`
  * default (see SCALE.md). At sf0.1 the fractions run 100%, 75%,
  * 73%, 69%, then collapse to 3.8% at round 5: label propagation
  * churns the majority of nodes for several rounds and THEN
  * stabilizes, so the frontier recompute pays only past that knee —
  * which is exactly what the hybrid threshold encodes.
  */
object FrontierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct().localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).localCheckpoint(true)
    val n = labels.count()
    println(s"nodes=$n edges=${e.count()}")
    for (i <- 1 to 5) {
      val next = e.join(broadcast(labels.withColumnRenamed("node", "src")),
          "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(expr("max_by(lbl, struct(cnt, -lbl))").as("lbl"))
        .localCheckpoint(true)
      val changed = labels.withColumnRenamed("lbl", "o")
        .join(next.withColumnRenamed("lbl", "nl"), Seq("node"), "full_outer")
        .where(col("o").isNull || col("nl").isNull || col("o") =!= col("nl"))
        .count()
      println(f"round $i: changed=$changed (${changed * 100.0 / n}%.1f%%)")
      labels = next
    }
    spark.stop()
  }
}
