package graft.examples

import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation demo over the documents corpus:
  * quality gate → exact dedup → near-dup clustering (MinHash LSH +
  * Jaccard verify + connected components) → canonical selection →
  * deterministic split → partitioned parquet, with per-stage counts.
  *
  * Usage: runMain graft.examples.CorpusPipelineDemo [sfDir] [outDir]
  */
object CorpusPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft-corpus-out")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[corpus] input docs:            ${docs.count()}")

    // 1. quality gate (token floor + repetition ceiling)
    val gated = docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .filter(col("n_tokens") >= 20)
      .drop("w")
    println(s"[corpus] after quality gate:    ${gated.count()}")

    // 2. exact dedup on normalized fingerprint (keep min doc_id)
    val exact = gated
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rk") === 1).drop("fp", "rk")
    println(s"[corpus] after exact dedup:     ${exact.count()}")

    // 3. near-dup clusters: Jaccard-VERIFIED LSH pairs → components →
    // keep the canonical doc of each cluster. Canonical = minimum
    // SURVIVING id per component: pairs are computed over the full
    // corpus, so a cluster's global min(doc_id) may already be gone
    // (quality gate or exact dedup) — pruning against it would drop
    // every surviving member of that cluster.
    val edges = graft.queries.TextQueries
      .verifiedNearDupEdges(spark, sfDir, threshold = 0.2)
    val comps = ConnectedComponents.run(edges, "doc_a", "doc_b")
    val surviving = comps
      .join(exact.select("doc_id"), comps("id") === col("doc_id"))
      .select(col("id"), col("component"))
    val canonPerComp = surviving.groupBy("component")
      .agg(min("id").as("canon_id"))
    val dupIds = surviving.join(canonPerComp, Seq("component"))
      .filter(col("id") =!= col("canon_id"))
      .select(col("id").as("doc_id"))
    val canonical = exact.join(dupIds, Seq("doc_id"), "left_anti")
    println(s"[corpus] after near-dup prune:  ${canonical.count()}")

    // 4. deterministic split + partitioned write
    val bucket = pmod(
      conv(substring(md5(concat(lit("0:"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long"), lit(100L))
    val splitDf = canonical.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    splitDf.write.mode("overwrite").partitionBy("split").parquet(outDir)
    spark.read.parquet(outDir).groupBy("split").count()
      .orderBy("split").collect()
      .foreach(r => println(s"[corpus] ${r.getString(0)}: ${r.getLong(1)} docs"))
    println(s"[corpus] written to $outDir")
    spark.stop()
  }
}
