package graft.examples

import org.apache.spark.sql.SparkSession
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

    // 1. quality gate (token floor) — TextProfile's narrow-map columns
    val gated = graft.operators.TextProfile.withTokenStats(docs)
      .filter(col("n_tokens") >= 20)
      .drop("n_word_tokens", "len_chars")
    println(s"[corpus] after quality gate:    ${gated.count()}")

    // 2. exact dedup on normalized fingerprint (keep min doc_id).
    // At ingest scale a Bloom gate fronts this step: rows the filter
    // clears are DEFINITELY novel (no false negatives) and skip the
    // dedup join entirely, shrinking its input to ~true dups + fpp of
    // the batch. Shown against a simulated prior corpus (the even-id
    // half) with the odd-id half arriving as the new batch — the
    // pass-through count is the join input the gate leaves.
    val prior = gated.filter(pmod(col("doc_id"), lit(2)) === 0)
    val batch = gated.filter(pmod(col("doc_id"), lit(2)) === 1)
    val bloomed = graft.operators.NearDup.bloomGate(
      prior, batch, keyCol = "text", expectedItems = 100000L)
    println(s"[corpus] bloom gate: " +
      s"${bloomed.filter(col("might_be_dup")).count()} of " +
      s"${bloomed.count()} batch rows still need the dedup join")
    val exact = graft.operators.NearDup.exactDedup(gated)
    println(s"[corpus] after exact dedup:     ${exact.count()}")

    // 3. near-dup clusters via the NearDup API (LSH candidates →
    // Jaccard verify → components) → keep the canonical doc of each
    // cluster. Canonical = minimum SURVIVING id per component:
    // clusters are computed over the full corpus, so a cluster's
    // global min(doc_id) may already be gone (quality gate or exact
    // dedup) — pruning against it would drop every surviving member
    // of that cluster.
    val comps = graft.operators.NearDup.clusters(docs, threshold = 0.2)
      .withColumnRenamed("doc_id", "id")
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

    // 4. deterministic split (TextProfile's portable md5 bucket) +
    // partitioned write
    val splitDf = graft.operators.TextProfile.hashSplit(canonical)
    splitDf.write.mode("overwrite").partitionBy("split").parquet(outDir)
    spark.read.parquet(outDir).groupBy("split").count()
      .orderBy("split").collect()
      .foreach(r => println(s"[corpus] ${r.getString(0)}: ${r.getLong(1)} docs"))
    println(s"[corpus] written to $outDir")
    spark.stop()
  }
}
