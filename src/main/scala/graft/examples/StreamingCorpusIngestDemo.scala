package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming training-data ingestion: documents arrive as files in
  * waves; each wave is drained with a checkpointed `AvailableNow`
  * stream and merged idempotently into a curated store.
  *
  * What this demonstrates at scale:
  *   - the FILE SOURCE tracks processed files in the checkpoint — a
  *     restarted (or re-run) stream never re-reads ingested files, so
  *     "drop a batch of crawl output into the bucket" is the whole
  *     upstream contract;
  *   - the quality gate runs in-stream (narrow, no state);
  *   - dedup is split correctly between tiers: in-batch exact dedup in
  *     the micro-batch, then an anti-join against the curated store in
  *     `foreachBatch` — so re-delivered duplicates across waves never
  *     land twice (idempotent merge, the streaming twin of p1's exact
  *     dedup stage);
  *   - `foreachBatch` gives the batch-side full DataFrame API (the
  *     anti-join) that pure streaming operators cannot express without
  *     unbounded state.
  *
  * Usage: runMain graft.examples.StreamingCorpusIngestDemo [workDir]
  */
object StreamingCorpusIngestDemo {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-stream-ingest")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-streaming-ingest")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inDir = s"$workDir/incoming"
    val curatedDir = s"$workDir/curated"
    val ckptDir = s"$workDir/checkpoint"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(workDir), true)

    val corpus = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")

    // Three arrival waves; waves 2 and 3 re-deliver a slice of the
    // previous wave (duplicated crawl output — the common failure mode).
    val waves = Seq(
      corpus.filter(col("doc_id") < 200),
      corpus.filter(col("doc_id") >= 150 && col("doc_id") < 350),
      corpus.filter(col("doc_id") >= 300))

    def curated(): DataFrame =
      graft.Sources.readParquetOrEmpty(spark, curatedDir,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType))))

    waves.zipWithIndex.foreach { case (wave, i) =>
      wave.write.mode("append").json(inDir)
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .json(inDir)
        // quality gate, in-stream (narrow)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(col("n_tokens") >= 20)
        .withColumn("fp",
          md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      val q = stream.writeStream
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // in-batch exact dedup, then idempotent merge: only
          // fingerprints unseen in the curated store land
          val fresh = batch
            .withColumn("rk", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("fp").orderBy("doc_id")))
            .filter(col("rk") === 1)
            .join(curated().select("fp"), Seq("fp"), "left_anti")
            .select("doc_id", "fp")
          fresh.write.mode("append").parquet(curatedDir)
        }
        .start()
      q.awaitTermination()
      println(s"[ingest] wave $i: curated total = ${curated().count()}")
    }

    // a re-run with the same checkpoint ingests nothing new
    val q = spark.readStream.schema("doc_id LONG, text STRING").json(inDir)
      .writeStream.option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        println(s"[ingest] replay batch rows = ${batch.count()} (expect 0)")
      }
      .start()
    q.awaitTermination()
    println(s"[ingest] final curated = ${curated().count()} " +
      s"(source docs: ${corpus.count()}, exact-dup groups collapse)")
    spark.stop()
  }
}
