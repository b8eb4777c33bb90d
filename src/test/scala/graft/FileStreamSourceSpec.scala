package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File-source streaming e2e: the engine tails a directory of parquet
  * drops (the cloud-storage landing-zone pattern), picks up each new
  * file exactly once, and survives a query restart from the checkpoint
  * without re-emitting — the ingestion shape the reference's 5-minute
  * poll loop becomes at scale.
  */
class FileStreamSourceSpec extends SparkSpecBase {

  test("new files are picked up exactly once, restart does not re-emit") {
    val session = spark
    import session.implicits._
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    def drop(ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc$i")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)

    drop(0 until 10)
    val schema = spark.read.parquet(srcDir).schema

    def startQuery() = spark.readStream.schema(schema).parquet(srcDir)
      .groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("file_src_out").start()

    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(spark.table("file_src_out").select("n").as[Long].head() == 10L)
      drop(10 until 25)
      q1.processAllAvailable()
      assert(spark.table("file_src_out").select("n").as[Long].head() == 25L)
    } finally q1.stop()

    // Restart from the checkpoint: already-seen files are not
    // re-ingested; a post-restart drop is.
    drop(25 until 30)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(spark.table("file_src_out").select("n").as[Long].head() == 30L)
    } finally q2.stop()
  }
}
