package graft.examples

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: how many listing/scan jobs does one BandIndex.load +
  * N actions cost on a band-partitioned store?
  */
object ListProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) {
          jobs.incrementAndGet()
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          println(s"[listprobe] job ${e.jobId} stages ${e.stageIds.size} $site")
        }
    })
    val emb = graft.queries.Derived
      .table(spark, "/root/testdata/sf0.1", "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("listprobe").toString + "/store"
    graft.operators.KnnBeam
      .buildBandIndex(emb.filter(col("vec_id") % 10 < 8)).write(dir)
    println("[listprobe] store written")
    Thread.sleep(500)
    record = true
    val t0 = System.nanoTime()
    val idx = graft.operators.KnnBeam.BandIndex.load(spark, dir)
    println(f"[listprobe] load done ${(System.nanoTime()-t0)/1e9}%.3f s, jobs ${jobs.get()}")
    val t1 = System.nanoTime()
    println("[listprobe] count1 " + idx.rows.count())
    println(f"[listprobe] t ${(System.nanoTime()-t1)/1e9}%.3f s, jobs ${jobs.get()}")
    val t2 = System.nanoTime()
    println("[listprobe] count2 " + idx.rows.filter(col("band") === 0).count())
    println(f"[listprobe] t ${(System.nanoTime()-t2)/1e9}%.3f s, jobs ${jobs.get()}")
    spark.stop()
  }
}
