package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.KnnBeam
import graft.operators.KnnBeam.BandIndex

/** Read-amplification measurement behind `needsCompact`'s default
  * (16 appends): build a BandIndex store, append N delta batches,
  * and at each step record the store's file amplification (files per
  * touched (band, pbv) directory — the unit a point lookup reads)
  * and the wall of the maintenance point-lookup itself
  * ([[KnnBeam.presentIds]], the pruned bucket probe every insert
  * pays); then compact and re-measure. The SCALE.md round-17 row
  * cites this table.
  *
  *   runMain graft.examples.StoreAmpProbe [sfDir] [appends] [batch]
  */
object StoreAmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(16)
    val batchN = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(true)
    val n = emb.count()
    val baseN = n - nAppends.toLong * batchN
    require(baseN > 0, s"corpus $n too small for $nAppends×$batchN")
    val base = emb.filter(col("vec_id") < baseN)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-amp").toString + "/index"
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    KnnBeam.buildBandIndex(base).write(dir)

    def maxFilesPerDir(): (Long, Double) = {
      import scala.jdk.CollectionConverters._
      val counts = java.nio.file.Files
        .walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("pbv="))
        .map(d => java.nio.file.Files.list(d).iterator().asScala
          .count(_.toString.endsWith(".parquet")).toLong)
        .toVector
      (counts.max, counts.sum.toDouble / counts.size)
    }

    def probeWall(idx: BandIndex, batch: org.apache.spark.sql
        .DataFrame): Double = {
      val t0 = System.nanoTime()
      KnnBeam.presentIds(idx, batch).count()
      (System.nanoTime() - t0) / 1e9
    }

    var graph = g0
    var idx = BandIndex.load(spark, dir)
    val probeBatch = emb.filter(col("vec_id") >= baseN &&
      col("vec_id") < baseN + batchN).localCheckpoint(true)
    println(s"[amp] base=$baseN appends=$nAppends batch=$batchN")
    for (i <- 0 until nAppends) {
      val lo = baseN + i.toLong * batchN
      val b = emb.filter(col("vec_id") >= lo &&
        col("vec_id") < lo + batchN)
      val ins = KnnBeam.insertBatchIndexed(graph, idx, b)
      idx = BandIndex.append(dir, ins)
      graph = ins.graph.localCheckpoint(true)
      if ((i + 1) % 4 == 0 || i == 0 || i == nAppends - 1) {
        val (mx, avg) = maxFilesPerDir()
        val w = probeWall(idx, probeBatch)
        println(f"[amp] after append ${i + 1}%2d: files/dir " +
          f"max=$mx avg=$avg%.2f probe=$w%.2f s " +
          f"appends=${idx.appends} needsCompact=${idx.needsCompact()}")
      }
    }
    val t0 = System.nanoTime()
    idx = BandIndex.compact(spark, dir)
    val tc = (System.nanoTime() - t0) / 1e9
    val (mx, avg) = maxFilesPerDir()
    val w = probeWall(idx, probeBatch)
    println(f"[amp] after compact ($tc%.1f s): files/dir max=$mx " +
      f"avg=$avg%.2f probe=$w%.2f s appends=${idx.appends} " +
      f"needsCompact=${idx.needsCompact()}")
    spark.stop()
  }
}
