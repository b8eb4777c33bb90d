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
  * pays); then compact and re-measure. The SCALE.md round-18 table
  * is this probe's output (run on the 10× genemb dir — the corpus
  * must hold > appends·batch vectors; sf0.01's 500 don't cover the
  * default 16×50).
  *
  *   runMain graft.examples.StoreAmpProbe [sfDir] [appends] [batch]
  */
object StoreAmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale-emb/sf1")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(16)
    val batchN = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // rank-based splits, NOT vec_id ranges: the genemb dirs'
    // copy-shifted ids are sparse (0..1999, 1e6..1e6+1999, …), so an
    // id-range batch past the copy-0 block is silently EMPTY — the
    // round-17 defaults measured 16 empty appends that way
    val byId = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("rn", row_number().over(byId).cast("long") - 1L)
      .localCheckpoint(true)
    val n = emb.count()
    val baseN = n - nAppends.toLong * batchN
    require(baseN > 0, s"corpus $n too small for $nAppends×$batchN")
    val base = emb.filter(col("rn") < baseN).drop("rn")
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
    val probeBatch = emb.filter(col("rn") >= baseN &&
      col("rn") < baseN + batchN).drop("rn").localCheckpoint(true)
    println(s"[amp] base=$baseN appends=$nAppends batch=$batchN")
    for (i <- 0 until nAppends) {
      val lo = baseN + i.toLong * batchN
      val b = emb.filter(col("rn") >= lo &&
        col("rn") < lo + batchN).drop("rn")
      require(b.count() == batchN.toLong,
        s"append $i: batch is not $batchN rows — empty appends " +
          "measure nothing")
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
