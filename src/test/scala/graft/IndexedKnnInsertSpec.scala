package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.KnnBeam

/** insertBatchIndexed must produce EXACTLY insertBatch's edges while
  * touching only the batch's colliding buckets of a persisted
  * BandIndex — the round-14 verdict's index-scan-free contract:
  *
  *   - edge parity (not just recall parity) with the index-less path
  *     at the same geometry and degree;
  *   - an IO guard: on a (band, pbv)-partitioned store, the insert
  *     reads a FRACTION of the index bytes (the literal bucket filter
  *     prunes partitions statically), and the pruned read loses no
  *     edges;
  *   - the index count advances by metadata arithmetic — no recount —
  *     and the delta view reconstructs the full graph.
  */
class IndexedKnnInsertSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def batch = emb.filter(col("vec_id") % 10 >= 8)

  private def edgeSet(g: DataFrame): Set[(Long, Long)] =
    g.select("node", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("edge parity: the indexed insert equals insertBatch exactly — " +
      "same pairs, and the stored build-time cosines equal the " +
      "re-scored ones bit-for-bit") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val old = KnnBeam.insertBatch(g0, base, batch)
    val idx = KnnBeam.buildBandIndex(base)
    val ins = KnnBeam.insertBatchIndexed(g0, idx, batch)
    assert(edgeSet(ins.graph) == edgeSet(old),
      "indexed insert diverged from the index-less edge set")
    // cosine parity: re-score the indexed graph's edges from vectors
    // and compare EXACTLY (stored == recomputed, the property that
    // lets the re-cut skip the vector fetch)
    val v = emb.select(col("vec_id"), col("embedding"))
    val rescored = ins.graph
      .join(v.select(col("vec_id").as("node"),
        col("embedding").as("qv")), Seq("node"))
      .join(v.select(col("vec_id").as("nbr"),
        col("embedding").as("nv")), Seq("nbr"))
      .withColumn("rc", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
    assert(rescored.filter(col("rc") =!= col("cosine")).count() == 0L,
      "a stored cosine differs from the recomputed one")
  }

  test("IO guard: on a (band, pbv)-partitioned store a small-batch " +
      "insert reads a fraction of the index bytes, and the pruned " +
      "read loses no edges") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bandindex").toString
    val idx = KnnBeam.buildBandIndex(base)
    idx.rows.repartition(col("band"), col("pbv"))
        .sortWithinPartitions("bv")
        .write.partitionBy("band", "pbv")
      .mode("overwrite").parquet(dir)
    val stored = idx.withRows(spark.read.parquet(dir))
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val small = batch.filter(col("vec_id") < 40) // a few vectors
    def bytesReadDuring(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            acc.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        f
        org.apache.spark.sql.graft.bridge.drainListeners(spark)
      } finally spark.sparkContext.removeSparkListener(l)
      acc.get()
    }
    var prunedEdges: Set[(Long, Long)] = null
    val prunedBytes = bytesReadDuring {
      prunedEdges = edgeSet(
        KnnBeam.insertBatchIndexed(g0, stored, small).graph)
    }
    var fullEdges: Set[(Long, Long)] = null
    val fullBytes = bytesReadDuring {
      // maxPruneKeys = -1 forces the no-filter path: every bucket read
      fullEdges = edgeSet(KnnBeam.insertBatchIndexed(
        g0, stored, small, maxPruneKeys = -1).graph)
    }
    assert(prunedEdges == fullEdges,
      "the bucket filter changed the result — it must be pure pruning")
    assert(prunedBytes < fullBytes,
      s"pruned insert read $prunedBytes bytes, unpruned $fullBytes — " +
        "the partition filter did not reduce IO")
    // and the filter really is a PARTITION prune, visible statically:
    // the batch's bucket keys select a strict subset of the store's
    // (band, pbv) partitions
    val totalParts = idx.rows.select("band", "pbv").distinct().count()
    val bb = KnnBeam.buildBandIndex(small)
      .rows.select("band", "pbv").distinct().count()
    assert(bb < totalParts,
      s"test premise: the small batch must collide into fewer " +
        s"buckets ($bb) than the store holds ($totalParts)")
  }

  test("index metadata: count advances by arithmetic, geometry is " +
      "carried, and a second insert chains on the returned index") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val b1 = batch.filter(col("vec_id") % 10 === 8)
    val b2 = batch.filter(col("vec_id") % 10 === 9)
    val n1 = b1.count(); val n2 = b2.count()
    val ins1 = KnnBeam.insertBatchIndexed(g0, idx, b1)
    assert(ins1.index.count == idx.count + n1)
    assert(ins1.index.bits == idx.bits
      && ins1.index.nBands == idx.nBands)
    val ins2 = KnnBeam.insertBatchIndexed(
      ins1.graph.localCheckpoint(true), ins1.index, b2)
    assert(ins2.index.count == idx.count + n1 + n2)
    // the chained graph covers every id and respects the degree cut
    val deg = KnnBeam.autoDegree(ins2.index.count)
    assert(ins2.graph.groupBy("node").count()
      .filter(col("count") > deg).count() == 0L,
      "a node exceeds the degree cut after chained inserts")
  }

  test("delta view: full graph == (old graph minus affected) union " +
      "delta, and delta only touches affected or batch nodes") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val ins = KnnBeam.insertBatchIndexed(g0, idx, batch)
    val rebuilt = g0.join(ins.affected, Seq("node"), "left_anti")
      .select("node", "nbr")
      .unionByName(ins.delta.select("node", "nbr"))
    assert(edgeSet(ins.graph) ==
      rebuilt.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "delta does not reconstruct the full graph")
    val batchIds = batch.select(col("vec_id").as("node"))
    val foreign = ins.delta.select("node").distinct()
      .join(ins.affected, Seq("node"), "left_anti")
      .join(batchIds, Seq("node"), "left_anti")
    assert(foreign.count() == 0L,
      "delta wrote a node that is neither affected nor in the batch")
  }

  test("needsRebuild is pure metadata arithmetic: false while the " +
      "stored banding matches today's count, true once the count " +
      "outgrows it — and chained inserts carry it") {
    val idx = KnnBeam.buildBandIndex(base)
    assert(!idx.needsRebuild(),
      "a fresh index cannot already need a rebuild")
    // same geometry, count inflated past the next band-width step:
    // bits(400·32·2) > bits(400) — the stored 8-bit banding is stale
    val stale = idx.copy(count = 200000L)
    assert(stale.needsRebuild(),
      "a count two decades past build must trip the rebuild check")
  }

  test("autoDegree matches both measured pins: 8 at every bundled " +
      "corpus, 32 at the 10x-100x decades, never beyond the " +
      "measurement boundary") {
    assert(KnnBeam.autoDegree(200L) == 8)
    assert(KnnBeam.autoDegree(2000L) == 8)
    assert(KnnBeam.autoDegree(2048L) == 8)
    assert(KnnBeam.autoDegree(8192L) == 16)
    assert(KnnBeam.autoDegree(20000L) == 32)
    assert(KnnBeam.autoDegree(200000L) == 32)
    assert(KnnBeam.autoDegree(200000000L) == 32)
  }
}
