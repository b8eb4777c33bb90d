package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{EdgeStore, KnnBeam}
import graft.streaming.StreamingIndexMaintenance

/** The streaming maintenance loop over the persisted stores: a
  * two-wave ingest (with a checkpoint restart between the waves)
  * must land the SAME edges and index metadata as the in-memory
  * batch chain; a fully replayed delivery is a no-op; a partial
  * replay inserts exactly its fresh ids.
  */
class StreamingIndexMaintenanceSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def b1 = emb.filter(col("vec_id") % 10 === 8)
  private def b2 = emb.filter(col("vec_id") % 10 === 9)

  private def rows(df: DataFrame): Seq[(Long, Seq[Float])] = {
    val session = spark
    import session.implicits._
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
  }

  private def edgeSet(g: DataFrame): Set[(Long, Long, Double)] =
    g.select("node", "nbr", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-stream-maint").toString

  /** Drain `wave` through one AvailableNow maintenance query. */
  private def ingest(wave: Seq[(Long, Seq[Float])], indexDir: String,
      edgeDir: String, ckpt: String): Unit = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    input.addData(wave: _*)
    val q = StreamingIndexMaintenance.attach(
      input.toDF().toDF("vec_id", "embedding"),
      indexDir, edgeDir, ckpt)
    try q.awaitTermination(120000)
    finally if (q.isActive) q.stop()
  }

  test("two waves through separate maintenance queries equal the " +
      "in-memory batch chain edge-for-edge and count-for-count; a " +
      "full redelivery of both waves is a no-op; a partial replay " +
      "inserts only its fresh ids") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx0 = KnnBeam.buildBandIndex(base)
    val indexDir = tmp() + "/index"
    val edgeDir = tmp() + "/edges"
    idx0.write(indexDir)
    EdgeStore.write(g0, edgeDir, nBuckets = 16)

    // wave 1, then wave 2 through a SEPARATE query — each delivery
    // its own checkpoint (MemoryStream offsets are not recoverable
    // across instances; the loop's cross-query idempotence contract
    // is the replay split over the STORES, exercised below, not
    // source offsets)
    ingest(rows(b1), indexDir, edgeDir, tmp() + "/ckpt1")
    ingest(rows(b2), indexDir, edgeDir, tmp() + "/ckpt2b")

    // the in-memory chain over the same batches
    val mem1 = KnnBeam.insertBatchIndexed(g0, idx0, b1)
    val mem2 = KnnBeam.insertBatchIndexed(
      mem1.graph.localCheckpoint(true), mem1.index, b2)

    val storedIdx = KnnBeam.BandIndex.load(spark, indexDir)
    assert(storedIdx.count == mem2.index.count &&
      storedIdx.churn == mem2.index.churn,
      s"index metadata diverged: ${storedIdx.count}/${storedIdx.churn}" +
        s" vs ${mem2.index.count}/${mem2.index.churn}")
    assert(storedIdx.rows.count() == mem2.index.rows.count())
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(mem2.graph),
      "streamed maintenance diverged from the in-memory chain")

    // full redelivery (fresh checkpoint — the source replays both
    // waves): the replay split must make it a no-op
    ingest(rows(b1) ++ rows(b2), indexDir, edgeDir, tmp() + "/ckpt2")
    val afterReplay = KnnBeam.BandIndex.load(spark, indexDir)
    assert(afterReplay.count == mem2.index.count &&
      afterReplay.churn == mem2.index.churn,
      "a fully replayed delivery advanced the metadata")
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(mem2.graph),
      "a fully replayed delivery changed the edges")

    // partial replay: half of b2 again + genuinely new ids (outside
    // every corpus id — the 9e9 shift, insertCostMode's convention) —
    // only the fresh remainder may land
    val freshIds = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 9000000000L).as("vec_id"),
        col("embedding"))
    ingest(rows(b2).take(rows(b2).size / 2) ++ rows(freshIds),
      indexDir, edgeDir, tmp() + "/ckpt3")
    val afterPartial = KnnBeam.BandIndex.load(spark, indexDir)
    val freshN = freshIds.count()
    assert(afterPartial.count == mem2.index.count + freshN,
      s"partial replay: count ${afterPartial.count}, expected " +
        s"${mem2.index.count + freshN}")
    val memFinal = KnnBeam.insertBatchIndexed(
      mem2.graph.localCheckpoint(true), mem2.index, freshIds)
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(memFinal.graph),
      "partial replay diverged from inserting only the fresh ids")
  }

  test("a delete wave through processRemoveBatch equals the " +
      "in-memory removeBatch on both stores, and a redelivered " +
      "delete is a no-op") {
    val session = spark
    import session.implicits._
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx0 = KnnBeam.buildBandIndex(base)
    val indexDir = tmp() + "/index"
    val edgeDir = tmp() + "/edges"
    idx0.write(indexDir)
    EdgeStore.write(g0, edgeDir, nBuckets = 16)
    val victimIds = base.select("vec_id").orderBy("vec_id").limit(40)
      .collect().map(_.getLong(0)).toSeq
    // the streaming step is directly callable — batch erasure jobs
    // and foreachBatch share this code
    StreamingIndexMaintenance.processRemoveBatch(indexDir, edgeDir)(
      victimIds.toDF("vec_id"), 0L)
    val mem = KnnBeam.removeBatch(g0, idx0,
      victimIds.toDF("vec_id"))
    val storedIdx = KnnBeam.BandIndex.load(spark, indexDir)
    assert(storedIdx.count == mem.index.count &&
      storedIdx.churn == mem.index.churn)
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(mem.graph),
      "streamed delete diverged from the in-memory removeBatch")
    assert(storedIdx.rows.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*)).count() == 0L)
    // redelivery: ids no longer live → no-op on both stores
    StreamingIndexMaintenance.processRemoveBatch(indexDir, edgeDir)(
      victimIds.toDF("vec_id"), 1L)
    val after = KnnBeam.BandIndex.load(spark, indexDir)
    assert(after.count == mem.index.count &&
      after.churn == mem.index.churn,
      "a redelivered delete advanced the metadata")
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(mem.graph),
      "a redelivered delete changed the edges")
  }
}
