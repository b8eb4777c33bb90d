package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{EdgeStore, KnnBeam}

/** STREAMING maintenance of a persisted graph-ANN deployment — the
  * production ingestion loop over the round-14..16 batch machinery:
  * per micro-batch, [[KnnBeam.insertBatchIndexed]] against the
  * persisted [[KnnBeam.BandIndex]] (touching only the batch's
  * colliding buckets) and [[EdgeStore.applyInsert]] against the
  * node-bucketed edge store (touching only the affected buckets),
  * then [[KnnBeam.BandIndex.append]] advances the index. Work per
  * micro-batch is DELTA-SIZED at any index size — the flat insert
  * curve SCALE.md measured, now on an unbounded stream.
  *
  * This is `foreachBatch` territory, not a stateful streaming
  * operator: the maintenance step needs the full batch DataFrame API
  * (pruned joins against two persisted stores) and transactional
  * store writes — state that must outlive the query and serve
  * EXTERNAL readers, which no `GroupState` can hold. The in-stream
  * candidate-gate twin ([[StreamingKnnIngest]]) covers the
  * low-latency emit-edges-as-they-collide shape; THIS driver is the
  * system of record.
  *
  * At-least-once delivery is handled by the REPLAY SPLIT, riding the
  * same pruned bucket read as the insert itself
  * ([[KnnBeam.presentIds]]): ids already in the index are dropped,
  * the fresh remainder inserts — a fully replayed micro-batch
  * (checkpoint recovery) is a no-op, a partially replayed one
  * (source compaction across restart) inserts exactly its new ids.
  * WRITE ORDER makes the replay split safe: edges apply BEFORE the
  * index appends, so a crash between the two leaves the batch's ids
  * absent from the index — the restarted query re-runs the insert
  * (computing the identical edges — same geometry, same stored
  * index) and [[EdgeStore.applyDelta]]'s idempotence heals the edge
  * side. The reverse order would mark ids present while their edges
  * were never applied. Same-id-new-vector UPDATES are not a stream
  * insert (a changed vector bands elsewhere — undetectable
  * bucket-locally): route them through
  * [[KnnBeam.removeBatch]]/[[EdgeStore.applyRemove]] upstream, per
  * the batch contract.
  *
  * `onRebuildNeeded` fires (once per triggering batch) when the
  * maintained metadata trips [[KnnBeam.BandIndex.needsRebuild]] —
  * geometry outgrown or churn past the measured re-densify point;
  * the callback SCHEDULES the rebuild (an offline reorganization —
  * [[graft.operators.IndexLifecycle.rebuildStores]]), it does not
  * run it inline. `onCompactNeeded` is its cheaper IO sibling: it
  * fires when [[KnnBeam.BandIndex.needsCompact]] says appended delta
  * files or pending tombstones have amplified reads past the
  * configured bound, and schedules [[KnnBeam.BandIndex.compact]].
  * When both trip on one batch only the rebuild fires — it subsumes
  * the compact (fresh store, counters reset).
  */
object StreamingIndexMaintenance {

  /** One maintenance step, shaped for `foreachBatch`. Also callable
    * directly for batch backfills — the streaming and batch ingest
    * paths are the SAME code.
    */
  def processBatch(
      indexDir: String,
      edgeDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      graphDegree: Int = KnnBeam.AutoDegree,
      maxHamming: Int = 16,
      onRebuildNeeded: KnnBeam.BandIndex => Unit = _ => (),
      onCompactNeeded: KnnBeam.BandIndex => Unit = _ => ())(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // in-batch id dedup: at-least-once sources can deliver an id
    // twice in one batch; duplicates of a replay are identical rows
    val b = batch.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("embedding"))
      .dropDuplicates("vec_id")
      .localCheckpoint(true)
    if (b.isEmpty) return
    val idx = KnnBeam.BandIndex.load(spark, indexDir)
    // replay split on the pruned bucket read — never an index scan
    val fresh = b.join(
        KnnBeam.presentIds(idx, b, dims = dims),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    if (fresh.isEmpty) return // fully replayed micro-batch: no-op
    val graph = EdgeStore.load(spark, edgeDir)
    // assumeDisjoint: the replay split above ran the identical
    // pruned semi-join — skip the guaranteed-zero guard job
    val ins = KnnBeam.insertBatchIndexed(graph, idx, fresh,
      dims = dims, graphDegree = graphDegree, maxHamming = maxHamming,
      assumeDisjoint = true)
    // edges BEFORE index — see the write-order contract above
    EdgeStore.applyInsert(edgeDir, ins)
    val updated = KnnBeam.BandIndex.append(indexDir, ins)
    if (updated.needsRebuild()) onRebuildNeeded(updated)
    else if (updated.needsCompact()) onCompactNeeded(updated)
  }

  /** The DELETE side of the loop — a micro-batch of ids to erase
    * (retention expiry, takedown/erasure requests): [[KnnBeam
    * .removeBatch]] against the loaded stores, [[EdgeStore
    * .applyRemove]] (removed nodes' buckets rewritten, survivors'
    * neighborhoods replaced), then [[KnnBeam.BandIndex.tombstone]].
    * Deletes are idempotent by construction (ids not live are
    * ignored), so redeliveries need no split; the same
    * edges-before-index write order applies — a crash between the
    * two re-runs as a no-op on the edge side. An id deleted here
    * re-admits later through the normal insert path (update-in-place
    * = this, then insert). Shaped for `foreachBatch` over an id
    * stream; also callable directly for batch erasure jobs.
    */
  def processRemoveBatch(
      indexDir: String,
      edgeDir: String,
      idCol: String = "vec_id",
      onRebuildNeeded: KnnBeam.BandIndex => Unit = _ => (),
      onCompactNeeded: KnnBeam.BandIndex => Unit = _ => ())(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val ids = batch.select(col(idCol).cast("long").as("vec_id"))
      .distinct().localCheckpoint(true)
    if (ids.isEmpty) return
    val idx = KnnBeam.BandIndex.load(spark, indexDir)
    val graph = EdgeStore.load(spark, edgeDir)
    val rem = KnnBeam.removeBatch(graph, idx, ids)
    if (rem.removedIds.isEmpty) return // nothing live — replay no-op
    EdgeStore.applyRemove(edgeDir, rem)
    val updated = KnnBeam.BandIndex.tombstone(indexDir, rem)
    if (updated.needsRebuild()) onRebuildNeeded(updated)
    else if (updated.needsCompact()) onCompactNeeded(updated)
  }

  /** Attach the maintenance loop to a streaming (id, embedding)
    * frame. The stores must exist ([[KnnBeam.buildGraph]] +
    * [[EdgeStore.write]], [[KnnBeam.buildBandIndex]] +
    * `BandIndex.write` — an empty corpus build seeds a from-scratch
    * deployment). Trigger defaults to AvailableNow (drain-and-stop,
    * the backfill shape); pass `Trigger.ProcessingTime(...)` for a
    * long-running ingest.
    */
  def attach(
      vecs: DataFrame,
      indexDir: String,
      edgeDir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      graphDegree: Int = KnnBeam.AutoDegree,
      maxHamming: Int = 16,
      trigger: Trigger = Trigger.AvailableNow(),
      onRebuildNeeded: KnnBeam.BandIndex => Unit = _ => (),
      onCompactNeeded: KnnBeam.BandIndex => Unit = _ => ())
      : StreamingQuery = {
    val step = processBatch(indexDir, edgeDir, idCol, vecCol, dims,
      graphDegree, maxHamming, onRebuildNeeded, onCompactNeeded) _
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch(step)
      .start()
  }
}
