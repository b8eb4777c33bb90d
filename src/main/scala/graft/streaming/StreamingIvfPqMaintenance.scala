package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.IvfPqStore

/** STREAMING maintenance of a persisted IVF-PQ deployment — the
  * [[StreamingIndexMaintenance]] loop shape applied to the
  * [[IvfPqStore]] single-store pair-free case: per micro-batch,
  * recover a crashed append, replay-split on the cell-pruned
  * [[IvfPqStore.presentIds]] probe, append the fresh remainder under
  * the STORED models, then fire the maintenance callbacks off the
  * updated metadata. Work per micro-batch is batch-sized at any store
  * size (assign+encode are narrow maps under the stored models; the
  * append rewrites nothing).
  *
  * At-least-once safety is the store's own protocol: the marker/
  * gen-bar append makes a redelivered crashed batch converge
  * (IvfPqStoreSpec's 100 randomized schedules), and the replay split
  * here makes a FULLY replayed micro-batch a no-op without touching
  * the marker path at all. Deletes are idempotent (ids not live mask
  * nothing), so the remove side needs no split.
  *
  * `onRebuildNeeded` schedules [[IvfPqStore.rebuild]] (retrain both
  * models on the store's live vectors, swap); `onCompactNeeded`
  * schedules [[IvfPqStore.compact]] (fold delta files + tombstones).
  * When both trip on one batch only the rebuild fires — it subsumes
  * the compact, same contract as the graph-ANN loop.
  */
object StreamingIvfPqMaintenance {

  /** One ingest step, shaped for `foreachBatch`; also callable
    * directly for batch backfills.
    */
  def processBatch(
      dir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      onRebuildNeeded: IvfPqStore.Store => Unit = _ => (),
      onCompactNeeded: IvfPqStore.Store => Unit = _ => ())(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // CONTRACT (round-18 ADVICE): conflicting same-id rows WITHIN one
    // micro-batch are unsupported — dropDuplicates picks an arbitrary
    // one, so which vector lands is unpinned for that batch (later
    // redeliveries are replay-split, so the store cannot diverge
    // afterward). A source that can emit same-id updates in one batch
    // must pre-aggregate to its latest row before this sink.
    val b = batch.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("vec"))
      .dropDuplicates("vec_id")
      .localCheckpoint(true)
    if (b.isEmpty) return
    // roll a crashed append forward BEFORE the replay split — its
    // rows are invisible under the gen bar until recovered, and the
    // split must see them to drop the redelivered ids
    val st = IvfPqStore.recover(spark, dir)
    val fresh = b.join(IvfPqStore.presentIds(st, b),
      Seq("vec_id"), "left_anti").localCheckpoint(true)
    if (fresh.isEmpty) return // fully replayed micro-batch: no-op
    val updated = IvfPqStore.append(dir, fresh)
    if (updated.needsRebuild()) onRebuildNeeded(updated)
    else if (updated.needsCompact()) onCompactNeeded(updated)
  }

  /** The DELETE side: a micro-batch of ids to erase. Idempotent by
    * construction — no replay split needed.
    */
  def processRemoveBatch(
      dir: String,
      idCol: String = "vec_id",
      onRebuildNeeded: IvfPqStore.Store => Unit = _ => (),
      onCompactNeeded: IvfPqStore.Store => Unit = _ => ())(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val ids = batch.select(col(idCol).cast("long").as("vec_id"))
      .distinct().localCheckpoint(true)
    if (ids.isEmpty) return
    // a redelivered delete whose ids are no longer live is a pure
    // no-op — it must not re-fire the maintenance callbacks off the
    // unchanged (still past-the-bound) metadata, same early return
    // as the graph-pair loop
    val st = IvfPqStore.recover(spark, dir)
    if (ids.join(st.rows.select("vec_id"), Seq("vec_id"), "left_semi")
        .isEmpty) return
    val updated = IvfPqStore.remove(dir, ids)
    if (updated.needsRebuild()) onRebuildNeeded(updated)
    else if (updated.needsCompact()) onCompactNeeded(updated)
  }

  /** Attach the loop to a streaming (id, embedding) frame. The store
    * must exist ([[IvfPqStore.build]]). Trigger defaults to
    * AvailableNow (drain-and-stop, the backfill shape).
    */
  def attach(
      vecs: DataFrame,
      dir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trigger: Trigger = Trigger.AvailableNow(),
      onRebuildNeeded: IvfPqStore.Store => Unit = _ => (),
      onCompactNeeded: IvfPqStore.Store => Unit = _ => ())
      : StreamingQuery = {
    val step = processBatch(dir, idCol, vecCol,
      onRebuildNeeded, onCompactNeeded) _
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch(step)
      .start()
  }
}
