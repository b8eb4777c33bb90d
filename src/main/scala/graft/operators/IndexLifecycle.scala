package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The offline reorganization jobs of a persisted graph-ANN
  * deployment ([[KnnBeam.BandIndex]] + [[EdgeStore]]) — what the
  * streaming maintenance loop's `needsRebuild` / `needsCompact`
  * callbacks SCHEDULE (the triggers are metadata arithmetic; these
  * are the jobs they pay for).
  *
  * Reference basis: the reference has no index lifecycle at all (it
  * recomputes per cycle, `/root/reference/src/plugins/scripts/
  * active_flights/script.py` reloads state each run); this is the
  * 100 TB-scale machinery a maintained ANN deployment needs — churn
  * accumulates (inserts skip the NN-descent densifier, deletes drop
  * edges without repair), so past the measured drift point the
  * stores must be re-densified from the live corpus.
  *
  * Crash discipline: rebuildStores never needs cross-store
  * atomicity, because a REBUILD PRESERVES THE ID SET — the new
  * index/graph hold exactly the live ids the old pair held (it
  * re-derives edges and band rows, folds tombstones, refreshes
  * geometry). A reader that catches the swap between the two stores
  * sees a mixed pair over the SAME ids — every search result is a
  * live id either way. Each store's own swap is atomic-with-heal
  * ([[EdgeStore.write]]'s write-then-swap, [[KnnBeam.BandIndex
  * .replace]]'s swapIn + heal-at-load), so a crash at ANY point
  * leaves both stores servable: whichever store swapped keeps its
  * new contents, whichever didn't (or was mid-rename) heals back to
  * its old contents, and re-running rebuildStores converges.
  * Single-writer like all maintenance: pause the ingest loop across
  * the rebuild (the maintained metadata the loop appends to is
  * replaced by the swap).
  */
object IndexLifecycle {

  /** Rebuild both stores from the index's own live rows and swap
    * them in: the re-densify job [[KnnBeam.BandIndex.needsRebuild]]
    * schedules. The live corpus is read off the stored band-0 rows
    * (one row per live id, tombstones already applied by load, the
    * raw vector stored beside the signature) — no external corpus
    * needed; the stored vector IS the ingested one, so the rebuild
    * is bit-identical to a fresh [[KnnBeam.buildGraph]] +
    * [[KnnBeam.buildBandIndex]] over the same vectors.
    *
    * Fresh geometry comes from `bandParams` at TODAY'S count (the
    * geometry-drift half of the trigger), churn and the compaction
    * counters reset, and the tombstone list folds away with the
    * replaced store.
    *
    * @param nBuckets edge-store bucket count for the rebuilt store;
    *        -1 keeps the stored one (or the EdgeStore default if no
    *        edge store exists yet — a rebuild may lawfully CREATE the
    *        edge half when only the index was ever persisted). A
    *        rebuild is the one legal point to re-bucket (applyDelta's
    *        bucket prune assumes a fixed count between rebuilds).
    * @return the reloaded post-rebuild index.
    */
  def rebuildStores(
      spark: SparkSession,
      indexDir: String,
      edgeDir: String,
      dims: Int = 64,
      targetBucket: Long = 32L,
      graphDegree: Int = KnnBeam.AutoDegree,
      maxHamming: Int = 16,
      refineRounds: Int = 2,
      nBuckets: Int = -1): KnnBeam.BandIndex = {
    // roll forward any crashed append first — its rows are part of
    // the live corpus the rebuild must carry
    val idx = KnnBeam.BandIndex.recover(spark, indexDir)
    // and heal the EDGE store before its metadata read below: a
    // prior rebuild that crashed between EdgeStore.write's two
    // renames left the live edge dir missing (parked at
    // `.rebuild-old`), and the documented "re-running rebuildStores
    // converges" must hold from exactly that state — the index side
    // already healed inside recover→load
    EdgeStore.heal(spark, edgeDir)
    // checkpoint: the build jobs below and the edge-store write all
    // read this; the index swap later deletes the old files it came
    // from, so the lineage must not reach back to them
    val live = idx.rows.filter(col("band") === 0)
      .select(col("vec_id"), col("vec").as("embedding"))
      .localCheckpoint(true)
    val newGraph = KnnBeam.buildGraph(live, dims = dims,
      graphDegree = graphDegree, maxHamming = maxHamming,
      refineRounds = refineRounds)
    val newIdx = KnnBeam.buildBandIndex(live, dims = dims,
      targetBucket = targetBucket)
    // edges first (write-then-swap inside EdgeStore.write): if the
    // index swap below never happens, old-index + new-edges is a
    // servable pair over the same id set
    val nb = if (nBuckets > 0) nBuckets
      else EdgeStore.bucketsOrDefault(spark, edgeDir)
    EdgeStore.write(newGraph, edgeDir, nb)
    KnnBeam.BandIndex.replace(spark, indexDir, newIdx)
  }

  /** The file-fold job [[KnnBeam.BandIndex.needsCompact]] schedules:
    * one bv-sorted file per directory again, tombstones applied and
    * cleared, counters reset. The edge store needs no analog —
    * [[EdgeStore.applyDelta]] REWRITES whole buckets (one file set
    * per bucket at all times), it never appends.
    */
  def compactIndex(spark: SparkSession,
      indexDir: String): KnnBeam.BandIndex =
    KnnBeam.BandIndex.compact(spark, indexDir)
}
