package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted k-NN-graph EDGE storage — the other half of the
  * maintained ANN deployment beside [[KnnBeam.BandIndex]] (which
  * persists the banded signatures): (node, nbr, cosine) rows hashed
  * into a FIXED number of node buckets, one directory per bucket, so
  * maintenance ops touch only the buckets their nodes hash into.
  *
  * [[KnnBeam.insertBatchIndexed]] / [[KnnBeam.removeBatch]] already
  * return delta-shaped results — `delta` is the affected ∪ new
  * nodes' complete rewritten neighborhoods — precisely so a store
  * can apply them without rewriting untouched data. `applyDelta` is
  * that application: it replaces the stored neighborhoods of the
  * delta's nodes (plus explicitly dropped ids, for deletes) and
  * rewrites ONLY the touched buckets.
  *
  * Scale shape: `nBuckets` is fixed at store creation (metadata,
  * like the BandIndex banding geometry) and sizes the unit of
  * rewrite — a bucket holds ~n·degree/nBuckets edge rows, so pick
  * nBuckets to make one bucket ≈ one comfortable task/file
  * (re-bucketing is a full `write`, an index reorganization). A
  * delta touching b distinct buckets rewrites those b directories
  * and nothing else; reads of a known node prune statically on the
  * bucket literal and then on the node-sorted row groups within the
  * file.
  *
  * Crash safety mirrors [[KnnBeam.BandIndex.compact]]'s
  * write-then-swap: new bucket contents are written COMPLETE to a
  * `.staging` sibling (reading the old files — no executor-local
  * checkpoint), then each touched bucket directory is swapped in by
  * rename with the old copy PARKED in a `.old` SIBLING of the store
  * until its swap completes — both siblings sit outside partition
  * discovery, so a reader never sees staging rows, stale duplicates,
  * or a widened partition-column type. A mid-apply crash leaves
  * every bucket either fully old, fully new, or parked; [[heal]]
  * (run automatically at the next applyDelta) restores parked
  * buckets and drops superseded ones, and `applyDelta` is IDEMPOTENT
  * (replacing a neighborhood with the same rows converges), so
  * re-applying the same delta finishes a partial application with no
  * data loss. Single-writer, like any index maintenance.
  */
object EdgeStore {
  private val MetaDir = "_graft_meta"
  private val StagingSuffix = ".staging"
  private val OldSuffix = ".old"
  private val RebuildStagingSuffix = ".rebuild-staging"
  private val RebuildOldSuffix = ".rebuild-old"

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    StoreFiles.fs(spark, p)

  private def writeMeta(spark: SparkSession, dir: String,
      nBuckets: Int): Unit = {
    import spark.implicits._
    Seq(nBuckets).toDF("nBuckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$MetaDir")
  }

  /** The stored bucket count. */
  def buckets(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/$MetaDir").collect().head.getInt(0)

  /** The stored bucket count, or `default` when no store exists at
    * `dir` — the metadata read a REBUILD uses, so rebuilding into a
    * store that was never created (only the index half persisted)
    * lawfully creates it rather than throwing on the missing
    * metadata. Does NOT heal — callers on the write path ([[write]],
    * `IndexLifecycle.rebuildStores`) heal first.
    */
  def bucketsOrDefault(spark: SparkSession, dir: String,
      default: Int = 256): Int = {
    val meta = new org.apache.hadoop.fs.Path(s"$dir/$MetaDir")
    if (fs(spark, meta).exists(meta)) buckets(spark, dir) else default
  }

  private def withBucket(g: DataFrame, nBuckets: Int): DataFrame =
    g.select(col("node"), col("nbr"), col("cosine"))
      .withColumn("bucket", pmod(hash(col("node")), lit(nBuckets)))

  private def writeBuckets(g: DataFrame, dir: String,
      nBuckets: Int): Unit =
    withBucket(g, nBuckets)
      .repartition(col("bucket"))
      .sortWithinPartitions("node")
      .write.partitionBy("bucket")
      .mode("overwrite").parquet(dir)

  /** Full store write: one node-sorted file per bucket directory +
    * the bucket-count metadata. `graph` must carry the build-time
    * `cosine` column ([[KnnBeam.buildGraph]] output) — the stored
    * scores are what make delete/insert re-cuts fetch-free.
    *
    * A rebuild SUPERSEDES any parked/staged state a crashed
    * [[applyDelta]] left beside the store — but a parked bucket can
    * be a bucket's ONLY copy (crash between park and activate), and
    * this rebuild may itself crash before its swap commits, so the
    * park is HEALED INTO the current store first, never deleted
    * unhealed: heal restores parked-only buckets (and drops
    * superseded ones), then the emptied siblings can't resurrect
    * pre-rebuild edges into the fresh store after the swap (in the
    * wrong bucket, if nBuckets changed, so later bucket-pruned
    * rewrites would never replace them) and no double-crash window
    * loses a bucket.
    *
    * And the rebuild of an EXISTING store is write-then-swap, never
    * truncate-then-rewrite: the new store (buckets + metadata) is
    * written COMPLETE to a `.rebuild-staging` sibling, the old store
    * renamed aside to `.rebuild-old`, the new one renamed in, the
    * old one deleted. A crash before the first rename leaves the
    * store untouched; a crash between the renames is healed by
    * [[heal]] (the previous store renamed back — the rebuild never
    * committed, re-run it). The graph may therefore read the CURRENT
    * store's files ([[load]] lineage) — they survive until the swap.
    */
  def write(graph: DataFrame, dir: String, nBuckets: Int = 256): Unit = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val spark = graph.sparkSession
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fsys = fs(spark, dirPath)
    // heal BEFORE clearing siblings: a parked applyDelta bucket may
    // be its bucket's only copy, and if this rebuild crashes before
    // its swap the pre-rebuild store must still be whole — heal
    // consumes the `.old` park into the live store (restore-or-drop)
    // and restores a crashed previous rebuild's `.rebuild-old`
    heal(spark, dir)
    val staging = new org.apache.hadoop.fs.Path(dir + StagingSuffix)
    if (fsys.exists(staging)) fsys.delete(staging, true)
    if (!fsys.exists(dirPath)) {
      writeBuckets(graph, dir, nBuckets)
      writeMeta(spark, dir, nBuckets)
      return
    }
    val fresh = new org.apache.hadoop.fs.Path(dir + RebuildStagingSuffix)
    val old = new org.apache.hadoop.fs.Path(dir + RebuildOldSuffix)
    if (fsys.exists(fresh)) fsys.delete(fresh, true)
    if (fsys.exists(old)) fsys.delete(old, true)
    writeBuckets(graph, fresh.toString, nBuckets)
    writeMeta(spark, fresh.toString, nBuckets)
    require(fsys.rename(dirPath, old),
      s"write: could not rename $dirPath aside")
    require(fsys.rename(fresh, dirPath),
      s"write: could not activate $fresh — previous store " +
        s"preserved at $old")
    fsys.delete(old, true)
  }

  /** Rehydrate the full edge view — a plain scan (flat lineage), the
    * bucket column dropped so the in-memory schema matches
    * [[KnnBeam.buildGraph]]'s output.
    *
    * `load` HEALS first: a crashed applyDelta's parked buckets are
    * restored BEFORE the scan captures its file listing, because the
    * caller's next delta is computed from this view — computed
    * against a bucket-missing listing, a redelivered insert would
    * rebuild affected neighborhoods WITHOUT their stored edges and
    * the subsequent apply would overwrite the healed rows with the
    * underfilled result (and a delete would leave dangling edges to
    * removed ids, since their owners never enter the affected set).
    * Heal is a single existence probe when nothing is parked, and
    * the store is single-writer, so a reader healing is safe.
    */
  def load(spark: SparkSession, dir: String): DataFrame = {
    heal(spark, dir)
    spark.read.parquet(dir).drop("bucket")
  }

  /** Apply an [[KnnBeam.insertBatchIndexed]] result: the affected ∪
    * new neighborhoods are replaced by `ins.delta`, touched buckets
    * only.
    */
  def applyInsert(dir: String, ins: KnnBeam.IndexedInsert): Unit = {
    val spark = ins.delta.sparkSession
    import spark.implicits._
    applyDelta(dir, ins.delta, ins.affected,
      Seq.empty[Long].toDF("vec_id"))
  }

  /** Apply a [[KnnBeam.removeBatch]] result: removed nodes' rows
    * drop, affected survivors' neighborhoods are replaced by
    * `rem.delta`, touched buckets only.
    */
  def applyRemove(dir: String, rem: KnnBeam.IndexedRemove): Unit =
    applyDelta(dir, rem.delta, rem.affected, rem.removedIds)

  /** Apply a maintenance delta: REPLACE the stored neighborhoods of
    * `affected`'s nodes (one `node` column — passed EXPLICITLY, not
    * derived from `delta`'s rows: a delete can strip a survivor of
    * its every edge, leaving it affected but row-less in the delta,
    * and its stale stored rows must still drop) with `delta`'s rows,
    * and DROP the neighborhoods of `dropIds` (one `vec_id` column),
    * rewriting only the touched buckets. Edges POINTING AT a dropped
    * id sit by definition in affected (or dropped) neighborhoods, so
    * the bucket-local rewrite is exact. Prefer the typed
    * [[applyInsert]]/[[applyRemove]] entry points.
    *
    * The replaced-node set is collected (it is delta-sized — ≤
    * batch·degree + batch for inserts, ≤ removed·(degree+1) for
    * deletes) to drive the literal bucket prune and the swap list;
    * deltas past `maxReplaceIds` should rebuild the store with
    * `write` instead (the caller is resizing the index, not
    * maintaining it).
    */
  def applyDelta(dir: String, delta: DataFrame, affected: DataFrame,
      dropIds: DataFrame, maxReplaceIds: Int = 1000000): Unit = {
    val spark = delta.sparkSession
    val nBuckets = buckets(spark, dir)
    val replaced = delta.select(col("node"))
      .unionByName(affected.select(col("node")))
      .unionByName(dropIds.select(col("vec_id").as("node")))
      .distinct().localCheckpoint(true)
    val nReplaced = replaced.count()
    if (nReplaced == 0L) return
    require(nReplaced <= maxReplaceIds,
      s"applyDelta: $nReplaced replaced nodes exceeds " +
        s"maxReplaceIds=$maxReplaceIds — rebuild the store with " +
        "write() instead of applying an index-sized delta")
    val touched = replaced
      .select(pmod(hash(col("node")), lit(nBuckets)).as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val fsys = fs(spark, new org.apache.hadoop.fs.Path(dir))
    // heal any crashed previous apply FIRST, so the staging read
    // below sees the complete pre-delta store
    heal(spark, dir)
    // current contents of ONLY the touched buckets (static partition
    // prune on the bucket literal), minus every replaced node's rows,
    // plus the delta — the complete new contents of those buckets
    val cur = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched.map(Int.box): _*))
      .drop("bucket")
    val out = cur.join(replaced, Seq("node"), "left_anti")
      .unionByName(delta.select("node", "nbr", "cosine"))
    // write-then-swap: stage the new buckets reading the old files,
    // then swap each touched bucket directory by rename, PARKING the
    // old copy in a SIBLING of the store (never inside it: a
    // bucket=N.old directory under `dir` would enter partition
    // discovery — stale duplicate rows served to every load and the
    // bucket column's type widened to string)
    val stagePath = new org.apache.hadoop.fs.Path(dir + StagingSuffix)
    val parkRoot = new org.apache.hadoop.fs.Path(dir + OldSuffix)
    if (fsys.exists(stagePath)) fsys.delete(stagePath, true)
    withBucket(out, nBuckets)
      .repartition(col("bucket"))
      .sortWithinPartitions("node")
      .write.partitionBy("bucket")
      .mode("overwrite").parquet(stagePath.toString)
    fsys.mkdirs(parkRoot)
    touched.foreach { b =>
      val live = new org.apache.hadoop.fs.Path(dir, s"bucket=$b")
      val fresh = new org.apache.hadoop.fs.Path(
        stagePath.toString, s"bucket=$b")
      val parked = new org.apache.hadoop.fs.Path(
        parkRoot, s"bucket=$b")
      if (fsys.exists(parked)) fsys.delete(parked, true)
      val hadLive = fsys.exists(live)
      if (hadLive) require(fsys.rename(live, parked),
        s"applyDelta: could not park $live")
      // a touched bucket may have NO rows in the new contents (all
      // its nodes dropped) — then there is nothing to rename in and
      // the bucket directory simply ends gone
      if (fsys.exists(fresh)) require(fsys.rename(fresh, live),
        s"applyDelta: could not activate $fresh — previous bucket " +
          s"preserved at $parked")
      if (hadLive) fsys.delete(parked, true)
    }
    fsys.delete(parkRoot, true)
    fsys.delete(stagePath, true)
  }

  /** Restore any buckets a crashed [[applyDelta]] left PARKED in the
    * `<dir>.old` sibling: a crash between the park and the activate
    * leaves the bucket's only copy parked (restored here — renamed
    * back); a crash between the activate and the park-delete leaves
    * a stale parked duplicate beside a complete live bucket (dropped
    * here). Either way the store returns to a consistent state —
    * the pre-crash one in the first case (re-apply the delta to
    * finish, it is idempotent), the post-apply one in the second.
    * Runs automatically at the start of every [[applyDelta]]; safe
    * to call any time (a no-op when nothing is parked). The parked
    * copies live OUTSIDE the store directory, so reads between a
    * crash and the heal see a consistent (if partially-applied)
    * store — never duplicates.
    *
    * CONTRACT (heal-at-load extends single-writer to swap windows):
    * [[load]] heals too, so a load RACING an in-flight swap — the
    * window between a live writer's park and activate renames —
    * would mistake it for a crash, restore the park, and abort the
    * writer's swap. The single-writer contract therefore covers
    * loads during maintenance: pause serving loads across an
    * applyDelta/write/rebuild swap (the maintained deployment's
    * maintenance loop owns the store and serializes exactly this
    * way). A heal racing a CRASHED writer is always safe — that is
    * its job.
    */
  def heal(spark: SparkSession, dir: String): Unit = {
    val parkRoot = new org.apache.hadoop.fs.Path(dir + OldSuffix)
    val fsys = fs(spark, parkRoot)
    // rebuild-swap recovery FIRST: a [[write]] that crashed between
    // its two renames left the live directory missing with the
    // previous store parked at `.rebuild-old` — restore it (the
    // rebuild never committed; re-run it). A parked copy BESIDE a
    // complete live store means the swap finished and only the
    // cleanup crashed — drop the park. The staging sibling is stale
    // either way (the next write() clears it too).
    val rebuildOld = new org.apache.hadoop.fs.Path(dir + RebuildOldSuffix)
    if (fsys.exists(rebuildOld)) {
      val live = new org.apache.hadoop.fs.Path(dir)
      if (!fsys.exists(live))
        require(fsys.rename(rebuildOld, live),
          s"heal: could not restore pre-rebuild store $rebuildOld")
      else fsys.delete(rebuildOld, true)
    }
    if (fsys.exists(parkRoot)) {
      fsys.listStatus(parkRoot).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("bucket=")) {
          val live = new org.apache.hadoop.fs.Path(dir, name)
          if (!fsys.exists(live))
            require(fsys.rename(st.getPath, live),
              s"heal: could not restore parked bucket $name")
          else fsys.delete(st.getPath, true)
        }
      }
      fsys.delete(parkRoot, true)
    }
    // legacy sweep: an earlier revision parked INSIDE the store as
    // `bucket=N.old` — partition discovery would serve those rows as
    // stale duplicates and widen the bucket column to string. Same
    // resolution rule: restore if the live bucket is missing, drop
    // if superseded
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    if (fsys.exists(dirPath)) {
      fsys.listStatus(dirPath).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("bucket=") && name.endsWith(".old")) {
          val live = new org.apache.hadoop.fs.Path(
            dir, name.stripSuffix(".old"))
          if (!fsys.exists(live))
            require(fsys.rename(st.getPath, live),
              s"heal: could not restore legacy parked bucket $name")
          else fsys.delete(st.getPath, true)
        }
      }
    }
  }
}
