package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PERSISTED, MAINTAINED form of the IVF-PQ deployment — what
  * s12_ivfpq builds from scratch inside every query, promoted to a
  * store with the same lifecycle the graph-ANN pair
  * ([[KnnBeam.BandIndex]] + [[EdgeStore]]) already has: build once,
  * serve many, append/delete between rebuilds, triggers as metadata
  * arithmetic, crash safety via the proven marker/gen-bar/swap
  * protocols.
  *
  * Reference basis: the reference recomputes per cycle
  * (`/root/reference/src/plugins/scripts/active_flights/script.py`
  * reloads all state each run) and has no vector search at all; this
  * is the 100 TB extension SURVEY §8 names as the deployed
  * architecture — IVF cells prune WHICH vectors a query scans, PQ
  * codes shrink WHAT is scanned per vector, and at 100 TB neither
  * half can be retrained per query.
  *
  * Layout under `dir` (mirrors BandIndex's store discipline):
  *   - data rows partitioned by `cell` (the IVF cell), one
  *     vec_id-sorted file per cell directory per write/append:
  *     (vec_id, codes array<int>, vec array<float>, gen). Parquet
  *     COLUMN pruning is what keeps the ADC scan byte-light: the
  *     search pass reads (vec_id, codes) only — the raw `vec` column's
  *     pages are never touched — while the rerank fetch and the
  *     self-contained rebuild read (vec_id, vec). One table, two
  *     access paths, no second copy of the corpus.
  *   - `_graft_model`: the trained IVF centroids (`/ivf`: cell,
  *     centroid) and PQ codebooks (`/pq`: sub, cell, centroid) as
  *     parquet — models are part of the store because SERVING must
  *     not depend on anything but the store (and they only change at
  *     rebuild, when the whole root swaps).
  *   - `_graft_meta`: one row — count, k, m, pqK, churn, gen,
  *     appends, tombs, cellCounts array<long> (physical rows per
  *     cell, the skew trigger's input).
  *   - `_graft_tombstones`: (vec_id, gen) — the generation-barred
  *     delete list, LSM-style, exactly [[KnnBeam.BandIndex]]'s.
  *   - `_graft_pending`: the append intent marker.
  *
  * Crash protocol = BandIndex's, verbatim in structure:
  * append is marker → rows(gen+1) → meta(commit) → marker-clear,
  * with [[load]] serving only rows at-or-below the committed gen;
  * delete is list-then-meta (same documented odometer-drift window,
  * same [[recount]] repair); compact/rebuild are write-then-swap with
  * [[heal]]-at-load restore (and the same single-writer contract:
  * loads are excluded during a maintenance swap). `IvfPqStoreSpec`
  * drives randomized crash schedules against an uninterrupted run,
  * the `StoreCrashParitySpec` pattern.
  *
  * Why an id's cell is stable within a store lineage (what makes the
  * bounded [[presentIds]] probe and per-cell delta appends exact):
  * cells are assigned by THE STORED centroids, and the centroids only
  * change at [[rebuild]] — which rewrites every row under the new
  * model in one swap. Between rebuilds, assign(batch) under the
  * stored model IS the cell every live copy of the id sits in.
  */
object IvfPqStore {

  private val MetaDir = "_graft_meta"
  private val ModelDir = "_graft_model"
  private val TombDir = "_graft_tombstones"
  private val PendingDir = "_graft_pending"

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    StoreFiles.fs(spark, p)

  /** A loaded store: live rows (gen-barred, tombstones applied) plus
    * the models and maintained metadata. `cellCounts(c)` counts the
    * PHYSICAL rows of cell c — appended deltas included, tombstoned
    * rows still counted until [[compact]] folds them — because
    * physical rows are what the ADC scan of a probed cell actually
    * reads, and the skew trigger budgets scan cost.
    */
  case class Store(rows: DataFrame, ivf: IvfIndex.Model,
      pq: PqIndex.Model, count: Long, churn: Long = 0L, gen: Long = 0L,
      appends: Long = 0L, tombs: Long = 0L,
      cellCounts: Array[Long] = Array.empty) {

    def k: Int = ivf.k

    def withRows(r: DataFrame): Store = copy(rows = r)

    /** True once the maintained metadata says incremental upkeep has
      * drifted the index past health — pure arithmetic, like
      * [[KnnBeam.BandIndex.needsRebuild]]:
      *
      *   - CELL SKEW: appends assign against centroids trained on an
      *     ever-staler corpus, so hot cells grow unboundedly — a
      *     probed hot cell costs max(cellCounts) per query where the
      *     design budget was count/k. Past `maxSkew`× the mean, the
      *     nprobe cost model the index was built on no longer holds.
      *     (max/mean ≤ k by construction, so `maxSkew` must sit
      *     below k to be reachable — at the default k=8, 4.0 fires
      *     when one cell holds half the physical rows);
      *   - CHURN: appends (assigned, never retrained) plus deletes
      *     (tombstoned, never rebalanced) past `maxChurn` of the live
      *     count — the same odometer [[KnnBeam.BandIndex]] uses.
      */
    def needsRebuild(maxSkew: Double = 4.0,
        maxChurn: Double = 0.3): Boolean = {
      val skewed = cellCounts.nonEmpty && count > 0L && {
        val mean = cellCounts.sum.toDouble / cellCounts.length
        mean > 0.0 && cellCounts.max > maxSkew * mean
      }
      skewed || churn > maxChurn * count
    }

    /** The IO analog ([[KnnBeam.BandIndex.needsCompact]]'s twin):
      * each append lands one extra file per touched cell directory,
      * each tombstoned id leaves a dead row every probe still scans.
      */
    def needsCompact(maxAppends: Long = 16L,
        maxTombFrac: Double = 0.2): Boolean =
      appends > maxAppends || tombs > maxTombFrac * count
  }

  // ---- metadata -----------------------------------------------------

  private def writeMeta(spark: SparkSession, dir: String,
      st: Store): Unit = {
    import spark.implicits._
    Seq((st.count, st.ivf.k, st.pq.m, st.pq.k, st.churn, st.gen,
        st.appends, st.tombs, st.cellCounts.toSeq))
      .toDF("count", "k", "m", "pqK", "churn", "gen", "appends",
        "tombs", "cellCounts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$MetaDir")
  }

  private def readMeta(spark: SparkSession, dir: String):
      (Long, Long, Long, Long, Long, Array[Long]) = {
    val m = spark.read.parquet(s"$dir/$MetaDir").collect().head
    (m.getAs[Long]("count"), m.getAs[Long]("churn"),
      m.getAs[Long]("gen"), m.getAs[Long]("appends"),
      m.getAs[Long]("tombs"),
      m.getAs[Seq[Long]]("cellCounts").toArray)
  }

  private def writeModels(spark: SparkSession, dir: String,
      ivf: IvfIndex.Model, pq: PqIndex.Model): Unit = {
    import spark.implicits._
    ivf.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$ModelDir/ivf")
    (for {
      (book, s) <- pq.codebooks.zipWithIndex
      (c, i) <- book.zipWithIndex
    } yield (s, i, c.toSeq)).toSeq
      .toDF("sub", "cell", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$ModelDir/pq")
  }

  private def readModels(spark: SparkSession, dir: String):
      (IvfIndex.Model, PqIndex.Model) = {
    val ivf = IvfIndex.Model(
      spark.read.parquet(s"$dir/$ModelDir/ivf")
        .orderBy("cell").collect()
        .map(_.getSeq[Double](1).toArray))
    val pqRows = spark.read.parquet(s"$dir/$ModelDir/pq")
      .orderBy("sub", "cell").collect()
    val books = pqRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }.toArray
    (ivf, PqIndex.Model(books))
  }

  // ---- write / load / heal -----------------------------------------

  private def writeRows(rows: DataFrame, dir: String, gen: Long,
      mode: String): Unit =
    rows.withColumn("gen", lit(gen))
      .repartition(col("cell"))
      .sortWithinPartitions("vec_id")
      .write.partitionBy("cell")
      .mode(mode).parquet(dir)

  /** Per-cell physical row counts as a dense length-k array (cells
    * with no rows count 0). Delta-sized input: `assigned` is a batch
    * (or, at build/compact, the store itself — one count aggregate,
    * k result rows).
    */
  private def countCells(assigned: DataFrame, k: Int): Array[Long] = {
    val out = Array.fill(k)(0L)
    assigned.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Fresh build: train both models on the corpus (bounded id-ordered
    * samples — training cost independent of corpus size), assign +
    * encode in ONE corpus pass (both are codegen'd narrow maps), and
    * persist rows + models + metadata. Zero-norm vectors are excluded
    * (they have no direction — no cell, no codes; the brute-force
    * exact baseline excludes them from cosine ranking the same way).
    *
    * `idCol`/`vecCol` name the corpus columns; stored rows normalize
    * to (vec_id, codes, vec).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, k: Int = 8, ivfIters: Int = 3, m: Int = 8,
      pqK: Int = 16, pqIters: Int = 3,
      sampleLimit: Int = 20000): Store = {
    val spark = corpus.sparkSession
    val ivf = IvfIndex.train(corpus, idCol, vecCol, k = k,
      iters = ivfIters, sampleLimit = sampleLimit)
    val pq = PqIndex.train(corpus, idCol, vecCol, m = m, k = pqK,
      iters = pqIters, sampleLimit = sampleLimit)
    val rows = encodeBatch(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec")),
      ivf, pq)
    // the fresh-create path mirrors EdgeStore.write: heal a crashed
    // previous swap first, then write in place if absent, else swap
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fsys = fs(spark, dirPath)
    heal(spark, dir)
    if (fsys.exists(dirPath))
      return replaceWith(spark, dir, rows, ivf, pq)
    val n = rows.count()
    writeRows(rows, dir, gen = 0L, mode = "overwrite")
    writeModels(spark, dir, ivf, pq)
    writeMeta(spark, dir, Store(rows, ivf, pq, count = n,
      cellCounts = countCells(rows, k)))
    load(spark, dir)
  }

  /** One assign+encode pass with GIVEN models → (vec_id, codes, vec,
    * cell) rows, zero-norm rows dropped. The maintained-append path
    * and the build path share it, so a store row means one thing.
    */
  private def encodeBatch(batch: DataFrame, ivf: IvfIndex.Model,
      pq: PqIndex.Model): DataFrame =
    PqIndex.encode(IvfIndex.assign(batch, "vec", ivf), "vec", pq)
      .filter(col("codes").isNotNull)
      .select("vec_id", "codes", "vec", "cell")

  /** Rehydrate: heal a crashed swap, read metadata + models, serve
    * rows at-or-below the committed gen with the generation-barred
    * tombstone join — the exact [[KnnBeam.BandIndex.load]] discipline
    * (see there for why the bar is (vec_id, gen), not a plain
    * anti-join). Same heal-at-load contract: loads are excluded
    * during a live maintenance swap.
    */
  def load(spark: SparkSession, dir: String): Store = {
    heal(spark, dir)
    val (count, churn, gen, appends, tombs, cellCounts) =
      readMeta(spark, dir)
    val (ivf, pq) = readModels(spark, dir)
    val rows0 = spark.read.parquet(dir).filter(col("gen") <= gen)
    val tombPath = new org.apache.hadoop.fs.Path(dir, TombDir)
    val rows =
      if (fs(spark, tombPath).exists(tombPath)) {
        val bar = spark.read.parquet(tombPath.toString)
          .groupBy("vec_id").agg(max("gen").as("__tgen"))
        rows0.join(bar, Seq("vec_id"), "left")
          .filter(col("__tgen").isNull || col("gen") > col("__tgen"))
          .drop("__tgen", "gen")
      } else rows0.drop("gen")
    Store(rows, ivf, pq, count, churn, gen, appends, tombs, cellCounts)
  }

  /** Restore a crashed [[compact]]/[[rebuild]] swap — live dir
    * missing, previous store parked at `<dir>.old` — or drop a
    * superseded park. One existence probe when nothing is parked.
    */
  def heal(spark: SparkSession, dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    val fsys = fs(spark, old)
    if (fsys.exists(old)) {
      if (!fsys.exists(live))
        require(fsys.rename(old, live),
          s"heal: could not restore pre-swap store $old")
      else fsys.delete(old, true)
    }
  }

  // ---- maintenance --------------------------------------------------

  /** Which of `batch`'s ids are LIVE in the store — the replay guard
    * and the delete existence probe. Bounded work: the batch assigns
    * to ≤min(batch, k) cells under the stored model (cell stability —
    * see the object doc), so the probe scans only those cell
    * directories, vec_id column alone, row-groups pruned by the
    * within-cell sort.
    */
  def presentIds(st: Store, batch: DataFrame): DataFrame = {
    val assigned = IvfIndex.assign(
      batch.select(col("vec_id"), col("vec")), "vec", st.ivf)
      .select("vec_id", "cell").localCheckpoint(true)
    val cells = assigned.select("cell").distinct()
      .collect().map(r => Int.box(r.getInt(0)))
    if (cells.isEmpty) return assigned.select("vec_id").limit(0)
    st.rows.filter(col("cell").isin(cells.toIndexedSeq: _*))
      .select("vec_id")
      .join(assigned.select("vec_id"), Seq("vec_id"), "left_semi")
  }

  /** Append a batch (vec_id, vec) under the STORED models — no
    * retrain; the drift that causes is exactly what [[Store
    * .needsRebuild]] watches. Marker → rows(gen+1) → meta → clear,
    * with the redelivery probe scoped to the crashed marker's own
    * generation ([[KnnBeam.BandIndex.append]]'s protocol — see there
    * for why the probe is gen-scoped and tombstone-bar-free). The
    * caller anti-joins [[presentIds]] first on the no-crash path
    * (replay guard); this probe only runs behind a recovered marker.
    *
    * DIRECT-CALL HAZARD (round-18 ADVICE): behind a recovered marker
    * the committed-probe compares on vec_id ONLY. A directly
    * delivered batch that PARTIALLY overlaps previously committed
    * ids trips the all-or-nothing `require` below, and a batch with
    * identical ids but CHANGED vectors is treated as committed (a
    * no-op — the store never compares payloads). Both are impossible
    * under the shipped streaming loop (recover + presentIds split
    * run first); a direct API caller must do the same split, or
    * remove-then-append to change a vector.
    */
  def append(dir: String, batch: DataFrame): Store = {
    val spark = batch.sparkSession
    val pendingGen = recoverPending(spark, dir)
    val cur = load(spark, dir)
    val delta = encodeBatch(
      batch.select(col("vec_id"), col("vec")), cur.ivf, cur.pq)
      .localCheckpoint(true)
    val batchN = delta.count()
    if (batchN == 0L) return cur
    val committed: Store =
      if (pendingGen.isDefined) {
        val probeGen = pendingGen.filter(_ >= 0L).getOrElse(cur.gen)
        val cells = delta.select("cell").distinct()
          .collect().map(r => Int.box(r.getInt(0)))
        val probe = spark.read.parquet(dir)
          .filter(col("gen") === probeGen &&
            col("cell").isin(cells.toIndexedSeq: _*))
          .select("vec_id")
        val present = delta.select("vec_id")
          .join(probe, Seq("vec_id"), "left_semi").count()
        if (present == batchN) return cur // committed — no-op
        require(present == 0L,
          s"append: $present of $batchN batch ids already committed " +
            "— a partially applied batch cannot happen under the " +
            "marker protocol; compact the store (or the batch is wrong)")
        bump(cur, delta, batchN)
      } else bump(cur, delta, batchN)
    writePending(spark, dir, committed.gen)
    writeRows(delta, dir, gen = committed.gen, mode = "append")
    writeMeta(spark, dir, committed) // the commit point
    clearPending(spark, dir)
    load(spark, dir)
  }

  private def bump(cur: Store, delta: DataFrame, batchN: Long): Store =
    cur.copy(count = cur.count + batchN, churn = cur.churn + batchN,
      gen = cur.gen + 1L, appends = cur.appends + 1L,
      cellCounts = cur.cellCounts.zip(countCells(delta, cur.k))
        .map { case (a, b) => a + b })

  /** Tombstone `ids` (one vec_id column) at the CURRENT generation —
    * list-then-meta, [[KnnBeam.BandIndex.tombstone]]'s order and its
    * documented odometer-drift window (a crash between the two writes
    * leaves the view correct, count high, churn/tombs low; [[recount]]
    * repairs the count). Ids not live simply mask nothing. Physical
    * rows — and cellCounts, which track physical scan cost — are
    * untouched until [[compact]].
    */
  def remove(dir: String, ids: DataFrame): Store = {
    val spark = ids.sparkSession
    val cur = load(spark, dir)
    val victims = ids.select("vec_id")
      .join(cur.rows.select("vec_id"), Seq("vec_id"), "left_semi")
      .localCheckpoint(true)
    val n = victims.count()
    if (n == 0L) return cur
    victims.select(col("vec_id"), lit(cur.gen).as("gen"))
      .write.mode("append").parquet(s"$dir/$TombDir")
    writeMeta(spark, dir, cur.copy(count = cur.count - n,
      churn = cur.churn + n, tombs = cur.tombs + n))
    load(spark, dir)
  }

  /** Repair the metadata count from the store itself (the crashed-
    * tombstone window's documented fix): one column-pruned scan of
    * the live vec_ids. Churn stays as recorded — an odometer.
    */
  def recount(spark: SparkSession, dir: String): Store = {
    recoverPending(spark, dir)
    val st = load(spark, dir)
    val live = st.rows.select("vec_id").distinct().count()
    if (live != st.count)
      writeMeta(spark, dir, st.copy(count = live))
    load(spark, dir)
  }

  private def pendingPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, PendingDir)

  private def writePending(spark: SparkSession, dir: String,
      gen: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(pendingPath(dir), s"gen-$gen")
    fs(spark, p).create(p, true).close()
  }

  private def clearPending(spark: SparkSession, dir: String): Unit =
    fs(spark, pendingPath(dir)).delete(pendingPath(dir), true)

  /** Roll a crashed append forward (rows of the pending gen landed —
    * commit by arithmetic) or discard its marker (no rows — nothing
    * happened). [[KnnBeam.BandIndex]]'s recoverPending, one row per
    * id instead of nBands.
    */
  private def recoverPending(spark: SparkSession,
      dir: String): Option[Long] = {
    val pend = pendingPath(dir)
    val fsys = fs(spark, pend)
    if (!fsys.exists(pend)) return None
    val gens = fsys.listStatus(pend).map(_.getPath.getName)
      .collect { case n if n.startsWith("gen-") =>
        n.stripPrefix("gen-").toLong }
    if (gens.isEmpty) { fsys.delete(pend, true); return Some(-1L) }
    val pGen = gens.max
    val (count, churn, gen, appends, tombs, cellCounts) =
      readMeta(spark, dir)
    if (pGen > gen) {
      val orphans = spark.read.parquet(dir)
        .filter(col("gen") === pGen)
        .select("vec_id", "cell").localCheckpoint(true)
      val n = orphans.count()
      if (n > 0L) {
        val (ivf, pq) = readModels(spark, dir)
        val rolled = Store(orphans, ivf, pq, count = count + n,
          churn = churn + n, gen = pGen, appends = appends + 1L,
          tombs = tombs,
          cellCounts = cellCounts.zip(countCells(orphans, ivf.k))
            .map { case (a, b) => a + b })
        writeMeta(spark, dir, rolled)
      }
    }
    fsys.delete(pend, true)
    Some(pGen)
  }

  /** Recover a crashed append, then rehydrate. */
  def recover(spark: SparkSession, dir: String): Store = {
    recoverPending(spark, dir)
    load(spark, dir)
  }

  /** Fold the store back to canonical: live rows rewritten as one
    * vec_id-sorted file per cell, tombstones applied and cleared,
    * read-amplification counters reset, cellCounts recounted from the
    * now-physical == live rows. Write-then-swap via the shared
    * [[heal]] discipline; an IO reorganization — count/churn/gen and
    * the MODELS are untouched (compaction never retrains).
    */
  def compact(spark: SparkSession, dir: String): Store = {
    val st = load(spark, dir)
    val live = st.rows.localCheckpoint(true)
    replaceWith(spark, dir, live, st.ivf, st.pq,
      carry = Some(st.copy(appends = 0L, tombs = 0L,
        cellCounts = countCells(live, st.k))))
  }

  /** The re-densify job [[Store.needsRebuild]] schedules: RETRAIN
    * both models on the store's own live vectors (the stored vec IS
    * the ingested one — self-contained, like
    * [[IndexLifecycle.rebuildStores]]), re-assign + re-encode every
    * live row under the fresh models, swap. Churn and the counters
    * reset; tombstones fold away with the replaced store.
    */
  def rebuild(spark: SparkSession, dir: String, k: Int = 8,
      ivfIters: Int = 3, m: Int = 8, pqK: Int = 16, pqIters: Int = 3,
      sampleLimit: Int = 20000): Store = {
    val st = recover(spark, dir)
    // checkpoint: the trains and the swap write below all read these
    // rows, and the swap deletes the files they came from
    val live = st.rows.select("vec_id", "vec").localCheckpoint(true)
    val ivf = IvfIndex.train(live, "vec_id", "vec", k = k,
      iters = ivfIters, sampleLimit = sampleLimit)
    val pq = PqIndex.train(live, "vec_id", "vec", m = m, k = pqK,
      iters = pqIters, sampleLimit = sampleLimit)
    replaceWith(spark, dir, encodeBatch(live, ivf, pq), ivf, pq)
  }

  /** Write-then-swap a complete replacement store (rows already
    * carrying `cell`): new root written COMPLETE to a `.rebuilding`
    * sibling, old root renamed aside, new renamed in, old deleted —
    * a crash anywhere leaves the old store live or parked for
    * [[heal]].
    */
  private def replaceWith(spark: SparkSession, dir: String,
      rows: DataFrame, ivf: IvfIndex.Model, pq: PqIndex.Model,
      carry: Option[Store] = None): Store = {
    val cur = new org.apache.hadoop.fs.Path(dir)
    val fresh = new org.apache.hadoop.fs.Path(dir + ".rebuilding")
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    val fsys = fs(spark, cur)
    if (fsys.exists(fresh)) fsys.delete(fresh, true)
    if (fsys.exists(old)) fsys.delete(old, true)
    val st = carry.getOrElse {
      val n = rows.count()
      Store(rows, ivf, pq, count = n,
        cellCounts = countCells(rows, ivf.k))
    }
    writeRows(rows, fresh.toString, gen = st.gen, mode = "overwrite")
    writeModels(spark, fresh.toString, ivf, pq)
    writeMeta(spark, fresh.toString, st)
    require(fsys.rename(cur, old),
      s"replaceWith: could not rename $cur aside")
    require(fsys.rename(fresh, cur),
      s"replaceWith: could not activate $fresh — previous store " +
        s"preserved at $old (heal restores it)")
    fsys.delete(old, true)
    load(spark, dir)
  }

  // ---- serving ------------------------------------------------------

  /** Sentinel for `nprobe`/`shortlist`: derive the serving budget
    * from the store's own count (the [[KnnBeam.AutoDegree]] pattern
    * on this store's serve side). Measured round 18 (IvfPqCalib on
    * the dim-permuted decades): the FIXED bundled config (nprobe 2,
    * shortlist 50) decays 20 → 11 → 9 of 50 across n = 2k/20k/200k —
    * the 8-byte PQ codes rank a bigger corpus too coarsely for the
    * true top-k to surface in a 50-deep ADC cut — while shortlist
    * ~n/50 restores 23/50 at 10× (shortlist is the dominant lever:
    * +8 of the +12 at 10×) and nprobe 3 adds the cell-misassignment
    * margin (+4); at 100× the same rules measure 22/50. Both rules
    * DEGENERATE to the calibrated (2, 50) at every bundled corpus
    * (n ≤ 2000), so shipped oracle hashes are untouched. The 4096
    * shortlist cap is the measurement boundary (200k), not an
    * asymptote — recalibrate past it rather than extrapolate (real
    * deployments scale k with n; this store keeps k fixed between
    * rebuilds).
    */
  val AutoNprobe = 0
  val AutoShortlist = 0

  private[graft] def autoNprobe(count: Long): Int =
    if (count <= 8000L) 2 else 3

  private[graft] def autoShortlist(count: Long): Int =
    math.max(50L, math.min(4096L, count / 50L)).toInt

  /** IVF-PQ search off the loaded store: probe `nprobe` cells per
    * query (the equi-join prune — the scan touches ~nprobe/k of the
    * codes), fused-ADC shortlist of `shortlist` per query, exact
    * cosine rerank of the shortlist against the store's own raw
    * vectors (fetched with the probed-cells partition prune — the
    * `vec` column is read for those cells' matching rows only, never
    * scanned corpus-wide).
    *
    * @param queries (q_id, qv) — small by construction (broadcast)
    * @return (q_id, n_id, rank, sim) — `k` rows per query, cosine
    *         descending, n_id tie-break
    */
  def search(st: Store, queries: DataFrame, nprobe: Int = AutoNprobe,
      shortlist: Int = AutoShortlist, k: Int = 5): DataFrame = {
    val np = if (nprobe == AutoNprobe)
      math.min(autoNprobe(st.count), st.k) else nprobe
    val sl = if (shortlist == AutoShortlist) autoShortlist(st.count)
      else shortlist
    val probed = IvfIndex.probe(
      queries.select(col("q_id"), col("qv"),
        PqIndex.normalizedVec(col("qv")).as("qn")),
      "qv", st.ivf, nprobe = np)
    // ONE probe-assignment job (round-18 ADVICE): the probe table is
    // query-sized and was already crossing the driver for the
    // broadcast build — collect it once and serve BOTH the probed-
    // cell literals (the rerank fetch's static partition prune) and
    // the ADC join's broadcast side from the same local rows, instead
    // of computing the assignment job twice per search.
    val probedDf = probed.select("q_id", "qn", "probe_cell")
    val probedLocal = probedDf.collect()
    val cells = probedLocal.map(_.getInt(2)).distinct.sorted
      .map(Int.box(_))
    val probeLocal = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(probedLocal: _*), probedDf.schema)
    val wAdc = Window.partitionBy("q_id")
      .orderBy(col("adc"), col("n_id"))
    val short = broadcast(probeLocal)
      .join(st.rows.select(col("vec_id").as("n_id"), col("codes"),
          col("cell")),
        col("probe_cell") === col("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", graft.functions.VectorExprs.pq_adc_distance(
        col("qn"), col("codes"), st.pq.codebooks))
      .filter(col("adc").isNotNull)
      .withColumn("rk", row_number().over(wAdc).cast("long"))
      .filter(col("rk") <= sl)
      .select("q_id", "n_id")
    val fetch = st.rows
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
      .select(col("vec_id").as("n_id"), col("vec").as("nv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))
    short.join(fetch, Seq("n_id"))
      .join(broadcast(queries.select(col("q_id"), col("qv"))),
        Seq("q_id"))
      .withColumn("sim", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
  }
}
