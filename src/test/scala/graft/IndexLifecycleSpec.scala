package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{EdgeStore, IndexLifecycle, KnnBeam}
import graft.operators.KnnBeam.BandIndex

/** The offline reorganization jobs (round-16 verdict items 3/4):
  * `rebuildStores` re-densifies both stores from the index's own
  * live rows and swaps them in bit-identically to a fresh build;
  * a mid-swap crash leaves the old store servable (heal-at-load);
  * `needsCompact` is maintained metadata arithmetic — appends and
  * pending tombstones counted by the store ops, reset by compact —
  * and the streaming loop fires the matching callback.
  */
class IndexLifecycleSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def b1 = emb.filter(col("vec_id") % 10 === 8)

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-lifecycle").toString

  private def edgeSet(g: DataFrame): Set[(Long, Long, Double)] =
    g.select("node", "nbr", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def rowSet(idx: BandIndex): Set[(Long, Long, Int, Long)] =
    idx.rows.select("vec_id", "srp", "band", "bv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet

  /** Overwrite a store's metadata row (the specs' lever for setting
    * counters next to a trigger bound — same columns writeMeta
    * persists).
    */
  private def writeMetaRaw(dir: String, idx: BandIndex): Unit = {
    import spark.implicits._
    Seq((idx.count, idx.bits, idx.nBands, idx.churn, idx.gen,
        idx.appends, idx.tombs))
      .toDF("count", "bits", "nBands", "churn", "gen",
        "appends", "tombs")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_graft_meta")
  }

  /** A churned deployment: base build + one persisted insert + one
    * persisted delete. Returns (indexDir, edgeDir, live-id set).
    */
  private def churnedStores(): (String, String, Set[Long]) = {
    val indexDir = tmp() + "/index"
    val edgeDir = tmp() + "/edges"
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx0 = KnnBeam.buildBandIndex(base)
    idx0.write(indexDir)
    EdgeStore.write(g0, edgeDir, nBuckets = 16)
    val stored = BandIndex.load(spark, indexDir)
    val ins = KnnBeam.insertBatchIndexed(g0, stored, b1)
    EdgeStore.applyInsert(edgeDir, ins)
    val idx1 = BandIndex.append(indexDir, ins)
    val victims = base.select("vec_id").orderBy("vec_id").limit(3)
    val rem = KnnBeam.removeBatch(
      ins.graph.localCheckpoint(true), idx1, victims)
    EdgeStore.applyRemove(edgeDir, rem)
    BandIndex.tombstone(indexDir, rem)
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    val liveIds = (base.select("vec_id").collect().map(_.getLong(0))
      .toSet -- victimIds) ++
      b1.select("vec_id").collect().map(_.getLong(0))
    (indexDir, edgeDir, liveIds)
  }

  test("rebuildStores re-densifies from the stored live rows: edges " +
      "and band rows BIT-IDENTICAL to a fresh build over the same " +
      "raw vectors (the stored vec IS the ingested one), metadata " +
      "reset (churn/appends/tombs 0, geometry re-derived), tombstone " +
      "list folded away, deleted ids gone") {
    val (indexDir, edgeDir, liveIds) = churnedStores()
    val before = BandIndex.load(spark, indexDir)
    assert(before.churn > 0L && before.appends > 0L &&
      before.tombs > 0L, "test premise: the deployment has churned")
    val rebuilt = IndexLifecycle.rebuildStores(
      spark, indexDir, edgeDir)
    // fresh build from the RAW parquet embeddings of the live ids
    val liveRaw = emb.filter(
      col("vec_id").isin(liveIds.toSeq.map(Long.box): _*))
    val freshGraph = KnnBeam.buildGraph(liveRaw)
    val freshIdx = KnnBeam.buildBandIndex(liveRaw)
    assert(rebuilt.count == liveIds.size.toLong)
    assert(rebuilt.churn == 0L && rebuilt.appends == 0L &&
      rebuilt.tombs == 0L && rebuilt.gen == 0L)
    assert(rebuilt.bits == freshIdx.bits &&
      rebuilt.nBands == freshIdx.nBands,
      "rebuild must re-derive geometry at today's count")
    assert(rowSet(rebuilt) == rowSet(freshIdx),
      "rebuilt band rows diverged from a fresh build")
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(freshGraph),
      "rebuilt edges diverged from a fresh build")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      indexDir, "_graft_tombstones")),
      "rebuild must fold the tombstone list away")
    // and the pair still maintains: another insert chains cleanly
    val b2 = emb.filter(col("vec_id") % 10 === 9)
    val ins2 = KnnBeam.insertBatchIndexed(
      EdgeStore.load(spark, edgeDir).localCheckpoint(true),
      rebuilt, b2)
    EdgeStore.applyInsert(edgeDir, ins2)
    val idx2 = BandIndex.append(indexDir, ins2)
    assert(idx2.count == rebuilt.count + b2.count())
  }

  test("a mid-swap crash during the index replace leaves the OLD " +
      "store servable — heal-at-load renames the park back — and " +
      "re-running the rebuild converges; a cleanup crash (park " +
      "beside a complete live store) drops the park") {
    val (indexDir, edgeDir, liveIds) = churnedStores()
    val before = BandIndex.load(spark, indexDir)
    val beforeRows = rowSet(before)
    // simulate the crash between swapIn's two renames: live store
    // parked, the fresh one never renamed in (a stale .compacting
    // sibling remains)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(indexDir),
      java.nio.file.Paths.get(indexDir + ".old"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(indexDir + ".compacting"))
    val healed = BandIndex.load(spark, indexDir)
    assert(rowSet(healed) == beforeRows &&
      healed.count == before.count,
      "load must heal the parked store after a mid-swap crash")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(indexDir + ".old")))
    // the re-run converges to the rebuilt state
    val rebuilt = IndexLifecycle.rebuildStores(
      spark, indexDir, edgeDir)
    assert(rebuilt.count == liveIds.size.toLong &&
      rebuilt.churn == 0L)
    // cleanup crash: a stale park beside the complete live store
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(indexDir + ".old"))
    val after = BandIndex.load(spark, indexDir)
    assert(rowSet(after) == rowSet(rebuilt),
      "a superseded park must not displace the live store")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(indexDir + ".old")))
  }

  test("rebuildStores converges from a crashed EDGE-store swap — " +
      "the live edge dir missing, parked at .rebuild-old — instead " +
      "of failing its metadata read (heal runs before buckets)") {
    val (indexDir, edgeDir, liveIds) = churnedStores()
    // simulate a previous rebuild crashing between EdgeStore.write's
    // two renames: live gone, previous store parked
    java.nio.file.Files.move(
      java.nio.file.Paths.get(edgeDir),
      java.nio.file.Paths.get(edgeDir + ".rebuild-old"))
    val rebuilt = IndexLifecycle.rebuildStores(spark, indexDir, edgeDir)
    assert(rebuilt.count == liveIds.size.toLong && rebuilt.churn == 0L)
    assert(EdgeStore.buckets(spark, edgeDir) == 16,
      "the healed store's bucket count must carry through the rebuild")
    val liveRaw = emb.filter(
      col("vec_id").isin(liveIds.toSeq.map(Long.box): _*))
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(KnnBeam.buildGraph(liveRaw)),
      "post-crash rebuild diverged from a fresh build")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(edgeDir + ".rebuild-old")))
  }

  test("rebuildStores lawfully CREATES the edge half when only the " +
      "index was ever persisted (default bucket count, no metadata " +
      "read to throw on)") {
    val indexDir = tmp() + "/index"
    val edgeDir = tmp() + "/edges"
    KnnBeam.buildBandIndex(base).write(indexDir)
    val rebuilt = IndexLifecycle.rebuildStores(spark, indexDir, edgeDir)
    assert(rebuilt.count == base.count())
    assert(EdgeStore.buckets(spark, edgeDir) == 256,
      "a created edge store takes the EdgeStore default")
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(KnnBeam.buildGraph(base)),
      "created edge store diverged from a fresh build")
  }

  test("needsCompact is maintained metadata arithmetic: appends " +
      "count store appends, tombs count persisted deletes, compact " +
      "resets both, and the thresholds fire exactly past their " +
      "bounds") {
    val (indexDir, _, _) = churnedStores()
    val idx = BandIndex.load(spark, indexDir)
    assert(idx.appends == 1L,
      s"one append must count once: ${idx.appends}")
    assert(idx.tombs == 3L,
      s"a three-id delete must count three: ${idx.tombs}")
    // threshold arithmetic — pure copies, no IO
    assert(!idx.needsCompact(),
      "1 append + small tombs must stay quiet")
    assert(idx.copy(appends = 17L).needsCompact(),
      "appends past the bound must fire")
    assert(!idx.copy(appends = 16L).needsCompact())
    assert(idx.copy(
      tombs = (idx.count * 0.25).toLong).needsCompact(),
      "tombstones past the live fraction must fire")
    // compact folds and resets
    val compacted = BandIndex.compact(spark, indexDir)
    assert(compacted.appends == 0L && compacted.tombs == 0L,
      "compact must reset the read-amplification counters")
    assert(compacted.count == idx.count &&
      compacted.churn == idx.churn,
      "compact is an IO fold — count and churn are untouched")
  }

  test("metadata written before the compaction counters existed " +
      "loads with appends/tombs = 0 (backward compatible) and the " +
      "next maintenance op starts counting") {
    val indexDir = tmp() + "/index"
    val idx0 = KnnBeam.buildBandIndex(base)
    idx0.write(indexDir)
    // overwrite the meta with the OLD five-column schema
    import spark.implicits._
    Seq((idx0.count, idx0.bits, idx0.nBands, 0L, 0L))
      .toDF("count", "bits", "nBands", "churn", "gen")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/_graft_meta")
    val loaded = BandIndex.load(spark, indexDir)
    assert(loaded.appends == 0L && loaded.tombs == 0L &&
      loaded.count == idx0.count,
      "an old-schema store must load with zeroed counters")
    assert(!loaded.needsCompact())
  }

  test("the streaming loop fires onCompactNeeded past the appends " +
      "bound and onRebuildNeeded subsumes it when both trip") {
    val indexDir = tmp() + "/index"
    val edgeDir = tmp() + "/edges"
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx0 = KnnBeam.buildBandIndex(base)
    idx0.write(indexDir)
    EdgeStore.write(g0, edgeDir, nBuckets = 16)
    // push the stored appends counter to the threshold so THIS
    // batch's append tips it over (churn stays low: no rebuild)
    val stored = BandIndex.load(spark, indexDir)
    writeMetaRaw(indexDir, stored.copy(appends = 16L))
    var compacts = 0
    var rebuilds = 0
    graft.streaming.StreamingIndexMaintenance.processBatch(
      indexDir, edgeDir,
      onRebuildNeeded = _ => rebuilds += 1,
      onCompactNeeded = _ => compacts += 1)(b1, 0L)
    assert(compacts == 1 && rebuilds == 0,
      s"17th append must schedule a compact: $compacts/$rebuilds")
    // now force churn past the rebuild bound too — rebuild wins,
    // compact is subsumed
    val cur = BandIndex.load(spark, indexDir)
    writeMetaRaw(indexDir, cur.copy(churn = cur.count, appends = 17L))
    val b2 = emb.filter(col("vec_id") % 10 === 9)
    graft.streaming.StreamingIndexMaintenance.processBatch(
      indexDir, edgeDir,
      onRebuildNeeded = _ => rebuilds += 1,
      onCompactNeeded = _ => compacts += 1)(b2, 1L)
    assert(rebuilds == 1 && compacts == 1,
      s"rebuild must subsume the compact: $compacts/$rebuilds")
  }
}
