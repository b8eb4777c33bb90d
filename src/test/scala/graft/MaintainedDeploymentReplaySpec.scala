package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{EdgeStore, IndexLifecycle, KnnBeam}
import graft.operators.KnnBeam.BandIndex
import graft.streaming.StreamingIndexMaintenance

/** END-TO-END maintained-deployment replay (round-17 verdict item 4):
  * one store lineage driven through the full production sequence —
  * ingest wave → delete batch trips `onCompactNeeded` →
  * [[IndexLifecycle.compactIndex]] → another wave trips
  * `onRebuildNeeded` → [[IndexLifecycle.rebuildStores]] → serve —
  * with the final stores asserted EDGE- and ROW-IDENTICAL to a fresh
  * build over the net corpus. The triggers were pinned in isolation
  * (IndexLifecycleSpec); this drives them in sequence on one lineage,
  * compaction state flowing into the rebuild trigger's arithmetic.
  *
  * The numbers are chosen to walk the trigger thresholds in order
  * (defaults: compact at tombs > 0.2·count, rebuild at churn >
  * 0.3·count; every append/delete advances churn, only deletes
  * advance tombs):
  *   base 100 → +4 (churn 4)            → no trigger
  *   −19      (count 85, churn 23, tombs 19 > 17)   → COMPACT fires
  *             (churn 23 ≤ 25.5 — rebuild correctly quiet)
  *   compact  (tombs/appends 0, churn PRESERVED — an IO fold)
  *   +8       (count 93, churn 31 > 27.9)           → REBUILD fires
  *   rebuild  (churn 0, tombstones folded, fresh geometry)
  */
class MaintainedDeploymentReplaySpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-replay").toString

  private def edgeSet(g: DataFrame): Set[(Long, Long, Double)] =
    g.select("node", "nbr", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def rowSet(idx: BandIndex): Set[(Long, Long, Int, Long)] =
    idx.rows.select("vec_id", "srp", "band", "bv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet

  test("one lineage: wave → compact trigger → compactIndex → wave + " +
      "deletes → rebuild trigger → rebuildStores → serve ≡ fresh " +
      "build over the net corpus; a redelivered wave no-ops") {
    val session = spark
    import session.implicits._
    val root = tmp()
    val indexDir = s"$root/index"
    val edgeDir = s"$root/edges"
    val base = emb.filter(col("vec_id") < 100)
    KnnBeam.buildBandIndex(base).write(indexDir)
    EdgeStore.write(KnnBeam.buildGraph(base).localCheckpoint(true),
      edgeDir, nBuckets = 8)

    var compacts = 0
    var rebuilds = 0
    def ingest(lo: Int, hi: Int): Unit =
      StreamingIndexMaintenance.processBatch(indexDir, edgeDir,
        onRebuildNeeded = _ => rebuilds += 1,
        onCompactNeeded = _ => compacts += 1)(
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi), 0L)
    def erase(ids: Seq[Long]): Unit =
      StreamingIndexMaintenance.processRemoveBatch(indexDir, edgeDir,
        onRebuildNeeded = _ => rebuilds += 1,
        onCompactNeeded = _ => compacts += 1)(ids.toDF("vec_id"), 0L)

    // wave 1: +4 — quiet
    ingest(100, 104)
    assert(compacts == 0 && rebuilds == 0,
      s"wave 1 must trip nothing: $compacts/$rebuilds")

    // delete 19 of the base — the COMPACT trigger's window
    val victims = (0 until 95 by 5).map(_.toLong) // 19 ids
    erase(victims)
    assert(compacts == 1 && rebuilds == 0,
      s"the delete batch must schedule a compact: $compacts/$rebuilds")
    val beforeCompact = BandIndex.load(spark, indexDir)
    assert(beforeCompact.tombs == 19L && beforeCompact.churn == 23L &&
      beforeCompact.count == 85L, "trigger arithmetic drifted: " +
        s"${beforeCompact.count}/${beforeCompact.churn}/" +
        s"${beforeCompact.tombs}")

    // the scheduled compact runs: IO fold — live view unchanged,
    // counters reset, churn preserved (it is NOT a rebuild)
    val liveRows = rowSet(beforeCompact)
    val compacted = IndexLifecycle.compactIndex(spark, indexDir)
    assert(rowSet(compacted) == liveRows, "compact changed the view")
    assert(compacted.appends == 0L && compacted.tombs == 0L &&
      compacted.churn == 23L,
      "compact must reset IO counters and preserve churn")

    // wave 2: +8 — pushes churn past the REBUILD bound
    ingest(104, 112)
    assert(rebuilds == 1 && compacts == 1,
      s"wave 2 must schedule the rebuild: $compacts/$rebuilds")
    val beforeRebuild = BandIndex.load(spark, indexDir)
    assert(beforeRebuild.count == 93L && beforeRebuild.churn == 31L)

    // the scheduled rebuild runs — then the pair serves exactly what
    // a fresh build over the net corpus would
    val rebuilt = IndexLifecycle.rebuildStores(spark, indexDir, edgeDir)
    assert(rebuilt.count == 93L && rebuilt.churn == 0L &&
      rebuilt.appends == 0L && rebuilt.tombs == 0L)
    val net = emb.filter(col("vec_id") < 112 &&
      !col("vec_id").isin(victims.map(Long.box): _*))
    assert(rowSet(rebuilt) == rowSet(KnnBeam.buildBandIndex(net)),
      "maintained band rows diverged from a fresh build")
    assert(edgeSet(EdgeStore.load(spark, edgeDir)) ==
      edgeSet(KnnBeam.buildGraph(net)),
      "maintained edges diverged from a fresh build")

    // at-least-once: wave 2 redelivered after the rebuild is a pure
    // no-op (replay split sees every id present)
    ingest(104, 112)
    val after = BandIndex.load(spark, indexDir)
    assert(after.count == 93L && after.churn == 0L &&
      after.gen == rebuilt.gen, "a replayed wave must no-op")
    assert(rebuilds == 1 && compacts == 1,
      "a replayed wave must not re-trip triggers")
  }
}
