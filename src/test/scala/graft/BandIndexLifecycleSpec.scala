package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.KnnBeam
import graft.operators.KnnBeam.BandIndex

/** The persisted BandIndex lifecycle (round-15 verdict items 3/5):
  * write → load round-trips rows + metadata with FLAT lineage,
  * `append` applies an insert's delta without rewriting the store,
  * `tombstone`/`removeBatch` delete without rewriting data files, the
  * replay guard rejects overlapping batches, and the churn trigger is
  * pure metadata arithmetic. Chained store-mediated inserts must
  * match the in-memory chain edge-for-edge.
  */
class BandIndexLifecycleSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def b1 = emb.filter(col("vec_id") % 10 === 8)
  private def b2 = emb.filter(col("vec_id") % 10 === 9)

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-bandindex-life").toString

  private def edgeSet(g: DataFrame): Set[(Long, Long)] =
    g.select("node", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def hasUnion(df: DataFrame): Boolean =
    org.apache.spark.sql.graft.bridge.analyzed(df).collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.nonEmpty

  test("write → load round-trips rows, metadata, and geometry, and " +
      "the loaded rows have FLAT lineage (no Union node — the chained " +
      "unionByName DAG is gone after a store cycle)") {
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val loaded = BandIndex.load(spark, dir)
    assert(loaded.count == idx.count && loaded.bits == idx.bits &&
      loaded.nBands == idx.nBands && loaded.churn == 0L)
    assert(loaded.rows.count() == idx.rows.count())
    assert(loaded.rows.select("vec_id", "srp", "band", "bv")
      .exceptAll(idx.rows.select("vec_id", "srp", "band", "bv"))
      .count() == 0L, "a stored band row diverged from the built one")
    assert(!hasUnion(loaded.rows), "loaded rows must be a plain scan")
  }

  test("append applies an insert's delta: the reloaded index chains " +
      "a second insert whose edges match the purely in-memory chain, " +
      "count/churn advance by arithmetic, and lineage stays flat") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    // in-memory chain
    val mem1 = KnnBeam.insertBatchIndexed(g0, idx, b1)
    val mem2 = KnnBeam.insertBatchIndexed(
      mem1.graph.localCheckpoint(true), mem1.index, b2)
    // store-mediated chain
    val st1 = KnnBeam.insertBatchIndexed(g0, stored, b1)
    val idx1 = BandIndex.append(dir, st1)
    assert(idx1.count == mem1.index.count &&
      idx1.churn == mem1.index.churn)
    assert(!hasUnion(idx1.rows), "appended store must reload flat")
    val st2 = KnnBeam.insertBatchIndexed(
      st1.graph.localCheckpoint(true), idx1, b2)
    assert(edgeSet(st2.graph) == edgeSet(mem2.graph),
      "store-mediated chain diverged from the in-memory chain")
    val idx2 = BandIndex.append(dir, st2)
    assert(idx2.count == mem2.index.count)
    assert(idx2.rows.count() == mem2.index.rows.count())
  }

  test("an EMPTY batch append is a pure no-op: gen, appends, and the " +
      "file layout are untouched (an empty delta writes no file, so " +
      "charging the compaction trigger for it would mis-schedule)") {
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val ins = KnnBeam.insertBatchIndexed(g0, stored, b1.limit(0))
    val after = BandIndex.append(dir, ins)
    assert(after.gen == stored.gen && after.appends == stored.appends &&
      after.count == stored.count && after.churn == stored.churn,
      "an empty append advanced the store's counters")
    val reloaded = BandIndex.load(spark, dir)
    assert(reloaded.gen == stored.gen &&
      reloaded.appends == stored.appends,
      "an empty append touched the persisted metadata")
  }

  test("replay guard: re-inserting an overlapping batch fails with " +
      "the named disjointness error instead of silently duplicating " +
      "band rows and double-counting the metadata") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val ins = KnnBeam.insertBatchIndexed(g0, idx, b1)
    val e = intercept[IllegalArgumentException] {
      KnnBeam.insertBatchIndexed(
        ins.graph.localCheckpoint(true), ins.index, b1)
    }
    assert(e.getMessage.contains("already present"),
      s"wrong error: ${e.getMessage}")
  }

  test("removeBatch: deleted ids never surface as node or nbr, " +
      "survivors keep their stored cosines untouched (pure filter, " +
      "no re-score), delta reconstructs the full view, and the " +
      "metadata shrinks by the LIVE removed count only") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    import spark.implicits._
    // two live ids + one id that was never in the index (idempotence)
    val victims = base.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0))
    val ids = (victims :+ 999999999L).toSeq.toDF("vec_id")
    val rem = KnnBeam.removeBatch(g0, idx, ids)
    assert(rem.index.count == idx.count - 2,
      "count must shrink by the live removals, ignoring absent ids")
    assert(rem.index.churn == 2L)
    assert(rem.removedIds.collect().map(_.getLong(0)).toSet ==
      victims.toSet)
    val bad = rem.graph.filter(
      col("node").isin(victims.map(Long.box): _*) ||
        col("nbr").isin(victims.map(Long.box): _*)).count()
    assert(bad == 0L, "a deleted id surfaced in the post-delete graph")
    assert(rem.index.rows.filter(
      col("vec_id").isin(victims.map(Long.box): _*)).count() == 0L,
      "a deleted id kept band rows in the index view")
    // survivors: every remaining edge is byte-identical to its stored
    // original — removal is a filter, never a re-score
    val foreign = rem.graph.exceptAll(g0)
    assert(foreign.count() == 0L,
      "removal changed an edge it should only have filtered")
    // delta view reconstructs
    val rebuilt = g0
      .join(rem.affected, Seq("node"), "left_anti")
      .join(rem.removedIds.select(col("vec_id").as("node")),
        Seq("node"), "left_anti")
      .filter(!col("nbr").isin(victims.map(Long.box): _*))
      .unionByName(rem.delta)
    assert(edgeSet(rebuilt) == edgeSet(rem.graph),
      "delta does not reconstruct the post-delete graph")
    // past-the-cap path returns the identical row set
    val rem2 = KnnBeam.removeBatch(g0, idx, ids, maxPruneKeys = 1)
    assert(edgeSet(rem2.graph) == edgeSet(rem.graph),
      "the broadcast fallback diverged from the literal-prune path")
  }

  test("tombstone persists a removal without rewriting data files, " +
      "and a removed id passes the replay guard on re-insert " +
      "(update-in-place = remove, then insert)") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    // remove batch b1's future ids? No — remove two BASE ids, then
    // re-insert those same vectors as a fresh batch
    val victims = base.select("vec_id").orderBy("vec_id").limit(2)
    val rem = KnnBeam.removeBatch(g0, stored, victims)
    val dataFilesBefore = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_graft_"))
      .count()
    val idxT = BandIndex.tombstone(dir, rem)
    val dataFilesAfter = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_graft_"))
      .count()
    assert(dataFilesAfter == dataFilesBefore,
      "tombstone must not rewrite or add data files")
    assert(idxT.count == stored.count - 2 && idxT.churn == 2L)
    val victimIds = victims.collect().map(_.getLong(0))
    assert(idxT.rows.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*)).count() == 0L,
      "a tombstoned id survived the load-time anti-join")
    // re-insert the removed vectors: the replay guard must pass and
    // the ids become searchable again
    val reinsert = emb.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*))
    val ins = KnnBeam.insertBatchIndexed(
      rem.graph.localCheckpoint(true), idxT, reinsert)
    assert(ins.index.count == stored.count)
    assert(ins.graph.filter(
      col("node").isin(victimIds.map(Long.box): _*)).count() > 0L,
      "a re-inserted id gained no edges")
  }

  test("store-mediated update-in-place: a tombstoned id that is " +
      "re-inserted and APPENDED survives the next load — the " +
      "generation bar masks only the id's PRE-delete rows (a plain " +
      "vec_id anti-join would swallow the new rows; pruning the " +
      "tombstone instead would resurrect the old ones)") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    val victims = base.select("vec_id").orderBy("vec_id").limit(2)
    val victimIds = victims.collect().map(_.getLong(0))
    val rem = KnnBeam.removeBatch(g0, stored, victims)
    val idxT = BandIndex.tombstone(dir, rem)
    // re-insert the removed vectors and PERSIST the insert
    val reinsert = emb.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*))
    val ins = KnnBeam.insertBatchIndexed(
      rem.graph.localCheckpoint(true), idxT, reinsert)
    val idx2 = BandIndex.append(dir, ins)
    assert(idx2.count == stored.count,
      "metadata count must round-trip remove + re-insert")
    assert(idx2.rows.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*)).count() ==
      idx2.nBands.toLong * victimIds.length,
      "a re-inserted id's NEW band rows were anti-joined away by a " +
        "stale tombstone entry")
    // and a FRESH load sees the same thing (nothing special about the
    // index append returned)
    val reloaded = BandIndex.load(spark, dir)
    assert(reloaded.rows.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*)).count() ==
      reloaded.nBands.toLong * victimIds.length)
    // ids never re-inserted stay tombstoned
    val rem2 = KnnBeam.removeBatch(
      ins.graph.localCheckpoint(true), idx2,
      base.select("vec_id").orderBy(col("vec_id").desc).limit(1))
    val gone2 = rem2.removedIds.collect().map(_.getLong(0))
    val idx3 = BandIndex.tombstone(dir, rem2)
    assert(idx3.rows.filter(
      col("vec_id").isin(gone2.map(Long.box): _*)).count() == 0L,
      "a tombstoned-and-never-reinserted id must stay gone")
  }

  test("compact: a full rewrite folds appended deltas and tombstones " +
      "into one bv-sorted file per directory; rows and metadata are " +
      "unchanged") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    // one append + one tombstone → extra delta files + a live
    // tombstone list
    val ins = KnnBeam.insertBatchIndexed(g0, stored, b1)
    val idx1 = BandIndex.append(dir, ins)
    val rem = KnnBeam.removeBatch(
      ins.graph.localCheckpoint(true), idx1,
      base.select("vec_id").orderBy("vec_id").limit(2))
    val idxT = BandIndex.tombstone(dir, rem)
    val before = idxT.rows.select("vec_id", "srp", "band", "bv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    val compacted = BandIndex.compact(spark, dir)
    assert(compacted.count == idxT.count &&
      compacted.churn == idxT.churn &&
      compacted.bits == idxT.bits && compacted.nBands == idxT.nBands)
    val after = compacted.rows.select("vec_id", "srp", "band", "bv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(after == before, "compaction changed the live row set")
    // tombstone list folded into the data rewrite
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_graft_tombstones")),
      "compact must clear the tombstone list it applied")
    // one data file per (band, pbv) directory again
    val dirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("pbv="))
      .iterator()
    while (dirs.hasNext) {
      val d = dirs.next()
      val files = java.nio.file.Files.list(d)
        .filter(_.toString.endsWith(".parquet")).count()
      assert(files == 1L, s"directory $d has $files files after compact")
    }
  }

  test("a crashed append (delta rows committed, metadata not) is " +
      "INVISIBLE to load — the committed-gen watermark — then rolls " +
      "forward by arithmetic on recover, after which the tombstone " +
      "bar still masks a delete of the recovered ids; a redelivered " +
      "append is a committed no-op, never a duplicate row set") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    val ins = KnnBeam.insertBatchIndexed(g0, stored, b1)
    val b1N = b1.count()
    // SIMULATE the crash: replicate append's first two protocol
    // steps — intent marker + the gen-stamped row write — and stop
    // before the metadata commit
    val pend = java.nio.file.Paths.get(dir, "_graft_pending")
    java.nio.file.Files.createDirectories(pend)
    java.nio.file.Files.createFile(pend.resolve("gen-1"))
    ins.indexDelta.withColumn("gen", lit(1L))
      .repartition(col("band"), col("pbv"))
      .sortWithinPartitions("bv")
      .write.partitionBy("band", "pbv")
      .mode("append").parquet(dir)
    // uncommitted rows are invisible: metadata AND the view are the
    // pre-append ones
    val dirty = BandIndex.load(spark, dir)
    assert(dirty.count == stored.count && dirty.gen == 0L)
    assert(dirty.rows.join(b1.select("vec_id"), Seq("vec_id"),
      "left_semi").count() == 0L,
      "uncommitted rows leaked past the watermark")
    // recover rolls forward: metadata advances by the orphan id
    // count, the rows become visible
    val rec = BandIndex.recover(spark, dir)
    assert(rec.count == stored.count + b1N && rec.gen == 1L &&
      rec.churn == b1N,
      s"roll-forward metadata wrong: ${rec.count}/${rec.gen}")
    assert(rec.rows.join(b1.select("vec_id"), Seq("vec_id"),
      "left_semi").count() == rec.nBands.toLong * b1N)
    // the tombstone bar is taken from the COMMITTED gen, so deleting
    // a recovered id masks its rows (the round-16 review's defeat
    // scenario: uncommitted gen+1 rows would have survived the bar)
    val victim = b1.select("vec_id").orderBy("vec_id").limit(1)
    val rem = KnnBeam.removeBatch(
      ins.graph.localCheckpoint(true), rec, victim)
    val idxT = BandIndex.tombstone(dir, rem)
    val vId = victim.collect().head.getLong(0)
    assert(idxT.rows.filter(col("vec_id") === vId).count() == 0L,
      "a recovered id survived its delete — the gen bar was defeated")
    // redelivery after a crash: append detects the batch committed
    // and no-ops (fresh store this time, crash then append instead
    // of recover)
    val dir2 = tmp()
    idx.write(dir2)
    val pend2 = java.nio.file.Paths.get(dir2, "_graft_pending")
    java.nio.file.Files.createDirectories(pend2)
    java.nio.file.Files.createFile(pend2.resolve("gen-1"))
    ins.indexDelta.withColumn("gen", lit(1L))
      .repartition(col("band"), col("pbv"))
      .sortWithinPartitions("bv")
      .write.partitionBy("band", "pbv")
      .mode("append").parquet(dir2)
    val after = BandIndex.append(dir2, ins)
    assert(after.count == stored.count + b1N,
      "redelivered append after crash: wrong count")
    assert(after.rows.join(b1.select("vec_id"), Seq("vec_id"),
      "left_semi").count() == after.nBands.toLong * b1N,
      "redelivered append duplicated or dropped the batch rows")
  }

  test("a crashed append whose ROWS never landed, redelivered with a " +
      "batch of previously-TOMBSTONED ids (the update-in-place flow), " +
      "APPENDS instead of no-oping against the ids' dead pre-delete " +
      "rows — the committed-batch probe is scoped to the marker's own " +
      "gen, not every gen below the watermark") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    // delete two ids, persist the tombstone — their PHYSICAL rows
    // stay in the store at gen 0
    val victims = base.select("vec_id").orderBy("vec_id").limit(2)
    val victimIds = victims.collect().map(_.getLong(0))
    val rem = KnnBeam.removeBatch(g0, stored, victims)
    val idxT = BandIndex.tombstone(dir, rem)
    // re-insert the same ids (remove-then-insert = update-in-place)
    val reinsert = emb.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*))
    val ins = KnnBeam.insertBatchIndexed(
      rem.graph.localCheckpoint(true), idxT, reinsert)
    // SIMULATE the crash: the intent marker for gen 1 lands, the row
    // write never does
    val pend = java.nio.file.Paths.get(dir, "_graft_pending")
    java.nio.file.Files.createDirectories(pend)
    java.nio.file.Files.createFile(pend.resolve("gen-1"))
    // the redelivered append: rows of gen 1 don't exist, so the
    // probe MUST read "not committed" and append — a gen<=watermark
    // probe would count the victims' dead gen-0 rows as committed
    // and silently drop the insert (index/edge-store divergence)
    val idx2 = BandIndex.append(dir, ins)
    assert(idx2.count == stored.count,
      s"redelivered update batch was lost: count ${idx2.count}, " +
        s"expected ${stored.count}")
    assert(idx2.rows.filter(
      col("vec_id").isin(victimIds.map(Long.box): _*)).count() ==
      idx2.nBands.toLong * victimIds.length,
      "re-inserted ids' NEW rows must be live after the recovery " +
        "append (the dead gen-0 rows stay masked by the bar)")
    // and a fresh load agrees
    val reloaded = BandIndex.load(spark, dir)
    assert(reloaded.count == stored.count && reloaded.gen == 1L)
  }

  test("a crashed tombstone (list committed, metadata not) keeps the " +
      "VIEW correct — deleted rows masked — with only count drift, " +
      "which recount repairs from the live band-0 rows") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    idx.write(dir)
    val stored = BandIndex.load(spark, dir)
    val victims = base.select("vec_id").orderBy("vec_id").limit(3)
    val rem = KnnBeam.removeBatch(g0, stored, victims)
    // SIMULATE the crash: the tombstone LIST lands, the metadata
    // write never does
    rem.removedIds.select(col("vec_id"), lit(stored.gen).as("gen"))
      .write.mode("append").parquet(s"$dir/_graft_tombstones")
    val dirty = BandIndex.load(spark, dir)
    val vIds = victims.collect().map(r => Long.box(r.getLong(0)))
    assert(dirty.rows.filter(col("vec_id").isin(vIds: _*))
      .count() == 0L,
      "the list entry must mask the rows even before the meta write")
    assert(dirty.count == stored.count,
      "test premise: the metadata is stale (crash window)")
    val fixed = BandIndex.recount(spark, dir)
    assert(fixed.count == stored.count - 3,
      s"recount repaired to ${fixed.count}, expected " +
        s"${stored.count - 3}")
    assert(fixed.rows.filter(col("vec_id").isin(vIds: _*))
      .count() == 0L)
  }

  test("needsRebuild churn trigger is pure metadata arithmetic: " +
      "quiet below the maxChurn fraction, fires past it, and " +
      "maintenance ops accumulate churn") {
    val idx = KnnBeam.buildBandIndex(base)
    assert(!idx.needsRebuild(),
      "a fresh index cannot need a rebuild")
    assert(!idx.copy(churn = (idx.count * 0.25).toLong).needsRebuild(),
      "churn below the threshold must not trip the trigger")
    assert(idx.copy(churn = (idx.count * 0.35).toLong).needsRebuild(),
      "churn past the threshold must trip the trigger")
    // geometry drift still fires independently of churn
    assert(idx.copy(count = 200000L).needsRebuild())
  }
}
