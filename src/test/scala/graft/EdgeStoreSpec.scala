package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{EdgeStore, KnnBeam}

/** The node-bucketed edge store: write/load round-trip, delta-sized
  * bucket rewrites that leave untouched buckets' FILES untouched,
  * exactness of the store-mediated view vs the in-memory result for
  * both insert and delete, idempotent re-application (the crash-heal
  * contract), and the index-sized-delta guard.
  */
class EdgeStoreSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def b1 = emb.filter(col("vec_id") % 10 === 8)

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-edgestore").toString

  private def edgeSet(g: DataFrame): Set[(Long, Long, Double)] =
    g.select("node", "nbr", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def bucketFiles(dir: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket="))
      .map { d =>
        d.getFileName.toString -> java.nio.file.Files.list(d)
          .iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(_.getFileName.toString).toSet
      }.toMap
  }

  test("write → load round-trips the edge rows exactly (cosines " +
      "bit-for-bit) with flat lineage") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    assert(EdgeStore.buckets(spark, dir) == 16)
    val loaded = EdgeStore.load(spark, dir)
    assert(edgeSet(loaded) == edgeSet(g0),
      "stored edges diverged from the built graph")
    val hasUnion = org.apache.spark.sql.graft.bridge.analyzed(loaded)
      .collectFirst {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
      }.nonEmpty
    assert(!hasUnion, "loaded edges must be a plain scan")
  }

  test("applyInsert rewrites ONLY the touched buckets and the " +
      "reloaded view equals the in-memory insert edge-for-edge; " +
      "re-applying the same delta is a no-op (idempotent heal)") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    val before = bucketFiles(dir)
    val ins = KnnBeam.insertBatchIndexed(g0, idx, b1)
    EdgeStore.applyInsert(dir, ins)
    assert(edgeSet(EdgeStore.load(spark, dir)) == edgeSet(ins.graph),
      "store-mediated insert diverged from the in-memory result")
    val after = bucketFiles(dir)
    // the replaced-node set bounds the touched buckets
    val touched = ins.delta.select("node")
      .unionByName(ins.affected.select("node")).distinct()
      .select(pmod(hash(col("node")), lit(16)).as("b"))
      .distinct().collect().map(r => s"bucket=${r.getInt(0)}").toSet
    before.keys.filterNot(touched).foreach { b =>
      assert(after.get(b).contains(before(b)),
        s"untouched $b was rewritten")
    }
    // idempotence: the crash-recovery path re-applies the same delta
    EdgeStore.applyInsert(dir, ins)
    assert(edgeSet(EdgeStore.load(spark, dir)) == edgeSet(ins.graph),
      "re-applying the delta changed the store")
  }

  test("applyRemove drops removed neighborhoods (node AND nbr side) " +
      "and the reloaded view equals the in-memory delete") {
    val full = emb.filter(col("vec_id") % 10 =!= 9)
    val g0 = KnnBeam.buildGraph(full).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(full)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    val victims = full.filter(col("vec_id") % 10 === 0)
      .select("vec_id")
    val rem = KnnBeam.removeBatch(g0, idx, victims)
    EdgeStore.applyRemove(dir, rem)
    val loaded = EdgeStore.load(spark, dir)
    assert(edgeSet(loaded) == edgeSet(rem.graph),
      "store-mediated delete diverged from the in-memory result")
    val vIds = rem.removedIds.collect().map(r => Long.box(r.getLong(0)))
    assert(loaded.filter(col("node").isin(vIds: _*) ||
      col("nbr").isin(vIds: _*)).count() == 0L,
      "a removed id survived in the edge store")
  }

  test("crash windows: a bucket parked by a mid-apply crash is " +
      "invisible to load (no duplicates, no partition-type widening), " +
      "heal restores it, and re-applying the delta recovers the full " +
      "store with no data loss; a stale parked copy beside a " +
      "complete live bucket is dropped") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    val ins = KnnBeam.insertBatchIndexed(g0, idx, b1)
    EdgeStore.applyInsert(dir, ins)
    val expected = edgeSet(EdgeStore.load(spark, dir))
    // simulate a crash AFTER the park, BEFORE the activate: one
    // bucket's only copy sits in the .old sibling
    import scala.jdk.CollectionConverters._
    val bucketDir = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.startsWith("bucket="))
      .getOrElse(fail("no bucket directory found"))
    val parkRoot = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.createDirectories(parkRoot)
    java.nio.file.Files.move(bucketDir,
      parkRoot.resolve(bucketDir.getFileName))
    // load HEALS before capturing its file listing (third-pass fix:
    // a delta computed from an unhealed, bucket-missing listing
    // would rebuild affected neighborhoods WITHOUT their stored
    // edges and the next apply would overwrite the healed rows), so
    // the very first reader after the crash already sees the full
    // store — no duplicates, no missing buckets, no re-typed
    // partition column
    assert(edgeSet(EdgeStore.load(spark, dir)) == expected,
      "load must heal the parked bucket before listing files")
    assert(!java.nio.file.Files.exists(parkRoot),
      "heal must clear the park root")
    // and the documented recovery — re-apply the same delta — stays
    // a pure no-op on the healed store
    EdgeStore.applyInsert(dir, ins)
    assert(edgeSet(EdgeStore.load(spark, dir)) == expected,
      "crash recovery lost rows")
    // legacy layout: a bucket parked INSIDE the store as bucket=N.old
    // (the first-cut layout) restores when its live copy is missing
    val bucketDir2 = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.startsWith("bucket="))
      .getOrElse(fail("no bucket directory found"))
    val legacyOld = bucketDir2.resolveSibling(
      bucketDir2.getFileName.toString + ".old")
    java.nio.file.Files.move(bucketDir2, legacyOld)
    assert(edgeSet(EdgeStore.load(spark, dir)) == expected,
      "heal must restore a legacy in-store parked bucket")
    assert(!java.nio.file.Files.exists(legacyOld))
    // stale parked copy beside a COMPLETE live bucket (crash after
    // activate, before the park delete): heal drops it, live wins
    java.nio.file.Files.createDirectories(
      parkRoot.resolve("bucket=0"))
    EdgeStore.heal(spark, dir)
    assert(!java.nio.file.Files.exists(parkRoot),
      "heal must drop a superseded parked copy")
    assert(edgeSet(EdgeStore.load(spark, dir)) == expected)
  }

  test("a full rebuild (write over an existing store) clears stale " +
      ".old/.staging siblings from a crashed applyDelta — heal can " +
      "never resurrect pre-rebuild edges into the fresh store, even " +
      "when nBuckets changed and the parked bucket has no live twin") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    // simulate a crashed applyDelta: one real bucket parked at a
    // bucket number the REBUILT (nBuckets=4) store will never
    // produce, plus a stale staging sibling
    import scala.jdk.CollectionConverters._
    val bucketDir = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.startsWith("bucket="))
      .getOrElse(fail("no bucket directory found"))
    val parkRoot = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.createDirectories(parkRoot)
    copyTree(bucketDir, parkRoot.resolve("bucket=15"))
    val staging = java.nio.file.Paths.get(dir + ".staging")
    java.nio.file.Files.createDirectories(staging)
    // the rebuild: fewer buckets, smaller graph — supersedes
    // everything parked
    val g1 = KnnBeam.buildGraph(base.filter(col("vec_id") % 2 === 0))
      .localCheckpoint(true)
    EdgeStore.write(g1, dir, nBuckets = 4)
    assert(!java.nio.file.Files.exists(parkRoot),
      "write must clear the parked sibling it supersedes")
    assert(!java.nio.file.Files.exists(staging),
      "write must clear the stale staging sibling")
    assert(EdgeStore.buckets(spark, dir) == 4)
    // load runs heal — which must now find nothing to resurrect
    assert(edgeSet(EdgeStore.load(spark, dir)) == edgeSet(g1),
      "pre-rebuild edges leaked into the rebuilt store")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "bucket=15")),
      "a parked pre-rebuild bucket was resurrected by heal")
  }

  test("a rebuild over an existing store is write-then-swap: a crash " +
      "between the renames leaves the PREVIOUS store parked and the " +
      "next load heals it back — the old pair stays servable; a park " +
      "beside a complete live store (cleanup crash) is dropped") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    val expected = edgeSet(EdgeStore.load(spark, dir))
    // simulate the mid-swap crash: live renamed aside, the fresh
    // store never renamed in (staging still sitting beside it)
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".rebuild-old"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".rebuild-staging"))
    assert(edgeSet(EdgeStore.load(spark, dir)) == expected,
      "load must restore the pre-rebuild store after a mid-swap crash")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + ".rebuild-old")))
    // metadata path works too (buckets reads _graft_meta)
    assert(EdgeStore.buckets(spark, dir) == 16)
    // re-running the rebuild now commits cleanly
    val g1 = KnnBeam.buildGraph(base.filter(col("vec_id") % 2 === 0))
      .localCheckpoint(true)
    EdgeStore.write(g1, dir, nBuckets = 8)
    assert(edgeSet(EdgeStore.load(spark, dir)) == edgeSet(g1))
    assert(EdgeStore.buckets(spark, dir) == 8)
    // cleanup crash: park beside a COMPLETE live store → dropped
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".rebuild-old"))
    EdgeStore.heal(spark, dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + ".rebuild-old")),
      "heal must drop a superseded rebuild park")
    assert(edgeSet(EdgeStore.load(spark, dir)) == edgeSet(g1))
  }

  test("double-crash window: write HEALS a crashed applyDelta's " +
      "parked-only bucket before clearing siblings, so a rebuild " +
      "that itself crashes before its swap leaves the pre-rebuild " +
      "store WHOLE — no bucket is lost with nothing for heal to " +
      "restore") {
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    val expected = edgeSet(EdgeStore.load(spark, dir))
    // first crash: applyDelta parked a bucket and died before the
    // activate — the parked copy is that bucket's ONLY copy
    import scala.jdk.CollectionConverters._
    val bucketDir = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.startsWith("bucket="))
      .getOrElse(fail("no bucket directory found"))
    val parkRoot = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.createDirectories(parkRoot)
    java.nio.file.Files.move(bucketDir,
      parkRoot.resolve(bucketDir.getFileName))
    // second crash: a rebuild dies AFTER write's sibling cleanup but
    // BEFORE its swap — forced here by a graph that throws at
    // execution, which lands exactly in that window (staging write,
    // no rename yet)
    val poisoned = g0.select(col("node"), col("nbr"),
      when(col("node").isNotNull, raise_error(lit("boom")))
        .cast("double").as("cosine"))
    intercept[Exception] { EdgeStore.write(poisoned, dir, 16) }
    // the pre-rebuild store must be COMPLETE: the park was healed
    // into the live store, not deleted unhealed (the round-17 code
    // cleared .old first — this state lost the bucket silently)
    assert(edgeSet(EdgeStore.load(spark, dir)) == expected,
      "the parked-only bucket was lost in the double-crash window")
    // and re-running the rebuild converges
    val g1 = KnnBeam.buildGraph(base.filter(col("vec_id") % 2 === 0))
      .localCheckpoint(true)
    EdgeStore.write(g1, dir, nBuckets = 8)
    assert(edgeSet(EdgeStore.load(spark, dir)) == edgeSet(g1))
  }

  private def copyTree(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
      val target = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(target)
      else java.nio.file.Files.copy(p, target)
    }
  }

  test("an index-sized delta fails the maxReplaceIds guard with a " +
      "named error instead of a store-sized 'delta' rewrite; an " +
      "empty delta is a no-op") {
    val session = spark
    import session.implicits._
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val idx = KnnBeam.buildBandIndex(base)
    val dir = tmp()
    EdgeStore.write(g0, dir, nBuckets = 16)
    val ins = KnnBeam.insertBatchIndexed(g0, idx, b1)
    val e = intercept[IllegalArgumentException] {
      EdgeStore.applyDelta(dir, ins.delta, ins.affected,
        Seq.empty[Long].toDF("vec_id"), maxReplaceIds = 1)
    }
    assert(e.getMessage.contains("maxReplaceIds"),
      s"wrong error: ${e.getMessage}")
    val before = edgeSet(EdgeStore.load(spark, dir))
    EdgeStore.applyDelta(dir, g0.limit(0),
      Seq.empty[Long].toDF("node"), Seq.empty[Long].toDF("vec_id"))
    assert(edgeSet(EdgeStore.load(spark, dir)) == before,
      "an empty delta changed the store")
  }
}
