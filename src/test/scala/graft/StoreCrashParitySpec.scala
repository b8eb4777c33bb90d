package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{EdgeStore, KnnBeam}
import graft.operators.KnnBeam.BandIndex
import graft.streaming.StreamingIndexMaintenance
import scala.util.Random

/** Randomized crash-point parity over the persisted store protocols
  * (round-16 verdict item 5): the hand-written crash specs each pin
  * ONE chosen window; this drives ≥100 seeded random schedules —
  * sequences of insert/remove maintenance ops, each interrupted at a
  * random protocol boundary (nothing / edges-applied-only / marker
  * without rows / rows without meta / meta without marker-clear;
  * list without meta on the delete side) — then redelivers the op as
  * the restarted stream would and asserts the final stores are
  * IDENTICAL to an uninterrupted run of the same op sequence:
  * live band rows, metadata count/gen/churn/appends/tombs, and the
  * full edge set.
  *
  * The one documented exception: a crashed tombstone (list written,
  * meta not) loses its churn/tombs increments by contract (the
  * odometer note on [[KnnBeam.BandIndex.tombstone]]) and leaves the
  * count high until [[KnnBeam.BandIndex.recount]] — so schedules
  * containing that window run recount (the documented repair) before
  * comparing count, and skip the odometer fields. The VIEW (rows +
  * edges) must match unconditionally on every schedule.
  */
class StoreCrashParitySpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") < 80)
  private def batchOf(lo: Int, hi: Int) =
    emb.filter(col("vec_id") >= lo && col("vec_id") < hi)

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-crash-parity").toString

  // ---- op space ---------------------------------------------------

  private sealed trait Op { def key: String }
  private case class Ins(lo: Int, hi: Int) extends Op {
    def key = s"I$lo-$hi"
    def batch: DataFrame = batchOf(lo, hi)
  }
  private case class Rem(ids: Seq[Long]) extends Op {
    def key = s"R${ids.mkString("_")}"
    def frame: DataFrame = {
      import spark.implicits._
      ids.toDF("vec_id")
    }
  }

  private val ops: Vector[Op] = Vector(
    Ins(80, 88), Ins(88, 96),
    Rem(Seq(0L, 10L, 20L)), Rem(Seq(5L, 15L, 999999L)))

  /** Insert crash points: 0 = nothing ran, 1 = edges applied only,
    * 2 = + intent marker (no rows), 3 = + rows (no meta), 4 = + meta
    * (marker never cleared), 5 = no crash.
    */
  private val insCrashMax = 5
  /** Remove crash points: 0 = nothing, 1 = edges applied only,
    * 2 = + tombstone list (no meta — the lossy odometer window),
    * 3 = no crash.
    */
  private val remCrashMax = 3

  // ---- protocol-step simulation -----------------------------------

  /** Replicate processBatch UP TO the chosen crash point (the same
    * protocol steps append performs, stopped early), then redeliver
    * the full op — exactly what a restarted foreachBatch does.
    */
  private def runIns(indexDir: String, edgeDir: String, op: Ins,
      crash: Int): Unit = {
    if (crash >= 1 && crash <= 4) {
      val idx = BandIndex.load(spark, indexDir)
      val b = op.batch.select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val fresh = b.join(KnnBeam.presentIds(idx, b),
        Seq("vec_id"), "left_anti").localCheckpoint(true)
      if (fresh.isEmpty) return runRedeliveryIns(indexDir, edgeDir, op)
      val graph = EdgeStore.load(spark, edgeDir)
      val ins = KnnBeam.insertBatchIndexed(graph, idx, fresh,
        assumeDisjoint = true)
      EdgeStore.applyInsert(edgeDir, ins)
      if (crash >= 2) {
        val pend = java.nio.file.Paths.get(indexDir, "_graft_pending")
        java.nio.file.Files.createDirectories(pend)
        java.nio.file.Files.createFile(
          pend.resolve(s"gen-${idx.gen + 1}"))
      }
      if (crash >= 3) {
        ins.indexDelta.withColumn("gen", lit(idx.gen + 1))
          .repartition(col("band"), col("pbv"))
          .sortWithinPartitions("bv")
          .write.partitionBy("band", "pbv")
          .mode("append").parquet(indexDir)
      }
      if (crash >= 4) {
        val batchN = fresh.count()
        writeMetaRaw(indexDir, idx.copy(count = idx.count + batchN,
          churn = idx.churn + batchN, gen = idx.gen + 1,
          appends = idx.appends + 1))
      }
    }
    runRedeliveryIns(indexDir, edgeDir, op)
  }

  private def runRedeliveryIns(indexDir: String, edgeDir: String,
      op: Ins): Unit =
    StreamingIndexMaintenance.processBatch(indexDir, edgeDir)(
      op.batch, 0L)

  private def runRem(indexDir: String, edgeDir: String, op: Rem,
      crash: Int): Boolean = { // returns true if the lossy window ran
    var lossy = false
    if (crash >= 1 && crash <= 2) {
      val idx = BandIndex.load(spark, indexDir)
      val graph = EdgeStore.load(spark, edgeDir)
      val rem = KnnBeam.removeBatch(graph, idx, op.frame)
      if (!rem.removedIds.isEmpty) {
        EdgeStore.applyRemove(edgeDir, rem)
        if (crash >= 2) {
          rem.removedIds.select(col("vec_id"),
              lit(rem.index.gen).as("gen"))
            .write.mode("append")
            .parquet(s"$indexDir/_graft_tombstones")
          lossy = true
        }
      }
    }
    StreamingIndexMaintenance.processRemoveBatch(indexDir, edgeDir)(
      op.frame, 0L)
    lossy
  }

  private def writeMetaRaw(dir: String, idx: BandIndex): Unit = {
    import spark.implicits._
    Seq((idx.count, idx.bits, idx.nBands, idx.churn, idx.gen,
        idx.appends, idx.tombs))
      .toDF("count", "bits", "nBands", "churn", "gen",
        "appends", "tombs")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_graft_meta")
  }

  // ---- state capture ----------------------------------------------

  private case class StoreState(
      rows: Set[(Long, Long, Int, Long)],
      edges: Set[(Long, Long, Double)],
      count: Long, gen: Long, churn: Long,
      appends: Long, tombs: Long)

  private def capture(indexDir: String, edgeDir: String): StoreState = {
    val idx = BandIndex.load(spark, indexDir)
    StoreState(
      idx.rows.select("vec_id", "srp", "band", "bv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).toSet,
      EdgeStore.load(spark, edgeDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
      idx.count, idx.gen, idx.churn, idx.appends, idx.tombs)
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

  test("≥100 seeded random schedules: every insert/remove sequence, " +
      "crashed at a random protocol boundary per op and redelivered, " +
      "converges to the uninterrupted run's exact stores (rows, " +
      "edges, metadata) — the lossy tombstone window repaired by " +
      "recount per its documented contract") {
    // one template deployment, copied per schedule
    val template = tmp()
    val tIndex = s"$template/index"
    val tEdges = s"$template/edges"
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    KnnBeam.buildBandIndex(base).write(tIndex)
    EdgeStore.write(g0, tEdges, nBuckets = 8)

    def freshCopy(): (String, String) = {
      val d = tmp()
      copyTree(java.nio.file.Paths.get(tIndex),
        java.nio.file.Paths.get(s"$d/index"))
      copyTree(java.nio.file.Paths.get(tEdges),
        java.nio.file.Paths.get(s"$d/edges"))
      (s"$d/index", s"$d/edges")
    }

    // deterministic schedule list, drawn up front so the reference
    // runs and the crashed runs can each go wide on the driver
    // (Spark is thread-safe for concurrent actions; the schedules
    // touch disjoint store copies)
    case class Schedule(seed: Int, seq: Seq[Op], crashes: Seq[Int])
    val schedules = (0 until 100).map { seed =>
      val rng = new Random(seed.toLong * 7919L + 13L)
      val seq = Seq.fill(2)(ops(rng.nextInt(ops.size)))
      val crashes = seq.map {
        case _: Ins => rng.nextInt(insCrashMax + 1)
        case _: Rem => rng.nextInt(remCrashMax + 1)
      }
      Schedule(seed, seq, crashes)
    }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    try {
      // uninterrupted reference finals, one per distinct op sequence
      val refs: Map[String, StoreState] = Await.result(
        Future.traverse(
          schedules.map(s => s.seq.map(_.key).mkString("+") -> s.seq)
            .toMap.toSeq) { case (key, seq) =>
          Future {
            val (iDir, eDir) = freshCopy()
            seq.foreach {
              case i: Ins => runRedeliveryIns(iDir, eDir, i)
              case r: Rem => StreamingIndexMaintenance
                .processRemoveBatch(iDir, eDir)(r.frame, 0L)
            }
            key -> capture(iDir, eDir)
          }
        }, Duration.Inf).toMap

      val failures = Await.result(
        Future.traverse(schedules) { s =>
          Future {
            val (iDir, eDir) = freshCopy()
            var lossy = false
            s.seq.zip(s.crashes).foreach {
              case (i: Ins, c) => runIns(iDir, eDir, i, c)
              case (r: Rem, c) => lossy |= runRem(iDir, eDir, r, c)
            }
            if (lossy) BandIndex.recount(spark, iDir) // documented repair
            val got = capture(iDir, eDir)
            val want = refs(s.seq.map(_.key).mkString("+"))
            val label = s"seed=${s.seed} " +
              s"seq=${s.seq.map(_.key).mkString("+")} " +
              s"crashes=${s.crashes.mkString(",")} lossy=$lossy"
            val errs = Seq.newBuilder[String]
            if (got.rows != want.rows)
              errs += s"$label: live band rows diverged"
            if (got.edges != want.edges)
              errs += s"$label: edge sets diverged"
            if (got.count != want.count)
              errs += s"$label: count ${got.count} vs ${want.count}"
            if (got.gen != want.gen)
              errs += s"$label: gen ${got.gen} vs ${want.gen}"
            if (!lossy && (got.churn != want.churn ||
                got.tombs != want.tombs ||
                got.appends != want.appends))
              errs += s"$label: odometers (churn/appends/tombs) " +
                s"(${got.churn},${got.appends},${got.tombs}) vs " +
                s"(${want.churn},${want.appends},${want.tombs})"
            errs.result()
          }
        }, Duration.Inf).flatten
      assert(failures.isEmpty,
        s"${failures.size} of 100 schedules diverged:\n" +
          failures.take(10).mkString("\n"))
    } finally pool.shutdown()
  }
}
