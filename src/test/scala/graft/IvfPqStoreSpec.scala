package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, IvfPqStore, PqIndex}
import graft.operators.IvfPqStore.Store
import scala.util.Random

/** The persisted IVF-PQ deployment (round-17 verdict item 2): build/
  * load round-trip, stored-model appends, gen-barred deletes with
  * re-insert, compact as a pure IO fold, rebuild ≡ fresh build over
  * the net corpus, trigger arithmetic, serving recall — and the
  * randomized crash-point parity sweep (the `StoreCrashParitySpec`
  * pattern) over the append/remove protocols.
  */
class IvfPqStoreSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def b1 = emb.filter(col("vec_id") % 10 === 8)
  private def b2 = emb.filter(col("vec_id") % 10 === 9)

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-ivfpq").toString + "/store"

  private def asBatch(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").as("vec"))

  private def rowSet(st: Store): Set[(Long, Seq[Int], Int)] =
    st.rows.select("vec_id", "codes", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet

  /** What the store's rows MUST equal for a given (corpus, models):
    * one assign+encode pass — the spec recomputes it independently
    * of the store code path.
    */
  private def expectedRows(corpus: DataFrame, ivf: IvfIndex.Model,
      pq: PqIndex.Model): Set[(Long, Seq[Int], Int)] =
    PqIndex.encode(
        IvfIndex.assign(asBatch(corpus), "vec", ivf), "vec", pq)
      .filter(col("codes").isNotNull)
      .select("vec_id", "codes", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet

  test("build → load round-trips: rows are exactly one assign+encode " +
      "pass of the corpus under the trained models, metadata counts " +
      "and per-cell counts match, models persist bit-identically") {
    val dir = tmp()
    val st = IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    val loaded = IvfPqStore.load(spark, dir)
    assert(loaded.count == base.count())
    assert(loaded.gen == 0L && loaded.churn == 0L &&
      loaded.appends == 0L && loaded.tombs == 0L)
    // models round-trip exactly (doubles bit-for-bit through parquet)
    assert(loaded.ivf.centroids.map(_.toSeq).toSeq ==
      st.ivf.centroids.map(_.toSeq).toSeq)
    assert(loaded.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      st.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(rowSet(loaded) == expectedRows(base, st.ivf, st.pq),
      "stored rows diverged from an independent assign+encode")
    assert(loaded.cellCounts.toSeq ==
      (0 until st.k).map(c =>
        loaded.rows.filter(col("cell") === c).count()),
      "cellCounts must match the physical per-cell rows")
    assert(loaded.cellCounts.sum == loaded.count)
  }

  test("append encodes under the STORED models (no retrain): the " +
      "maintained view equals base+batch encoded under the BASE " +
      "models; counters and cellCounts advance; a replayed batch " +
      "no-ops via presentIds") {
    val dir = tmp()
    val st0 = IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    val st1 = IvfPqStore.append(dir, asBatch(b1))
    assert(st1.count == st0.count + b1.count())
    assert(st1.gen == 1L && st1.appends == 1L &&
      st1.churn == b1.count())
    assert(rowSet(st1) ==
      expectedRows(base.unionByName(b1), st0.ivf, st0.pq),
      "append must extend the view under the stored models")
    assert(st1.cellCounts.sum == st1.count)
    // replay guard: every id already present
    val present = IvfPqStore.presentIds(st1, asBatch(b1)).count()
    assert(present == b1.count(),
      "presentIds must see the whole committed batch")
    assert(IvfPqStore.presentIds(st1, asBatch(b2)).count() == 0L,
      "presentIds must not see never-inserted ids")
  }

  test("remove tombstones at the current gen: view masks the ids, " +
      "physical rows (and cellCounts) stay until compact, and a " +
      "REINSERT after the delete serves the new rows (generation " +
      "bar, not a plain anti-join)") {
    val session = spark
    import session.implicits._
    val dir = tmp()
    IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    val victims = base.select("vec_id").orderBy("vec_id").limit(3)
    val vIds = victims.collect().map(_.getLong(0))
    val st1 = IvfPqStore.remove(dir, victims)
    assert(st1.count == base.count() - 3)
    assert(st1.tombs == 3L && st1.churn == 3L)
    assert(st1.rows.filter(col("vec_id")
      .isin(vIds.map(Long.box).toIndexedSeq: _*)).count() == 0L,
      "a tombstoned id stayed visible")
    // physical rows still there (scan cost unchanged until compact)
    assert(spark.read.parquet(dir).filter(col("vec_id")
      .isin(vIds.map(Long.box).toIndexedSeq: _*)).count() == 3L)
    // removing an absent id is a no-op, not a crash
    val st2 = IvfPqStore.remove(dir, Seq(999999L).toDF("vec_id"))
    assert(st2.count == st1.count && st2.tombs == st1.tombs)
    // re-insert one victim: its NEW rows (gen 1) outlive the bar
    val again = emb.filter(col("vec_id") === vIds.head)
    val st3 = IvfPqStore.append(dir, asBatch(again))
    assert(st3.rows.filter(col("vec_id") === vIds.head).count() == 1L,
      "a re-inserted id must serve its post-delete rows")
    assert(st3.count == st1.count + 1)
  }

  test("compact is an IO fold: live view identical, tombstones and " +
      "appended delta files folded, counters reset, cellCounts " +
      "recounted to the live rows, models untouched") {
    val dir = tmp()
    val st0 = IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    IvfPqStore.append(dir, asBatch(b1))
    val victims = base.select("vec_id").orderBy("vec_id").limit(3)
    val st1 = IvfPqStore.remove(dir, victims)
    val before = rowSet(st1)
    val st2 = IvfPqStore.compact(spark, dir)
    assert(rowSet(st2) == before, "compact changed the live view")
    assert(st2.appends == 0L && st2.tombs == 0L,
      "compact must reset the read-amplification counters")
    assert(st2.count == st1.count && st2.churn == st1.churn &&
      st2.gen == st1.gen, "compact is not a rebuild")
    assert(st2.cellCounts.sum == st2.count,
      "post-compact physical rows must equal live rows")
    assert(st2.ivf.centroids.map(_.toSeq).toSeq ==
      st0.ivf.centroids.map(_.toSeq).toSeq,
      "compact must never retrain")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir, "_graft_tombstones")))
  }

  test("rebuild retrains on the store's own live vectors and equals " +
      "a FRESH build over the net corpus bit-for-bit (rows, models, " +
      "counts); churn and counters reset") {
    val dir = tmp()
    IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    IvfPqStore.append(dir, asBatch(b1))
    val victims = base.select("vec_id").orderBy("vec_id").limit(3)
    IvfPqStore.remove(dir, victims)
    val vIds = victims.collect().map(_.getLong(0)).toSet
    val rebuilt = IvfPqStore.rebuild(spark, dir, k = 4)
    // fresh build over the same net corpus, separate dir
    val net = base.unionByName(b1)
      .filter(!col("vec_id").isin(vIds.map(Long.box).toSeq: _*))
    val freshDir = tmp()
    val fresh = IvfPqStore.build(net, "vec_id", "embedding",
      freshDir, k = 4)
    assert(rebuilt.count == fresh.count)
    assert(rebuilt.churn == 0L && rebuilt.gen == 0L &&
      rebuilt.appends == 0L && rebuilt.tombs == 0L)
    assert(rebuilt.ivf.centroids.map(_.toSeq).toSeq ==
      fresh.ivf.centroids.map(_.toSeq).toSeq,
      "rebuild's retrained IVF model diverged from a fresh build")
    assert(rebuilt.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      fresh.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "rebuild's retrained PQ model diverged from a fresh build")
    assert(rowSet(rebuilt) == rowSet(fresh),
      "rebuilt rows diverged from a fresh build")
    assert(rebuilt.cellCounts.toSeq == fresh.cellCounts.toSeq)
  }

  test("trigger arithmetic: cell skew and churn fire needsRebuild, " +
      "appends and tombstone fraction fire needsCompact — pure " +
      "metadata, no IO") {
    val dir = tmp()
    val st = IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    assert(!st.needsRebuild() && !st.needsCompact())
    val even = Array.fill(8)(25L)
    assert(!st.copy(cellCounts = even).needsRebuild())
    // one cell at >4x the mean (k must exceed maxSkew for the
    // trigger to be reachable — max/mean ≤ k by construction)
    assert(st.copy(
      cellCounts = Array(150L, 20L, 20L, 20L, 20L, 20L, 20L, 20L),
      count = 290L).needsRebuild(), "skew past maxSkew must fire")
    assert(!st.copy(
      cellCounts = Array(100L, 20L, 20L, 20L, 20L, 20L, 20L, 20L),
      count = 240L).needsRebuild(maxChurn = 1.0),
      "skew under maxSkew must stay quiet")
    assert(st.copy(churn = st.count).needsRebuild(),
      "churn past maxChurn must fire")
    assert(st.copy(appends = 17L).needsCompact())
    assert(!st.copy(appends = 16L).needsCompact())
    assert(st.copy(tombs = (st.count * 0.25).toLong).needsCompact())
  }

  test("search serves cosine top-k off the store: deterministic " +
      "across reloads, shortlist+rerank recovers the exact top-5 at " +
      "the calibrated floor, probed-cell prune never returns a " +
      "tombstoned id") {
    val dir = tmp()
    IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    IvfPqStore.append(dir, asBatch(b1))
    val victims = base.select("vec_id").orderBy("vec_id").limit(3)
    val st = IvfPqStore.remove(dir, victims)
    val vIds = victims.collect().map(_.getLong(0)).toSet
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val got = IvfPqStore.search(st, queries, nprobe = 2,
      shortlist = 50, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 50, s"10 queries x 5: ${got.length}")
    assert(!got.exists(r => vIds.contains(r._2)),
      "search returned a deleted id")
    // reload → identical results (persisted models, no retrain)
    val got2 = IvfPqStore.search(IvfPqStore.load(spark, dir),
        queries, nprobe = 2, shortlist = 50, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == got2.toSet, "serving must be deterministic")
    // recall vs brute force over the live corpus
    val live = base.unionByName(b1)
      .filter(!col("vec_id").isin(vIds.map(Long.box).toSeq: _*))
    val c = live.select(col("vec_id").as("n_id"),
      col("embedding").as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    val exact = broadcast(queries).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.count(r => exact.contains((r._1, r._2)))
    assert(hits >= 15,
      s"maintained-store recall $hits/50 below the working floor")
  }

  // ---- randomized crash-point parity --------------------------------

  /** Append crash points: 0 = nothing ran, 1 = intent marker only,
    * 2 = + rows (no meta), 3 = + meta (marker never cleared),
    * 4 = no crash.
    */
  private val insCrashMax = 4
  /** Remove crash points: 0 = nothing, 1 = tombstone list written
    * (no meta — the documented lossy odometer window), 2 = no crash.
    */
  private val remCrashMax = 2

  private sealed trait Op { def key: String }
  private case class Ins(lo: Int, hi: Int) extends Op {
    def key = s"I$lo-$hi"
    def batch: DataFrame = asBatch(
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi))
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

  /** The maintained-deployment delivery: recover a crashed append,
    * replay-guard via presentIds, append the fresh remainder — what a
    * restarted micro-batch loop does.
    */
  private def deliverIns(dir: String, op: Ins): Unit = {
    val st = IvfPqStore.recover(spark, dir)
    val fresh = op.batch.join(IvfPqStore.presentIds(st, op.batch),
      Seq("vec_id"), "left_anti").localCheckpoint(true)
    if (!fresh.isEmpty) IvfPqStore.append(dir, fresh)
  }

  /** Replicate the append protocol UP TO the crash point, then
    * redeliver the full op.
    */
  private def runIns(dir: String, op: Ins, crash: Int): Unit = {
    if (crash >= 1 && crash <= 3) {
      val st = IvfPqStore.load(spark, dir)
      // the real delivery path replay-splits BEFORE appending — a
      // crashed op simulation must too, or it simulates an append
      // the protocol never performs (same guard as deliverIns)
      val freshB = op.batch.join(IvfPqStore.presentIds(st, op.batch),
        Seq("vec_id"), "left_anti").localCheckpoint(true)
      if (freshB.isEmpty) return deliverIns(dir, op)
      val delta = PqIndex.encode(
          IvfIndex.assign(freshB, "vec", st.ivf), "vec", st.pq)
        .filter(col("codes").isNotNull)
        .select("vec_id", "codes", "vec", "cell")
        .localCheckpoint(true)
      val pend = java.nio.file.Paths.get(dir, "_graft_pending")
      java.nio.file.Files.createDirectories(pend)
      java.nio.file.Files.createFile(pend.resolve(s"gen-${st.gen + 1}"))
      if (crash >= 2) {
        delta.withColumn("gen", lit(st.gen + 1))
          .repartition(col("cell"))
          .sortWithinPartitions("vec_id")
          .write.partitionBy("cell")
          .mode("append").parquet(dir)
      }
      if (crash >= 3) {
        val n = delta.count()
        val cc = st.cellCounts.clone()
        delta.groupBy("cell").agg(count(lit(1)).as("n")).collect()
          .foreach(r => cc(r.getInt(0)) += r.getLong(1))
        writeMetaRaw(dir, st.copy(count = st.count + n,
          churn = st.churn + n, gen = st.gen + 1,
          appends = st.appends + 1, cellCounts = cc))
      }
    }
    deliverIns(dir, op)
  }

  private def runRem(dir: String, op: Rem, crash: Int): Boolean = {
    var lossy = false
    if (crash == 1) {
      val st = IvfPqStore.load(spark, dir)
      val victims = op.frame
        .join(st.rows.select("vec_id"), Seq("vec_id"), "left_semi")
      if (victims.count() > 0L) {
        victims.select(col("vec_id"), lit(st.gen).as("gen"))
          .write.mode("append").parquet(s"$dir/_graft_tombstones")
        lossy = true
      }
    }
    IvfPqStore.remove(dir, op.frame)
    lossy
  }

  private def writeMetaRaw(dir: String, st: Store): Unit = {
    import spark.implicits._
    Seq((st.count, st.ivf.k, st.pq.m, st.pq.k, st.churn, st.gen,
        st.appends, st.tombs, st.cellCounts.toSeq))
      .toDF("count", "k", "m", "pqK", "churn", "gen", "appends",
        "tombs", "cellCounts")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_graft_meta")
  }

  private case class StoreState(
      rows: Set[(Long, Seq[Int], Int)],
      count: Long, gen: Long, churn: Long,
      appends: Long, tombs: Long, cellCounts: Seq[Long])

  private def capture(dir: String): StoreState = {
    val st = IvfPqStore.load(spark, dir)
    StoreState(rowSet(st), st.count, st.gen, st.churn,
      st.appends, st.tombs, st.cellCounts.toSeq)
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

  test("100 seeded random schedules: every append/remove sequence, " +
      "crashed at a random protocol boundary per op and redelivered, " +
      "converges to the uninterrupted run's exact store (rows, " +
      "metadata, cellCounts) — the lossy tombstone window repaired " +
      "by recount per its documented contract") {
    val template = tmp()
    IvfPqStore.build(emb.filter(col("vec_id") < 80),
      "vec_id", "embedding", template, k = 4)

    def freshCopy(): String = {
      val d = tmp()
      copyTree(java.nio.file.Paths.get(template),
        java.nio.file.Paths.get(d))
      d
    }

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
      val refs: Map[String, StoreState] = Await.result(
        Future.traverse(
          schedules.map(s => s.seq.map(_.key).mkString("+") -> s.seq)
            .toMap.toSeq) { case (key, seq) =>
          Future {
            val dir = freshCopy()
            seq.foreach {
              case i: Ins => deliverIns(dir, i)
              case r: Rem => IvfPqStore.remove(dir, r.frame)
            }
            key -> capture(dir)
          }
        }, Duration.Inf).toMap

      val failures = Await.result(
        Future.traverse(schedules) { s =>
          Future {
            val dir = freshCopy()
            var lossy = false
            s.seq.zip(s.crashes).foreach {
              case (i: Ins, c) => runIns(dir, i, c)
              case (r: Rem, c) => lossy |= runRem(dir, r, c)
            }
            if (lossy) IvfPqStore.recount(spark, dir)
            val got = capture(dir)
            val want = refs(s.seq.map(_.key).mkString("+"))
            val label = s"seed=${s.seed} " +
              s"seq=${s.seq.map(_.key).mkString("+")} " +
              s"crashes=${s.crashes.mkString(",")} lossy=$lossy"
            val errs = Seq.newBuilder[String]
            if (got.rows != want.rows)
              errs += s"$label: live rows diverged"
            if (got.count != want.count)
              errs += s"$label: count ${got.count} vs ${want.count}"
            if (got.gen != want.gen)
              errs += s"$label: gen ${got.gen} vs ${want.gen}"
            if (got.cellCounts != want.cellCounts)
              errs += s"$label: cellCounts ${got.cellCounts} vs " +
                s"${want.cellCounts}"
            if (!lossy && (got.churn != want.churn ||
                got.tombs != want.tombs ||
                got.appends != want.appends))
              errs += s"$label: odometers " +
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

  test("a mid-swap crash (compact or rebuild) leaves the previous " +
      "store servable via heal-at-load, and re-running converges") {
    val dir = tmp()
    IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    IvfPqStore.append(dir, asBatch(b1))
    val before = capture(dir)
    // crash between the two renames: live parked, fresh never in
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".old"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".rebuilding"))
    assert(capture(dir) == before,
      "load must heal the parked store after a mid-swap crash")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + ".old")))
    val st = IvfPqStore.compact(spark, dir)
    assert(st.appends == 0L)
    assert(rowSet(st) == before.rows)
    // cleanup crash: stale park beside a complete live store → drop
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + ".old"))
    assert(rowSet(IvfPqStore.load(spark, dir)) == before.rows)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir + ".old")))
  }
}
