package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IvfPqStore
import graft.streaming.StreamingIvfPqMaintenance

/** The streaming maintenance loop over the persisted IVF-PQ store —
  * [[StreamingIndexMaintenanceSpec]]'s contract on the single-store
  * deployment: a two-wave ingest equals the direct append chain, a
  * fully replayed delivery is a no-op, a partial replay inserts
  * exactly its fresh ids, deletes are idempotent, and the
  * rebuild/compact callbacks fire off the maintained metadata with
  * rebuild subsuming compact.
  */
class StreamingIvfPqMaintenanceSpec extends SparkSpecBase {

  private def emb: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def base = emb.filter(col("vec_id") % 10 < 8)
  private def b1 = emb.filter(col("vec_id") % 10 === 8)
  private def b2 = emb.filter(col("vec_id") % 10 === 9)

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-stream-ivfpq").toString

  private def rows(df: DataFrame): Seq[(Long, Seq[Float])] = {
    val session = spark
    import session.implicits._
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
  }

  private def rowSet(st: IvfPqStore.Store): Set[(Long, Seq[Int], Int)] =
    st.rows.select("vec_id", "codes", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet

  private def ingest(wave: Seq[(Long, Seq[Float])], dir: String,
      ckpt: String): Unit = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    input.addData(wave: _*)
    val q = StreamingIvfPqMaintenance.attach(
      input.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    try q.awaitTermination(120000)
    finally if (q.isActive) q.stop()
  }

  test("two waves through separate maintenance queries equal the " +
      "direct append chain row-for-row; a full redelivery is a " +
      "no-op; a partial replay inserts only its fresh ids") {
    val dir = tmp() + "/store"
    IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    ingest(rows(b1), dir, tmp() + "/ckpt1")
    ingest(rows(b2), dir, tmp() + "/ckpt2")

    // the direct chain over the same batches, separate store
    val refDir = tmp() + "/ref"
    IvfPqStore.build(base, "vec_id", "embedding", refDir, k = 4)
    IvfPqStore.append(refDir,
      b1.select(col("vec_id"), col("embedding").as("vec")))
    val ref = IvfPqStore.append(refDir,
      b2.select(col("vec_id"), col("embedding").as("vec")))

    val streamed = IvfPqStore.load(spark, dir)
    assert(streamed.count == ref.count && streamed.gen == ref.gen &&
      streamed.churn == ref.churn &&
      streamed.appends == ref.appends,
      s"metadata diverged: ${streamed.count}/${streamed.gen} vs " +
        s"${ref.count}/${ref.gen}")
    assert(rowSet(streamed) == rowSet(ref),
      "streamed maintenance diverged from the direct chain")

    // full redelivery through a fresh checkpoint: replay-split no-op
    ingest(rows(b1) ++ rows(b2), dir, tmp() + "/ckpt3")
    val replayed = IvfPqStore.load(spark, dir)
    assert(replayed.count == ref.count && replayed.gen == ref.gen,
      "a fully replayed delivery advanced the store")

    // partial replay: half of b2 again + genuinely new ids
    val freshIds = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 9000000000L).as("vec_id"),
        col("embedding"))
    ingest(rows(b2).take(rows(b2).size / 2) ++ rows(freshIds),
      dir, tmp() + "/ckpt4")
    val afterPartial = IvfPqStore.load(spark, dir)
    assert(afterPartial.count == ref.count + freshIds.count(),
      "partial replay must insert exactly the fresh remainder")
  }

  test("a delete wave equals the direct remove, a redelivered delete " +
      "no-ops, and the callbacks fire: tombstones past the bound " +
      "schedule a compact, churn past the bound a rebuild that " +
      "SUBSUMES it") {
    val session = spark
    import session.implicits._
    val dir = tmp() + "/store"
    IvfPqStore.build(base, "vec_id", "embedding", dir, k = 4)
    var compacts = 0
    var rebuilds = 0
    def erase(ids: Seq[Long]): Unit =
      StreamingIvfPqMaintenance.processRemoveBatch(dir,
        onRebuildNeeded = _ => rebuilds += 1,
        onCompactNeeded = _ => compacts += 1)(ids.toDF("vec_id"), 0L)

    // deleting d of n fires compact-not-rebuild iff d/(n−d) lands in
    // (0.2, 0.3]: base 400 (sf0.001 %10<8), d = 80 → 80/320 = 0.25 —
    // tombs 80 > 64, churn 80 ≤ 96
    val n = base.count()
    val victims = base.select("vec_id").orderBy("vec_id")
      .limit((n * 0.2).toInt).collect().map(_.getLong(0)).toSeq
    erase(victims)
    assert(compacts == 1 && rebuilds == 0,
      s"the delete must schedule a compact: $compacts/$rebuilds")
    val st = IvfPqStore.load(spark, dir)
    assert(st.count == n - victims.size && st.tombs == victims.size)
    assert(st.rows.filter(col("vec_id")
      .isin(victims.map(Long.box): _*)).count() == 0L)

    // redelivered delete: ids not live → no-op, no second callback
    erase(victims)
    val after = IvfPqStore.load(spark, dir)
    assert(after.count == st.count && after.tombs == st.tombs,
      "a redelivered delete advanced the metadata")
    assert(compacts == 1 && rebuilds == 0)

    // push churn past the rebuild bound: the next wave's callback is
    // the rebuild, subsuming the still-pending compact state
    val wave = emb.filter(col("vec_id") % 10 === 8)
    StreamingIvfPqMaintenance.processBatch(dir,
      onRebuildNeeded = _ => rebuilds += 1,
      onCompactNeeded = _ => compacts += 1)(wave, 1L)
    assert(rebuilds == 1 && compacts == 1,
      s"churn past the bound must schedule the rebuild: " +
        s"$compacts/$rebuilds")
    // the scheduled rebuild runs and resets the odometers
    val rebuilt = IvfPqStore.rebuild(spark, dir, k = 4)
    assert(rebuilt.churn == 0L && rebuilt.tombs == 0L &&
      rebuilt.count == st.count + wave.count())
  }
}
