package graft

import graft.operators.SemanticDedup
import graft.streaming.StreamingSemanticDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantic admission gate: flags must match the batch
  * SRP-band candidate stage over the same corpus (cross-batch), state
  * must stay linear in admitted vectors, and the emitted hamming must
  * be the exact owner-vs-arrival signature distance.
  */
class StreamingSemanticDedupSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def corpus(): Seq[(Long, Seq[Float])] = {
    val session = spark
    import session.implicits._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
  }

  test("identical vectors: the later arrival flags on all 4 bands with " +
      "hamming 0, and replaying the owner is not a self-collision") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val v = (1 to 64).map(i => (i % 7).toFloat / 7f)
    val w = (1 to 64).map(i => ((i % 5) - 2).toFloat) // distinct vector
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamingSemanticDedup
      .gate(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sem_flags").start()
    try {
      input.addData(1L -> v, 2L -> w)
      query.processAllAvailable()
      assert(spark.table("sem_flags").count() == 0) // both novel

      input.addData(3L -> v) // exact copy of 1, later batch
      query.processAllAvailable()
      val flags = spark.table("sem_flags")
        .select("vec_id", "band", "dup_of", "hamming")
        .as[(Long, Int, Long, Int)].collect().toSet
      assert(flags == (0 until 4).map(b => (3L, b, 1L, 0)).toSet,
        s"got $flags")

      input.addData(1L -> v) // replayed owner: no self-collision
      query.processAllAvailable()
      assert(spark.table("sem_flags")
        .filter(col("vec_id") === 1L).count() == 0)
    } finally query.stop()
  }

  test("cross-batch flag set matches the batch SRP band-collision " +
      "candidates over the same corpus, with exact owner hamming") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = corpus()
    val (wave1, wave2) = all.partition(_._1 < 250)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamingSemanticDedup
      .gate(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sem_parity").start()
    try {
      input.addData(wave1: _*)
      query.processAllAvailable()
      input.addData(wave2: _*)
      query.processAllAvailable()

      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      // maxHamming=32 disables the distance filter: pure band
      // collisions — the stage the streaming gate mirrors
      val batchFlagged = SemanticDedup
        .candidatePairs(emb, maxHamming = 32)
        .select("vec_b").distinct().as[Long].collect().toSet
      val streamed = spark.table("sem_parity")
        .select("vec_id").distinct().as[Long].collect().toSet
      assert(streamed == batchFlagged,
        s"stream-only=${streamed -- batchFlagged} " +
          s"batch-only=${batchFlagged -- streamed}")

      // id-ordered arrival ⇒ every bucket's owner is its minimum vec
      // id; the flag's hamming is the exact signature distance to it
      val sig = SemanticDedup.signatures(emb)
        .as[(Long, Long)].collect().toMap
      val owners = StreamingSemanticDedup.bandRows(emb)
        .groupBy("band", "bv").agg(min("vec_id").as("owner"))
        .as[(Int, Int, Long)].collect()
        .map { case (b, v, o) => (b, v) -> o }.toMap
      spark.table("sem_parity")
        .select("vec_id", "band", "bv", "dup_of", "hamming")
        .as[(Long, Int, Int, Long, Int)].collect().foreach {
          case (vec, band, bv, dupOf, ham) =>
            assert(owners((band, bv)) == dupOf,
              s"bucket ($band,$bv): owner ${owners((band, bv))} != $dupOf")
            assert(java.lang.Long.bitCount(sig(vec) ^ sig(dupOf)) == ham,
              s"vec $vec vs $dupOf: hamming $ham")
        }
    } finally query.stop()
  }

  test("state is one row per claimed (band, bv) bucket: linear in " +
      "admissions, flat under duplicate-only waves") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    def expectedBuckets(vecs: Seq[(Long, Seq[Float])]): Long =
      StreamingSemanticDedup.bandRows(vecs.toDF("vec_id", "embedding"))
        .select("band", "bv").distinct().count()

    val all = corpus().take(100)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamingSemanticDedup
      .gate(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sem_state").start()
    def stateRows(): Long =
      query.recentProgress.reverse.collectFirst {
        case p if p.stateOperators.nonEmpty =>
          p.stateOperators.map(_.numRowsTotal).sum
      }.getOrElse(-1L)
    try {
      input.addData(all: _*)
      query.processAllAvailable()
      val afterAdmit = stateRows()
      assert(afterAdmit == expectedBuckets(all) &&
        afterAdmit <= 4L * all.size, s"state $afterAdmit")

      // duplicate-only wave (same vectors, new ids): every bucket is
      // already claimed — collisions must add ZERO state
      input.addData(all.map { case (id, v) => (id + 100000L) -> v }: _*)
      query.processAllAvailable()
      assert(stateRows() == afterAdmit,
        s"state grew ${stateRows()} != $afterAdmit on duplicates")
    } finally query.stop()
  }
}
