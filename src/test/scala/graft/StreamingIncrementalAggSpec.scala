package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Streaming twin of q45's MV maintenance: micro-batches arrive via
  * foreachBatch, each batch is summarized ALONE (IncrementalAgg
  * .partial over just the batch — never the history) and merged into
  * the running MV. After any sequence of batches the MV must equal
  * the one-shot aggregate over everything ingested — the same merge
  * law q45's oracle pins cross-engine, here pinned across the
  * streaming ingestion path (the form a 100 TB pipeline actually
  * runs: per-batch shuffle is batch-group-cardinality, the MV merge
  * is group-cardinality, history is never rescanned).
  */
class StreamingIncrementalAggSpec extends SparkSpecBase {

  private val keys = Seq("k")

  test("foreachBatch-merged MV equals the full aggregate after every batch") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(String, Long)]
    // the running MV: None until the first batch lands
    var mv: Option[DataFrame] = None
    var ingested: List[(String, Long)] = Nil

    val query = input.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val part = IncrementalAgg.partial(batch, keys, "v")
        // localCheckpoint: the MV must not re-derive prior batches'
        // lineage on every merge (the whole point of maintenance)
        mv = Some(mv.fold(part)(prior =>
          IncrementalAgg.merge(Seq(prior, part), keys)).localCheckpoint(true))
        ()
      }
      .start()

    def assertMvEqualsFull(): Unit = {
      val got = mv.get.collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val want = ingested.groupBy(_._1).map { case (k, vs) =>
        val xs = vs.map(_._2)
        k -> ((xs.size.toLong, xs.sum, xs.min, xs.max))
      }
      assert(got == want)
    }

    try {
      val b0 = List("x" -> 5L, "x" -> -3L, "y" -> 7L)
      input.addData(b0: _*); query.processAllAvailable()
      ingested ++= b0
      assertMvEqualsFull()

      val b1 = List("x" -> 10L, "z" -> 4L) // overlap + brand-new group
      input.addData(b1: _*); query.processAllAvailable()
      ingested ++= b1
      assertMvEqualsFull()

      val b2 = List("y" -> -100L, "z" -> 4L, "z" -> 9L)
      input.addData(b2: _*); query.processAllAvailable()
      ingested ++= b2
      assertMvEqualsFull()
    } finally query.stop()
  }
}
