package graft

import graft.streaming.StreamingKnnIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN-ingest gate: the deduped candidate set (pairs AND
  * exact cosines) must equal the batch SRP-LSH verified pairs over the
  * same corpus — one definition of "a candidate" across the batch
  * index and the stream — with admission respecting arrival order and
  * the state-size cap failing loudly.
  */
class StreamingKnnIngestSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def embRows: Seq[(Long, Seq[Float])] = {
    val session = spark
    import session.implicits._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
  }

  private def runGate(
      waves: Seq[Seq[(Long, Seq[Float])]],
      name: String,
      maxResidents: Int = 256): Seq[(Long, Long, Int, Int, Double)] = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamingKnnIngest
      .gate(input.toDF().toDF("vec_id", "embedding"),
        maxResidents = maxResidents)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      waves.foreach { w =>
        input.addData(w: _*)
        query.processAllAvailable()
      }
      spark.table(name)
        .as[(Long, Long, Int, Int, Double)].collect().toSeq
    } finally query.stop()
  }

  test("deduped streaming candidates — pairs, hamming, AND exact " +
      "cosine — equal the batch SRP-LSH verified pairs; emitted " +
      "scores are bit-identical to the codegen'd batch scorer") {
    val rows = embRows
    val waves = rows.grouped((rows.size + 2) / 3).toSeq
    val got = runGate(waves, "knn_ingest_parity")
    // dedupe multiplicity across bands to unordered pairs
    val streamPairs = got.map { case (v, n, _, h, c) =>
      (math.min(v, n), math.max(v, n)) -> ((h, c))
    }.toMap
    // duplicate band emissions must agree on (hamming, cosine)
    got.groupBy { case (v, n, _, _, _) =>
      (math.min(v, n), math.max(v, n))
    }.foreach { case (p, es) =>
      assert(es.map(e => (e._4, e._5)).distinct.size == 1,
        s"band emissions disagree for $p: $es")
    }
    val batch = graft.operators.SemanticDedup
      .verifiedPairs(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        maxHamming = 16, minCosine = -1.0)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        ((r.getAs[Long]("hamming").toInt, r.getAs[Double]("cosine"))))
      .toMap
    assert(streamPairs.keySet == batch.keySet,
      s"candidate sets differ: stream-only=" +
        s"${(streamPairs.keySet -- batch.keySet).take(5)}, batch-only=" +
        s"${(batch.keySet -- streamPairs.keySet).take(5)}")
    streamPairs.foreach { case (p, (h, c)) =>
      assert(batch(p)._1 == h, s"hamming differs for $p")
      assert(batch(p)._2 == c,
        s"cosine not bit-identical for $p: stream $c vs batch ${batch(p)._2}")
    }
    assert(streamPairs.nonEmpty)
  }

  test("micro-batch boundaries do not change the candidate set") {
    val rows = embRows.take(200)
    val one = runGate(Seq(rows), "knn_ingest_one")
      .map { case (v, n, b, _, _) => (math.min(v, n), math.max(v, n), b) }
      .toSet
    val five = runGate(rows.grouped(40).toSeq, "knn_ingest_five")
      .map { case (v, n, b, _, _) => (math.min(v, n), math.max(v, n), b) }
      .toSet
    assert(one == five)
  }

  test("edges attribute to EARLIER-admitted residents: with id-ordered " +
      "waves every neighbor id precedes the arrival id") {
    val rows = embRows.take(150)
    val got = runGate(rows.grouped(50).toSeq, "knn_ingest_order")
    assert(got.nonEmpty)
    got.foreach { case (v, n, _, _, _) =>
      assert(n < v, s"edge attributes forward: $v -> $n")
    }
  }

  test("a bucket outgrowing maxResidents fails LOUDLY with the named " +
      "error, not silent quadratic state") {
    val rows = embRows.take(120)
    val ex = intercept[Exception] {
      runGate(Seq(rows), "knn_ingest_cap", maxResidents = 3)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("outgrew maxResidents"))),
      s"expected the named cap error, got: $ex")
  }
}
