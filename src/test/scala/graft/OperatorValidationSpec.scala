package graft

import graft.operators.{AsOfJoin, IvfIndex, RangeJoin, SaltedJoin}

/** Misuse of the operator APIs fails fast with a clear message, not
  * deep inside a Spark job.
  */
class OperatorValidationSpec extends SparkSpecBase {

  private lazy val df = {
    import spark.implicits._
    Seq((1L, 2L, 3.0)).toDF("a", "b", "v")
  }

  test("salted join rejects a single bucket") {
    intercept[IllegalArgumentException] {
      SaltedJoin.inner(df, df, "a", "b", Seq("v"), buckets = 1)
    }
  }

  test("range join rejects non-positive bin widths") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, df, "v", "a", "b", binWidth = 0.0)
    }
  }

  test("IVF training rejects k larger than the corpus and bad probes") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("id", "vec")
    intercept[IllegalArgumentException] {
      IvfIndex.train(emb, "id", "vec", k = 5, iters = 1)
    }
    val m = IvfIndex.train(emb, "id", "vec", k = 2, iters = 1)
    intercept[IllegalArgumentException] {
      IvfIndex.probe(emb, "vec", m, nprobe = 3)
    }
  }

  test("IVF training excludes zero vectors and rejects ragged lengths") {
    import spark.implicits._
    // a zero vector has no direction — silently normalizing it would
    // null-poison seeds and Lloyd sums; training must ignore it and
    // still produce unit-norm centroids
    val withZero = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f)))
      .toDF("id", "vec")
    val m = IvfIndex.train(withZero, "id", "vec", k = 2, iters = 2)
    m.centroids.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"non-unit centroid: $norm")
    }
    val ragged = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f)))
      .toDF("id", "vec")
    intercept[IllegalArgumentException] {
      IvfIndex.train(ragged, "id", "vec", k = 1, iters = 1)
    }
  }

  test("PageRank rejects a non-positive checkpoint interval") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "t")
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.run(e, "s", "t", checkpointEvery = 0)
    }
  }

  test("the connector sink and batch inference reject non-positive batch sizes") {
    val session = spark
    import session.implicits._
    val flights = spark.createDataset(Seq.empty[Flight])
    intercept[IllegalArgumentException] {
      graft.sources.TimeSeriesSink.writeFlights(
        flights, new InMemoryStore("no-run"), batchSize = 0)
    }
    val media = spark.createDataset(
      Seq.empty[graft.multimodal.MediaPipeline.MediaFile])
    intercept[IllegalArgumentException] {
      graft.multimodal.MediaPipeline.batchInference(media, batchSize = -1)
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.MediaPipeline.sampleFrames(media, frameBytes = 0)
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.MediaPipeline.resize(media, stride = 0)
    }
  }

  test("every oracle-less query has an explicit rationale — and only " +
      "oracle-less queries do") {
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.noOracleRationale.keySet == noOracle,
      s"rationale keys must exactly cover the oracle-less set; " +
        s"missing=${noOracle -- SparkEntry.noOracleRationale.keySet} " +
        s"stale=${SparkEntry.noOracleRationale.keySet -- noOracle}")
  }

  test("as-of joins reject value collisions and missing/mismatched columns") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(df, df, "a", "b", Seq("v")) // v exists on left
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoinNative(df, df, "a", "b", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoinNative(
        df, df.selectExpr("a", "b", "v AS w"), "a", "nope", Seq("w"))
    }
  }

  test("BPE training rejects a non-positive round budget") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.operators.Bpe.train(docs, "text", rounds = 0)
    }
  }

  test("RFM segmentation rejects bucket counts outside 2..9") {
    import spark.implicits._
    val act = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1L))
      .toDF("cust", "od", "cents")
    val grp = Seq((1L, "g")).toDF("cust", "grp")
    intercept[IllegalArgumentException] {
      graft.operators.Segments.rfm(act, "cust", "od", "cents",
        grp, "grp", buckets = 1)
    }
  }

  test("association-rule mining rejects a non-positive support") {
    import spark.implicits._
    val b = Seq((1L, "x")).toDF("ok", "item")
    intercept[IllegalArgumentException] {
      graft.operators.AssocRules.mine(b, "ok", "item", minPairSupport = 0L)
    }
  }
}
