package graft

import graft.operators.PqIndex
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: deterministic training, in-range encoding,
  * the native ADC expression agreeing with a naive reference, and
  * recall of the ADC-shortlist + exact-rerank pipeline.
  */
class PqIndexSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("training is deterministic: same corpus, same codebooks") {
    val a = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val b = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
    assert(a.m == 8 && a.k == 16 && a.dsub == 8)
  }

  test("codes are in range and zero-norm vectors encode to null") {
    val session = spark
    import session.implicits._
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val coded = PqIndex.encode(emb, "embedding", model)
      .select(col("vec_id"), col("codes"))
    val rows = coded.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16), r)
    }
    // a zero vector has no direction → null codes, never phantom cell 0
    val zero = Seq((1L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    assert(PqIndex.encode(zero, "embedding", model).select("codes")
      .head().isNullAt(0))
  }

  test("encode never clobbers caller columns named like its temporaries") {
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val withClash = emb
      .withColumn("__pq_vn", lit("mine"))
      .withColumn("__unorm", lit(7))
    val out = PqIndex.encode(withClash, "embedding", model)
    assert(out.columns.contains("__pq_vn") && out.columns.contains("__unorm"))
    val r = out.select("__pq_vn", "__unorm").head()
    assert(r.getString(0) == "mine" && r.getInt(1) == 7)
  }

  test("the native ADC expression matches a naive Scala reference") {
    val session = spark
    import session.implicits._
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"),
        PqIndex.normalizedVec(col("embedding")).as("qn"))
    val c = PqIndex.encode(emb.filter(col("vec_id") < 20), "embedding", model)
      .select(col("vec_id").as("n_id"), col("codes"))
    val got = broadcast(q).crossJoin(c)
      .withColumn("adc", PqIndex.adcDistance(col("qn"), col("codes"), model))
      .select("q_id", "n_id", "qn", "codes", "adc")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val qn = r.getSeq[Double](2)
      val codes = r.getSeq[Int](3)
      val naive = (0 until 8).map { s =>
        val cent = model.codebooks(s)(codes(s))
        (0 until 8).map { j =>
          val d = qn(s * 8 + j) - cent(j); d * d
        }.sum
      }.sum
      assert(math.abs(r.getDouble(4) - naive) < 1e-12,
        s"ADC ${r.getDouble(4)} != naive $naive")
    }
  }

  test("a vector's ADC distance to its own codes beats almost all others") {
    val model = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val coded = PqIndex.encode(emb, "embedding", model)
      .select(col("vec_id").as("n_id"), col("codes"))
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"),
        PqIndex.normalizedVec(col("embedding")).as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    val selfRank = broadcast(q).crossJoin(coded)
      .withColumn("adc", PqIndex.adcDistance(col("qn"), col("codes"), model))
      .withColumn("rk", row_number().over(w))
      .filter(col("q_id") === col("n_id"))
      .agg(max("rk")).head().getInt(0)
    // quantization noise can push self off exact rank 1, but it must
    // stay in the extreme head of a 500-vector corpus
    assert(selfRank <= 10, s"worst self-rank $selfRank")
  }

  test("ADC shortlist + exact rerank recovers most exact top-5 " +
      "neighbors (calibration for the s9 contract)") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      // same sampleLimit as the s9 query — calibration must measure
      // the codebooks the query actually trains
      val model = PqIndex.train(e, "vec_id", "embedding", m = 8, k = 16,
        iters = 3, sampleLimit = 20000)
      val coded = PqIndex.encode(e, "embedding", model)
        .select(col("vec_id").as("n_id"), col("codes"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          PqIndex.normalizedVec(col("embedding")).as("qn"))
      val wAdc = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
      val short50 = broadcast(q).crossJoin(coded)
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("adc", PqIndex.adcDistance(col("qn"), col("codes"), model))
        .withColumn("rk", row_number().over(wAdc))
        .filter(col("rk") <= 50)
        .select("q_id", "n_id")
      // exact rerank on the 500-row shortlist
      val vecs = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
      val qv = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val wSim = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val rerank5 = short50.join(vecs, Seq("n_id")).join(broadcast(qv), Seq("q_id"))
        .withColumn("sim",
          graft.functions.VectorExprs.cosine_similarity(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wSim))
        .filter(col("rk") <= 5)
        .select("q_id", "n_id")
      val exact5 = broadcast(qv).crossJoin(vecs)
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          graft.functions.VectorExprs.cosine_similarity(col("qv"), col("nv")))
        .withColumn("rk", row_number().over(wSim))
        .filter(col("rk") <= 5)
        .select("q_id", "n_id")
      val hits = exact5.join(rerank5, Seq("q_id", "n_id"), "left_semi").count()
      info(s"$sf: rerank recall@5 = $hits/50")
      assert(hits >= 25, s"$sf: rerank recall $hits/50 below half")
    }
  }
}
