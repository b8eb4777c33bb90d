package graft

import graft.operators.VectorQuantize
import org.apache.spark.sql.functions._

/** Int8 quantization: exact codes on planted vectors, the
  * reconstruction-error bound the scheme guarantees, and the edge
  * cases (zero vector, negative saturation).
  */
class VectorQuantizeSpec extends SparkSpecBase {

  private def emb(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("planted vectors quantize to the exact expected codes") {
    val out = VectorQuantize.int8(emb(
        (1L, Array(1.0f, 0.5f, -1.0f, 0.0f)),
        (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
        (3L, Array(-2.0f, 1.0f, 0.25f, 0.5f))))
      .select("vec_id", "scale", "q").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Long](2).toList))
      .toMap
    // 1.0→127, 0.5→floor(63.5+0.5)=64, -1.0→floor(-127+0.5)=-127
    assert(out(1L) == (1.0, List(127L, 64L, -127L, 0L)))
    assert(out(2L) == (0.0, List(0L, 0L, 0L, 0L)))
    // scale 2: -2→-127, 1→floor(63.5+0.5)=64, 0.25→floor(15.875+0.5)=16,
    // 0.5→floor(31.75+0.5)=32
    assert(out(3L) == (2.0, List(-127L, 64L, 16L, 32L)))
  }

  test("reconstruction error is bounded by scale/254 on the corpus") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = VectorQuantize.dequantize(VectorQuantize.int8(emb))
      .withColumn("err", expr(
        """array_max(transform(
             zip_with(embedding, dequantized,
               (a, b) -> abs(CAST(a AS DOUBLE) - b)), e -> e))"""))
      .filter(col("err") > col("scale") / 254.0 + 1e-12)
      .count()
    assert(bad == 0L, s"$bad vectors exceed the error bound")
  }

  test("codes stay in the int8 range") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val outOfRange = VectorQuantize.int8(emb)
      .withColumn("mx", expr("array_max(transform(q, x -> abs(x)))"))
      .filter(col("mx") > 127).count()
    assert(outOfRange == 0L)
  }
}
