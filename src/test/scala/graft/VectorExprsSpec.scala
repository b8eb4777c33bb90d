package graft

import graft.functions.VectorExprs.cosine_similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Specs for the native cosine-similarity Catalyst expression: value
  * parity with the higher-order-function formulation (bit-for-bit),
  * null propagation, type checking, and codegen viability on real
  * embedding data.
  */
class VectorExprsSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("qv", ArrayType(FloatType)),
    StructField("nv", ArrayType(FloatType))))

  private val hof = expr(
    """aggregate(zip_with(qv, nv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 0D, (acc, v) -> acc + v)
       / (sqrt(aggregate(qv, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
          * sqrt(aggregate(nv, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""")

  test("matches a hand-computed cosine") {
    val in = df(schema, Row(Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f)))
    val got = in.select(cosine_similarity(col("qv"), col("nv")).as("s"))
      .collect()(0).getDouble(0)
    assert(math.abs(got - 10.0 / 14.0) < 1e-12)
  }

  test("bit-identical to the zip_with/aggregate formulation on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.limit(20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .crossJoin(emb.limit(20)
        .select(col("vec_id").as("n_id"), col("embedding").as("nv")))
    val diffs = pairs
      .select(cosine_similarity(col("qv"), col("nv")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("null input propagates to null output") {
    val in = df(schema, Row(null, Seq(1.0f)), Row(Seq(1.0f), null))
    val got = in.select(cosine_similarity(col("qv"), col("nv")).as("s")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("a null ELEMENT propagates to null, like the HOF formulation") {
    val in = df(schema, Row(Seq(1.0f, null), Seq(1.0f, 2.0f)))
    val native = in.select(cosine_similarity(col("qv"), col("nv"))).collect()
    assert(native(0).isNullAt(0),
      "null element must not silently read as 0.0")
    val viaHof = in.select(hof.as("s")).collect()
    assert(viaHof(0).isNullAt(0), "HOF reference disagrees")
  }

  test("nearest_cell yields null for empty or null-element centroids") {
    import graft.functions.VectorExprs.nearest_cell
    val in = df(
      StructType(Seq(StructField("v", ArrayType(FloatType)))),
      Row(Seq(1.0f, 0.0f)))
    val empty = in.select(
      nearest_cell(col("v"), expr("array()").cast(
        ArrayType(ArrayType(DoubleType))))).collect()
    assert(empty(0).isNullAt(0), "empty centroid set must not yield cell 0")
    val withNull = in.select(
      nearest_cell(col("v"),
        expr("array(array(1.0D, 0.0D), NULL)"))).collect()
    assert(withNull(0).isNullAt(0), "null centroid must not NPE or bucket")
  }

  test("non-float-array input fails analysis") {
    val bad = spark.range(1).select(col("id").as("qv"), col("id").as("nv"))
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(cosine_similarity(col("qv"), col("nv"))).collect()
    }
  }
}
