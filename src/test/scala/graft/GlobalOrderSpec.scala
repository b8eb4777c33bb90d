package graft

import org.apache.spark.sql.functions._
import graft.operators.GlobalOrder

/** GlobalOrder.enumerate must equal a plain global row_number under
  * the same (key, tie) order — including duplicate keys, single-row
  * keys, and a key domain much smaller than the row count — while
  * never sorting the data globally.
  */
class GlobalOrderSpec extends SparkSpecBase {

  test("positions equal the global row_number, contiguous from 0") {
    val session = spark
    import session.implicits._
    // keys with skewed sizes, ties broken by id
    val rows = Seq(
      (3L, 30L), (1L, 11L), (2L, 21L), (1L, 10L), (2L, 22L),
      (1L, 12L), (3L, 31L), (2L, 20L))
      .toDF("k", "id").repartition(4)
    val got = GlobalOrder.enumerate(rows, "k", "id")
      .select("k", "id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val want = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L),
      (2L, 21L), (2L, 22L), (3L, 30L), (3L, 31L))
      .zipWithIndex.map { case ((k, id), i) => (k, id, i.toLong) }
    assert(got.toSeq == want)
  }

  test("agrees with a single-partition row_number on the real corpus " +
      "length keys") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)")
          .as("n_tokens"))
    val got = GlobalOrder.enumerate(docs, "n_tokens", "doc_id")
      .select("doc_id", "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_tokens"), col("doc_id"))).cast("long") - 1L)
      .select("doc_id", "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("a fine-grained key domain fails the maxKeys gate with a " +
      "named error, not an executor OOM") {
    val session = spark
    import session.implicits._
    val rows = (1L to 100L).map(i => (i, i)).toDF("k", "id")
    val ex = intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "id", maxKeys = 10L)
    }
    assert(ex.getMessage.contains("distinct 'k' keys exceed"))
  }

  test("a too-heavy single key fails the maxRowsPerKey gate: per-key " +
      "volume is the single-task sort ceiling, not key cardinality") {
    val session = spark
    import session.implicits._
    // 3 keys pass the cardinality gate, but key 1 carries 50 rows
    val rows = ((1L to 50L).map(i => (1L, i)) ++
      Seq((2L, 51L), (3L, 52L))).toDF("k", "id")
    val ex = intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "id", maxRowsPerKey = 10L)
    }
    assert(ex.getMessage.contains("heaviest 'k' key holds 50"))
    // and the same data passes when the gate admits it
    assert(GlobalOrder.enumerate(rows, "k", "id").count() == 52L)
  }
}
