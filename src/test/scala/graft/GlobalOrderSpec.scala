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

  test("salted positions are EXACTLY the flat positions — bucketing " +
      "moves load balance, never order") {
    val session = spark
    import session.implicits._
    // coarse key domain, skewed key sizes, non-uniform tie values
    // (squares — so range buckets are deliberately uneven)
    val rows = ((1L to 400L).map(i => (1L, i * i)) ++
      (1L to 40L).map(i => (2L, 1000000L - i)) ++
      Seq((3L, 7L))).toDF("k", "id").repartition(8)
    val flatPos = GlobalOrder.enumerate(rows, "k", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("pos")).toMap
    for (salts <- Seq(2, 7, 16)) {
      val saltedPos = GlobalOrder
        .enumerate(rows, "k", "id", salts = salts)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("pos")).toMap
      assert(saltedPos == flatPos, s"salts=$salts diverged")
    }
  }

  test("the two-level scheme removes the per-key single-task ceiling: " +
      "a coarse key domain that FAILS the flat gate passes salted, " +
      "with the per-task bound enforced per (key, salt) bucket") {
    val session = spark
    import session.implicits._
    // 2 keys x 500 rows: flat phase-2 would sort 500 rows in one task
    val rows = (1L to 1000L).map(i => (i % 2, i)).toDF("k", "id")
    intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "id", maxRowsPerKey = 100L)
    }
    // salted into 8 tie-range buckets: heaviest (key, salt) task holds
    // ~500/8 rows — inside the same bound the flat plan failed
    val got = GlobalOrder.enumerate(rows, "k", "id",
      maxRowsPerKey = 100L, salts = 8)
    assert(got.count() == 1000L)
    // positions still equal the global row_number
    val want = rows
      .withColumn("want", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("id"))).cast("long") - 1L)
    val joined = got.join(want, Seq("k", "id"))
    assert(joined.filter(col("pos") =!= col("want")).count() == 0L)
  }

  test("tie-value CONCENTRATION trips the salted gate loudly — range " +
      "buckets cannot split a narrow value cluster") {
    val session = spark
    import session.implicits._
    // one key: 500 ties packed into [0, 500), one outlier at 1e12 —
    // every packed tie lands in bucket 0 regardless of salts
    val rows = ((1L to 500L).map(i => (1L, i)) ++ Seq((1L, 1000000000000L)))
      .toDF("k", "id")
    val ex = intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "id",
        maxRowsPerKey = 100L, salts = 8)
    }
    assert(ex.getMessage.contains("tie values concentrate"))
  }

  test("salts > 1 with a non-numeric tie fails with a named error") {
    val session = spark
    import session.implicits._
    val rows = Seq((1L, "a"), (1L, "b")).toDF("k", "tie")
    val ex = intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "tie", salts = 4)
    }
    assert(ex.getMessage.contains("needs a numeric"))
  }
}
