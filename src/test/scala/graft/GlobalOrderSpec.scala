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

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))

  test("AutoSalts ships the FLAT plan when the heaviest key fits one " +
      "task — no second shuffle paid where flat is provably safe") {
    val session = spark
    import session.implicits._
    val rows = (1L to 300L).map(i => (i % 3, i)).toDF("k", "id")
    val auto = GlobalOrder.enumerate(rows, "k", "id",
      salts = GlobalOrder.AutoSalts)
    val flat = GlobalOrder.enumerate(rows, "k", "id")
    // identical physical shape: auto chose salts=1
    assert(exchanges(auto) == exchanges(flat),
      "auto under the threshold must match the flat plan's shuffles")
    val salted = GlobalOrder.enumerate(rows, "k", "id", salts = 4)
    assert(exchanges(salted) > exchanges(flat),
      "sanity: the salted plan really does carry extra shuffles")
    // and positions are the global row_number either way
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(1)))
      .zip(auto.collect().map(_.getAs[Long]("pos"))).toMap
    assert(got.size == 300)
  }

  test("AutoSalts ESCALATES when the heaviest key exceeds " +
      "maxRowsPerKey: the same input that fails flat passes auto, " +
      "with positions still the global row_number") {
    val session = spark
    import session.implicits._
    val rows = (1L to 1000L).map(i => (i % 2, i)).toDF("k", "id")
    intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "id", maxRowsPerKey = 100L)
    }
    val auto = GlobalOrder.enumerate(rows, "k", "id",
      maxRowsPerKey = 100L, salts = GlobalOrder.AutoSalts)
    val want = rows
      .withColumn("want", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("id"))).cast("long") - 1L)
    val joined = auto.join(want, Seq("k", "id"))
    assert(joined.filter(col("pos") =!= col("want")).count() == 0L)
  }

  test("AutoSalts with a non-numeric tie: flat when safe, a named " +
      "error when escalation would be needed") {
    val session = spark
    import session.implicits._
    val small = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tie")
    assert(GlobalOrder.enumerate(small, "k", "tie",
      salts = GlobalOrder.AutoSalts).count() == 3L)
    val heavy = (1L to 50L).map(i => (1L, f"t$i%03d")).toDF("k", "tie")
    val ex = intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(heavy, "k", "tie",
        maxRowsPerKey = 10L, salts = GlobalOrder.AutoSalts)
    }
    assert(ex.getMessage.contains("auto-salting needs a numeric"))
  }

  test("the salted sub-key broadcast table is gated against the " +
      "caller's OWN maxKeys — no silent 10M floor") {
    val session = spark
    import session.implicits._
    // 6 keys x 4 salts = 24 sub-keys > maxKeys=10 even though the
    // 6 keys themselves pass the cardinality gate
    val rows = (1L to 60L).map(i => (i % 6, i)).toDF("k", "id")
    val ex = intercept[IllegalArgumentException] {
      GlobalOrder.enumerate(rows, "k", "id", maxKeys = 10L, salts = 4)
    }
    assert(ex.getMessage.contains("sub-keys exceed maxKeys"))
  }
}
