package graft

import org.apache.spark.sql.Row
import graft.operators.Segments

/** RFM segmentation: hand-computed goldens for the quantile scoring
  * (ntile's larger-buckets-first split), per-group isolation, and the
  * recency anchor. q57's DuckDB oracle pins the same derivation
  * cross-engine at corpus scale.
  */
class SegmentsSpec extends SparkSpecBase {

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scores quantile within each group and compose the 3-digit " +
      "segment; recency anchors on the CORPUS max date") {
    val session = spark
    import session.implicits._
    // group g: customers 1..4 — one order each, amounts 10<20<30<40,
    // dates strictly newer with the customer id. ntile(2) over 4 rows
    // splits 2/2.
    val act = Seq(
      (1L, "2024-01-01", 10L), (2L, "2024-01-02", 20L),
      (3L, "2024-01-03", 30L), (4L, "2024-01-04", 40L),
      // group h: one customer, older than everything in g — its
      // scores must come from h's own window (all ntile=1), and its
      // recency must anchor on the GLOBAL max (2024-01-04), not h's
      (9L, "2023-12-31", 5L))
      .map { case (c, dt, m) => (c, d(dt), m) }
      .toDF("cust", "od", "cents")
    val groups = Seq((1L, "g"), (2L, "g"), (3L, "g"), (4L, "g"),
      (9L, "h")).toDF("cust", "grp")
    val got = Segments.rfm(act, "cust", "od", "cents", groups, "grp",
        buckets = 2)
      .select("cust", "recency_days", "r_score", "f_score", "m_score",
        "segment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    // recency_days from 2024-01-04: c1=3, c2=2, c3=1, c4=0, c9=4.
    // r orders by recency_days DESC (worst first): c1,c2 → 1; c3,c4 → 2.
    // f all equal → order falls to cust key: c1,c2 → 1; c3,c4 → 2.
    // m orders by cents: c1,c2 → 1; c3,c4 → 2.
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 1L, 1L, 111L),
      (2L, 2L, 1L, 1L, 1L, 111L),
      (3L, 1L, 2L, 2L, 2L, 222L),
      (4L, 0L, 2L, 2L, 2L, 222L),
      (9L, 4L, 1L, 1L, 1L, 111L)))
  }

  test("frequency and monetary aggregate per customer before scoring; " +
      "ntile splits larger buckets first on non-divisible groups") {
    val session = spark
    import session.implicits._
    // customer 1 orders twice (f=2, m=15), customers 2 and 3 once —
    // 3 rows into ntile(2) → buckets of size 2,1 (larger first)
    val act = Seq(
      (1L, d("2024-01-01"), 10L), (1L, d("2024-01-02"), 5L),
      (2L, d("2024-01-03"), 50L), (3L, d("2024-01-04"), 1L))
      .toDF("cust", "od", "cents")
    val groups = Seq((1L, "g"), (2L, "g"), (3L, "g")).toDF("cust", "grp")
    val got = Segments.rfm(act, "cust", "od", "cents", groups, "grp",
        buckets = 2)
      .select("cust", "f", "m_cents", "f_score", "m_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // f ordering (f, cust): c2(1),c3(1),c1(2) → buckets 1,1,2
    // m ordering (m_cents, cust): c3(1),c1(15),c2(50) → buckets 1,1,2
    assert(got.toSeq == Seq(
      (1L, 2L, 15L, 2L, 1L),
      (2L, 1L, 50L, 1L, 2L),
      (3L, 1L, 1L, 1L, 1L)))
  }

  test("bucket bounds are validated") {
    val session = spark
    import session.implicits._
    val act = Seq((1L, d("2024-01-01"), 1L)).toDF("cust", "od", "cents")
    val groups = Seq((1L, "g")).toDF("cust", "grp")
    intercept[IllegalArgumentException] {
      Segments.rfm(act, "cust", "od", "cents", groups, "grp", buckets = 10)
    }
    intercept[IllegalArgumentException] {
      Segments.rfm(act, "cust", "od", "cents", groups, "grp", buckets = 1)
    }
  }
}
