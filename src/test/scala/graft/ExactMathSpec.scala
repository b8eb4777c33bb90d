package graft

import graft.queries.ExactMath
import org.apache.spark.sql.functions._

/** ExactMath.ppmExpr: exact at every representable scale, branch
  * boundaries included — the round-13 ADVICE contract (multiply-first
  * is EXACT up to the true int64 bound; div-first past it is within
  * one ppm unit relative). The DuckDB twin is exercised by every
  * oracle run of t41/d18/d21/q82; this spec pins the Spark side
  * against BigInt ground truth so the shared formula cannot drift.
  */
class ExactMathSpec extends SparkSpecBase {

  private val B = ExactMath.MulFirstBound

  private def sparkPpm(cases: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val session = spark
    import session.implicits._
    cases.toDF("num", "den")
      .withColumn("ppm", expr(ExactMath.ppmExpr("num", "den")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("multiply-first branch is EXACT for every num <= 9e12 — " +
      "including the bound itself and the sub-1e6-total regime the " +
      "old div-first form got wrong") {
    val cases = Seq[(Long, Long)](
      (0L, 1L), (1L, 3L), (2L, 3L), (499L, 1000L),
      // the old div-first failure modes: totals < 1e6 (raw counts
      // came back) and totals in [1e6, 1e8] (inflated up to 2x)
      (123L, 456L), (250000L, 500000L), (900000L, 1500000L),
      (50000000L, 100000001L),
      // boundary: num == bound exactly, num just under
      (B, B * 2L), (B - 1L, B),
      // big denominators with small numerators
      (7L, 9000000000000000L))
    val got = sparkPpm(cases)
    cases.foreach { case (n, d) =>
      val want = (BigInt(n) * 1000000 / BigInt(d)).toLong
      assert(got((n, d)) == want,
        s"ppm($n, $d): got ${got((n, d))}, want exact $want")
    }
    // spot-check the worst old-form distortion is actually fixed:
    // 900000/1500000 = 60% -> 600000 ppm; div-first gave 900000
    assert(got((900000L, 1500000L)) == 600000L)
  }

  test("div-first branch above the bound never overflows and stays " +
      "within one ppm unit of the exact ratio") {
    val cases = Seq[(Long, Long)](
      (B + 1L, (B + 1L) * 2L),
      (B * 2L, B * 3L),
      (4611686018427387904L, 9223372036854775807L), // 2^62 / (2^63-1)
      (9000000000001L, 9000000000001L))
    val got = sparkPpm(cases)
    cases.foreach { case (n, d) =>
      val exact = BigInt(n) * 1000000 / BigInt(d)
      val v = BigInt(got((n, d)))
      assert((v - exact).abs <= 2,
        s"ppm($n, $d): got $v, exact $exact — drifted past the " +
          "sub-ppm contract")
    }
  }

  test("COMPOUND caller expressions bind as units (round-14 ADVICE): " +
      "'a - b' spliced as the numerator must not re-associate into " +
      "a - (b * 1e6) div den") {
    val session = spark
    import session.implicits._
    // a - b = 600, den = a + b = 1400: exact ppm = 428571
    val got = Seq((1000L, 400L)).toDF("a", "b")
      .withColumn("ppm", expr(ExactMath.ppmExpr("a - b", "a + b")))
      .head().getLong(2)
    assert(got == (BigInt(600) * 1000000 / BigInt(1400)).toLong,
      s"compound splice mis-parenthesized: got $got")
  }
}
