package graft.queries

/** Cross-engine EXACT integer ratio helpers — one definition for both
  * the Spark expression and its DuckDB oracle twin, so the two engines
  * can never branch differently on the same row.
  *
  * The ppm problem (round-13 ADVICE, refining the q82 lesson): the
  * textbook `num * 1000000 div den` overflows int64 once `num`
  * outgrows ~9.2e12 (the 100 TB token/revenue regime), while the
  * overflow-safe `num div (den div 1e6)` is APPROXIMATE — for totals
  * in [1e6, ~1e8] the truncated divisor inflates the result by up to
  * 2×, and below 1e6 it returns the raw numerator. Branching on the
  * NUMERATOR gives exactness everywhere either form is representable:
  * multiply-first is exact and overflow-free for every `num ≤ 9e12`
  * (9e12·1e6 < 2^63 ≈ 9.22e18), and above that bound `den ≥ num > 9e12`
  * makes the div-first divisor's relative truncation error < 1.2e-7 —
  * below one ppm unit. Both branches are integer-only, so Spark and
  * DuckDB agree bit-for-bit on every row.
  */
object ExactMath {

  /** int64 bound under which `num * 1_000_000` cannot overflow. */
  val MulFirstBound = 9000000000000L

  /** Spark SQL expression: parts-per-million ratio of `num` to `den`
    * (both non-negative int64 expressions, `den >= 1`; `num > den` —
    * ratios above 1, e.g. tokenizer fertility — is fully supported).
    * EXACT whenever `num <= MulFirstBound` (the multiply-first
    * branch), for ANY den. Past the bound the div-first branch
    * truncates the divisor to whole millions; its relative error is
    * bounded by one part in `floor(den/1e6)` — `< 1.2e-7` whenever
    * `den > 9e12` (in particular always when `num <= den`), and for a
    * ratio-style caller with `num > 9e12 > den` still `< ρ·1.2e-7`
    * at ratio `ρ = num/den` (because `den > num/ρ > 9e12/ρ`): the
    * error grows with the ratio (round-15 ADVICE), to at most
    * `0.12·ρ²` absolute ppm units on a result of `ρ·1e6` units —
    * e.g. ≤ 12 units on a fertility-like ratio of 10, relative error
    * ~1e-6. Both branches are integer-only and
    * mirrored in [[ppmSql]], so the two engines agree bit-for-bit on
    * every row regardless. The operands are parenthesized on
    * splice so a compound caller expression ("a - b") binds as a unit
    * (round-14 ADVICE); note `num` is still interpolated into BOTH
    * branches — a caller whose numerator is an expensive aggregate
    * should project it to a column first rather than pay the
    * re-evaluation.
    */
  def ppmExpr(num: String, den: String): String =
    s"""CASE WHEN ($num) <= ${MulFirstBound}L
          THEN ($num) * 1000000L div ($den)
          ELSE ($num) div greatest(($den) div 1000000L, 1L) END"""

  /** DuckDB twin of [[ppmExpr]] — identical branch, identical math. */
  def ppmSql(num: String, den: String): String =
    s"""CASE WHEN ($num) <= $MulFirstBound
          THEN ($num) * 1000000 // ($den)
          ELSE ($num) // greatest(($den) // 1000000, 1) END"""
}
