package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: points against intervals without a theta join.
  *
  * Spark plans `p JOIN i ON p.v BETWEEN i.lo AND i.hi` as a broadcast
  * nested loop (or worse, a cartesian product) — O(|P|·|I|) work that
  * dies long before 100 TB. Binning fixes the asymptotics: a point
  * belongs to exactly one fixed-width bin, an interval is exploded to
  * the bins it overlaps, and the join becomes a hash equi-join on the
  * bin id with the exact range predicate re-checked after the match.
  * Work drops to O(|P| + |I|·bins-per-interval + matches), one
  * ordinary shuffle (or a broadcast when the exploded interval side is
  * small). Each (point, interval) pair can only meet in the point's
  * single bin, so no dedup pass is needed.
  *
  * `binWidth` trades interval replication against candidate
  * selectivity; a width near the median interval length keeps
  * replication ≈2× while most bin matches pass the exact check.
  */
object RangeJoin {

  /** Inner join of `points` rows to every `intervals` row whose
    * `[lo, hi]` (inclusive) contains the point's `valueCol`.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__bin"
    val p = points.withColumn(bin,
      floor(col(valueCol) / binWidth).cast("long"))
    val i = intervals
      .withColumn(bin, explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, p(bin) === i(bin) &&
        col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop(bin)
  }

  /** Keyed integer variant: join `points` rows to every `intervals`
    * row with the same `keyCols` whose `[lo, hi)` (half-open — the
    * event-time convention) contains the point's `valueCol`. The bin
    * id joins as part of a COMPOSITE key (key..., bin), so a hot key's
    * candidates still split across its bins — the q54 attribution
    * shape (touches ⋈ purchase lookback windows per user). An
    * interval explodes to `(hi - lo) / binWidth + 1` bins worst case;
    * size `binWidth` near the interval length for ≤ 2 bins per
    * interval. The exact predicate re-checks after the bin match, and
    * a pair can only meet in the point's single bin — no dedup pass.
    */
  def pointInIntervalKeyed(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "__bin"
    val p = points.withColumn(bin,
      floor(col(valueCol) / binWidth).cast("long"))
    val i = intervals
      .withColumn(bin, explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, (keyCols :+ bin).toSeq)
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop(bin)
  }
}
