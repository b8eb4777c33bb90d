package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (materialized-view) aggregate maintenance: keep a
  * per-group summary table up to date by merging the summary of a new
  * delta batch into the prior snapshot summary, without ever
  * rescanning history.
  *
  * The state per group is the classic mergeable quadruple
  * (cnt, sum, min, max) — every derived statistic the reference's
  * reporting layer needs (avg = sum/cnt) falls out of it. The algebra:
  *
  *   merge(partial(A), partial(B)) == partial(A ∪ B)
  *
  * holds exactly when the summed measure is integral (LONG): integer
  * addition is associative, so partial aggregation order — Spark's
  * map-side combine, the snapshot/delta split, any merge tree — cannot
  * change the result. Callers quantize money to cents (see
  * q45_incremental_agg) before summing; a double sum here would make
  * the merge law approximate.
  *
  * Scale shape: at 100 TB the snapshot summary IS the stored MV —
  * group-cardinality rows, not history rows. An update scans ONLY the
  * delta (map-side combine → one shuffle by group key over the delta's
  * groups) and then merges two group-cardinality tables (one more
  * small shuffle, or none if both sides are bucketed by the group
  * key). History is never re-read; the full-recompute equivalent scans
  * everything ever ingested. `IncrementalAggSpec` pins the merge law;
  * the q45 oracle pins merge-vs-full-recompute equality cross-engine.
  */
object IncrementalAgg {

  val stateCols: Seq[String] = Seq("cnt", "sum_v", "min_v", "max_v")

  /** Per-group summary of one batch: the partial-aggregate state.
    * `valueCol` must be LONG (see merge law above).
    */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge any number of summaries (snapshot MV + delta partials) into
    * one: counts and sums add, min/max fold. Groups present in only
    * one input pass through unchanged — union + re-aggregate handles
    * both the overlap and the disjoint case in one shuffle whose input
    * is Σ group-cardinalities, never history size.
    */
  def merge(summaries: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(summaries.nonEmpty, "merge of zero summaries")
    summaries.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}
