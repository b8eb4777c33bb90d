package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM customer segmentation as a DataFrame-first library API — the
  * recency/frequency/monetary scoring behind `q57_rfm_segments`
  * (promoted on the Bm25/RangeJoin precedent: one definition per
  * semantics, the oracle query delegating), usable against any
  * (customer, date, amount) activity table.
  *
  * Per customer: days since last activity (vs the corpus max date),
  * activity count, and lifetime integer amount — each quantile-scored
  * 1..`buckets` WITHIN its group and composed into the familiar
  * 3-digit segment (`r·100 + f·10 + m`).
  *
  * Scores are per-GROUP `ntile` — the business framing "relative to
  * the local market", and the scale framing: every rank window
  * partitions by the group key, never a global single-partition sort
  * (a global quantile over 100 TB wants a mergeable-sketch path
  * instead — see q52's KLL). Tie-free by construction: each ordering
  * ends in the customer key, so it is total, and ntile's
  * larger-buckets-first split is the same in Spark and ANSI SQL —
  * every score is engine-exact.
  *
  * Plan shape: one activity aggregate keyed by customer, the group
  * key joined UNHINTED from the (customer-cardinality) dimension —
  * AQE broadcasts it while its file statistics say it fits and
  * shuffles past that; customer grows with the data, so a forced
  * hint would pin an unbounded build side at 100× — the corpus max
  * date a broadcast scalar, then three per-group windows over
  * customer-cardinality rows — the activity table is shuffled once,
  * on the customer key.
  *
  * Amounts are caller-quantized integers (cents, micros — q45's
  * exact-quantizer rule): an exact sum is what keeps the M ordering
  * reproducible across partitionings.
  */
object Segments {

  /** @param activity (custCol, dateCol: date, amountCol: long) — one
    *        row per order/event; amounts pre-quantized to integers
    * @param groups (custCol, groupCol) customer dimension,
    *        customer-cardinality (joined unhinted — AQE sizes it)
    * @param buckets quantile buckets per score, 2..9 (the 3-digit
    *        segment composition needs single-digit scores)
    * @return one row per active customer: (custCol, groupCol,
    *         recency_days, f, m_cents, r_score, f_score, m_score,
    *         segment)
    */
  def rfm(
      activity: DataFrame, custCol: String, dateCol: String,
      amountCol: String, groups: DataFrame, groupCol: String,
      buckets: Int = 5): DataFrame = {
    require(buckets >= 2 && buckets <= 9,
      s"buckets must be in 2..9 for the digit composition: $buckets")
    val a = activity.select(col(custCol), col(dateCol).as("od"),
      col(amountCol).as("cents"))
    val agg = a.groupBy(custCol).agg(
      max("od").as("last_od"),
      count(lit(1)).as("f"),
      sum("cents").as("m_cents"))
    val mx = a.agg(max("od").as("corpus_max"))
    val base = agg
      // UNHINTED: `groups` is customer-cardinality (grows with the
      // data) — AQE broadcasts it from file statistics while it
      // fits and falls back to a shuffle past that; a forced hint
      // would OOM the build side at 100×
      .join(groups.select(col(custCol), col(groupCol)), Seq(custCol))
      .crossJoin(broadcast(mx))
      .withColumn("recency_days",
        datediff(col("corpus_max"), col("last_od")).cast("long"))
      .select(custCol, groupCol, "recency_days", "f", "m_cents")
    def scoreW(order: Column*) =
      Window.partitionBy(groupCol).orderBy(order: _*)
    base
      .withColumn("r_score", ntile(buckets)
        .over(scoreW(col("recency_days").desc, col(custCol))).cast("long"))
      .withColumn("f_score", ntile(buckets)
        .over(scoreW(col("f"), col(custCol))).cast("long"))
      .withColumn("m_score", ntile(buckets)
        .over(scoreW(col("m_cents"), col(custCol))).cast("long"))
      .withColumn("segment",
        expr("r_score * 100 + f_score * 10 + m_score"))
  }
}
