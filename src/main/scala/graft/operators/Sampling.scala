package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling as a DataFrame-first library API — the
  * selection stages of a curation pipeline, all driven by the portable
  * salted hash so a sample is REPRODUCIBLE across runs, engines, and
  * cluster sizes (rand()-based sampling is none of those, and a
  * training-data pipeline that cannot reproduce its sample cannot
  * reproduce its model).
  *
  *   stratified        per-stratum top-n by hash order — every stratum
  *                     represented, WindowGroupLimit prunes the sort
  *                     to n rows per group before the shuffle
  *   weightedPriority  PPS-style: hash/weight priority, smallest n win
  *                     — selection probability ∝ weight, one bounded
  *                     TakeOrdered, no global sort materialization
  *
  * The oracle-verified t6/t15 queries run these exact expressions.
  */
object Sampling {

  /** Up to `perStratum` rows from every combination of `strataCols`,
    * chosen by salted-hash order of `idCol` (deterministic, unbiased
    * within the stratum). Appends `rk` (1-based rank in the stratum).
    */
  def stratified(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String = "doc_id",
      perStratum: Int = 2,
      salt: Int = 3): DataFrame = {
    require(strataCols.nonEmpty, "stratified needs at least one stratum column")
    require(perStratum >= 1, s"perStratum must be positive, got $perStratum")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("__hk"), col(idCol))
    df.withColumn("__hk",
        PortableHash.saltedHash(salt, col(idCol).cast("string")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perStratum)
      .drop("__hk")
  }

  /** The `n` rows with the smallest hash/weight priority — selection
    * probability proportional to `weight` (probability-proportional-
    * to-size without replacement, Ohlsson/Rosén priority sampling
    * shape). A bounded TakeOrdered: no global sort is materialized.
    *
    * Contract: only rows with a non-null, strictly positive weight are
    * eligible. Null weights would otherwise sort nulls-first (always
    * selected), zero would divide to Infinity, and negative weights
    * would invert the priority order — so such rows are filtered out
    * before ranking rather than silently mis-ranked.
    */
  def weightedPriority(
      df: DataFrame,
      weight: Column,
      n: Int,
      idCol: String = "doc_id",
      salt: Int = 6): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    df.filter(weight.isNotNull && weight > lit(0.0))
      .withColumn("__priority",
        PortableHash.saltedHash(salt, col(idCol).cast("string"))
          .cast("double") / weight)
      .orderBy(col("__priority"), col(idCol))
      .limit(n)
      .drop("__priority")
  }
}
