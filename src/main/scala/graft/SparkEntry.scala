package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val registry: Seq[Map[String, (RefQueries.Fn, Option[String])]] =
    Seq(RefQueries.entries, AnalyticsQueries.entries,
      TextQueries.entries, SimilarityQueries.entries,
      MultimodalQueries.entries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.completeFlights(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.flatten.map { case (k, (fn, _)) => k -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatten.collect { case (k, (_, Some(sql))) => k -> sql }.toMap

  /** Why an oracle-less query would be rows-only. EMPTY since round 7:
    * the four approximate-by-construction queries (HLL q15, approx
    * percentiles q26, IVF s5, Misra-Gries t9) now emit deterministic
    * ACCURACY-CONTRACT outputs — exact values both engines compute
    * plus a pinned error-band/bracket/containment/recall-floor column
    * derived from the live sketch/index — so every query carries a
    * full rows+schema+hash oracle. The map stays so Verify keeps
    * printing rationales if a future approximate query can't be
    * contract-gated.
    */
  def noOracleRationale: Map[String, String] = Map.empty
}
