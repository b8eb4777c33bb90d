package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the LATEST right row with
  * `right.ts <= left.ts` on the same key — the standard
  * enrich-with-most-recent-state operator (rates, quotes, config
  * versions) that Spark has no built-in for.
  *
  * Composition instead of a custom physical operator: union both
  * sides, one window pass per key ordered by (ts, side) carrying the
  * last non-null right values forward, keep the left rows. Cost is ONE
  * shuffle on the key + a per-partition sort — same asymptotics as a
  * sort-merge join, no range-condition row explosion (a naive
  * `l JOIN r ON key AND r.ts <= l.ts` + max() grows O(|l|·|r|) per
  * key before aggregation, which dies at scale).
  *
  * At equal timestamps the right row is considered visible to the left
  * row (inclusive <=, matching DuckDB/QuestDB ASOF semantics): right
  * rows sort before left rows at the same instant.
  *
  * Among SEVERAL right rows sharing one (key, ts), the surviving row
  * is unspecified (SQL ASOF leaves the tie unspecified too, and the
  * native exec consumes ties in shuffle order). If the right side can
  * carry genuine (key, ts) duplicates, disambiguate BEFORE the join —
  * e.g. ts = struct(ts, sequence_number) — rather than relying on any
  * engine's tie pick.
  */
object AsOfJoin {

  /** @param left      probe side; all columns preserved
    * @param right     build side; must contain `key`, `ts`, and
    *                  `valueCols`; its other columns are ignored
    * @param key       equi-join key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param valueCols right columns to carry onto each left row
    *                  (null when no right row precedes the left row)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns ${valueCols.mkString(",")} collide with left columns")

    val side = "__asof_is_left"
    val l = left.withColumn(side, lit(true))
    // Null-key / null-ts right rows can never be "the latest visible
    // state" under equi-join semantics (NULL matches nothing, and a
    // null timestamp has no position) — drop them BEFORE the union.
    // Unfiltered, the window's partitionBy would group null keys
    // together and nulls-first ordering would make a null-ts right row
    // the carried state for every left row — diverging from both SQL
    // ASOF and the native exec (which skips them). Left rows with a
    // null key land in a partition with no right rows and correctly
    // get null value columns.
    val r = right.select((Seq(key, ts) ++ valueCols).map(col): _*)
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .withColumn(side, lit(false))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right (false) sorts before left (true) at equal ts → inclusive <=
    val w = Window.partitionBy(key).orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the right row travels as ONE struct so "latest row" stays atomic
    // even when some of its value columns are null
    val pack = "__asof_pack"
    val carried = unioned
      .withColumn(pack,
        when(!col(side), struct(valueCols.map(col): _*)))
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (df, v) =>
      df.withColumn(v, col(s"$pack.$v"))
    }.filter(col(side)).drop(side, pack)
  }

  /** Same semantics as [[asofJoin]], through the engine's native
    * whole-operator path: [[graft.plans.AsOfJoinNode]] →
    * [[graft.plans.AsOfJoinStrategy]] → [[graft.plans.AsOfJoinExec]]
    * (one hash shuffle per side — elided when a side is already
    * partitioned on the key — then a single streaming merge pass per
    * partition). Registers the strategy on the session idempotently,
    * so it works on any SparkSession without build-time extensions.
    */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graft.bridge

    require(valueCols.nonEmpty, "asofJoinNative needs at least one value column")
    require(!valueCols.exists(left.columns.contains),
      s"value columns ${valueCols.mkString(",")} collide with left columns")
    val spark = left.sparkSession
    bridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)

    val lPlan = bridge.analyzed(left)
    // Self-join safety: if the two sides share attribute exprIds (both
    // derived from one scan), re-alias the right side so every
    // reference in the node is unambiguous.
    val rPlan0 = bridge.analyzed(right)
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(",")}"))

    val lKey = attr(lPlan, key)
    val rKey = attr(rPlan, key)
    require(lKey.dataType == rKey.dataType,
      s"as-of key types differ: ${lKey.dataType} vs ${rKey.dataType}")
    val lTs = attr(lPlan, ts)
    val rTs = attr(rPlan, ts)
    require(lTs.dataType == rTs.dataType,
      s"as-of ts types differ: ${lTs.dataType} vs ${rTs.dataType}")
    val rVals = valueCols.map(attr(rPlan, _))
    val valueAttrs = rVals.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)())
    bridge.ofRows(spark, graft.plans.AsOfJoinNode(
      lPlan, rPlan, lKey, rKey, lTs, rTs, rVals, valueAttrs))
  }
}
