package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp
import scala.util.Random

/** The native whole-operator as-of join (AsOfJoinNode → Strategy →
  * AsOfJoinExec): same semantics as the union+window composition, the
  * physical plan we designed (merge scan after one shuffle+sort per
  * side), and partitioning preserved for downstream same-key work.
  */
class NativeAsOfJoinSpec extends SparkSpecBase {

  private val leftSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("u", LongType),
    StructField("ts", TimestampType)))
  private val rightSchema = StructType(Seq(
    StructField("u", LongType),
    StructField("ts", TimestampType),
    StructField("rate", DoubleType),
    StructField("tag", StringType)))

  private def t(s: String) = Timestamp.valueOf(s)
  private def L(x: Long) = java.lang.Long.valueOf(x)
  private def D(x: Double) = java.lang.Double.valueOf(x)

  private val right = Seq(
    Row(L(10), t("2024-01-01 09:00:00"), D(5.0), "a"),
    Row(L(10), t("2024-01-01 11:00:00"), D(7.0), "b"),
    Row(L(10), t("2024-01-01 13:00:00"), null, "c"),
    Row(L(99), t("2024-01-01 09:00:00"), D(1.0), "z"))

  private def runNative(leftRows: Row*): Seq[Row] =
    AsOfJoin.asofJoinNative(
      df(leftSchema, leftRows: _*), df(rightSchema, right: _*),
      "u", "ts", Seq("rate", "tag"))
      .select("id", "rate", "tag")
      .collect().toSeq.sortBy(_.getLong(0))

  test("latest preceding right row per key; inclusive ties; null without predecessor") {
    val got = runNative(
      Row(L(1), L(10), t("2024-01-01 10:00:00")),
      Row(L(2), L(10), t("2024-01-01 12:00:00")),
      Row(L(3), L(10), t("2024-01-01 09:00:00")), // == right ts: inclusive
      Row(L(4), L(10), t("2024-01-01 08:00:00")), // before everything
      Row(L(5), L(50), t("2024-01-01 12:00:00")), // key with no right rows
      Row(L(6), L(10), t("2024-01-01 14:00:00"))) // null value field row
    assert(got == Seq(
      Row(L(1), D(5.0), "a"),
      Row(L(2), D(7.0), "b"),
      Row(L(3), D(5.0), "a"),
      Row(L(4), null, null),
      Row(L(5), null, null),
      Row(L(6), null, "c")))
  }

  test("null keys and null timestamps never match, either side") {
    val rightWithNulls = right ++ Seq(
      Row(null, t("2024-01-01 07:00:00"), D(9.0), "nk"),
      Row(L(10), null, D(9.5), "nt"))
    val got = AsOfJoin.asofJoinNative(
      df(leftSchema,
        Row(L(1), null, t("2024-01-01 12:00:00")), // null left key
        Row(L(2), L(10), null),                    // null left ts
        Row(L(3), L(10), t("2024-01-01 10:00:00"))),
      df(rightSchema, rightWithNulls: _*),
      "u", "ts", Seq("rate", "tag"))
      .select("id", "rate", "tag")
      .collect().toSeq.sortBy(_.getLong(0))
    assert(got == Seq(
      Row(L(1), null, null),
      Row(L(2), null, null),
      Row(L(3), D(5.0), "a"))) // the null-ts right row is ignored
  }

  test("randomized parity with the union+window composition") {
    val rnd = new Random(20260812L)
    val base = t("2024-01-01 00:00:00").getTime
    def randTs() = new Timestamp(base + rnd.nextInt(100000) * 1000L)
    for (round <- 0 until 4) {
      val lRows = Seq.tabulate(300)(i =>
        Row(L(i), L(rnd.nextInt(20)), randTs()))
      val rRows = Seq.tabulate(200)(i =>
        Row(L(rnd.nextInt(25)), randTs(), D(rnd.nextDouble()), s"t$i"))
      val l = df(leftSchema, lRows: _*)
      val r = df(rightSchema, rRows: _*)
      val native = AsOfJoin.asofJoinNative(l, r, "u", "ts", Seq("rate", "tag"))
        .select("id", "u", "rate", "tag").collect().toSeq
        .sortBy(_.getLong(0))
      val composed = AsOfJoin.asofJoin(l, r, "u", "ts", Seq("rate", "tag"))
        .select("id", "u", "rate", "tag").collect().toSeq
        .sortBy(_.getLong(0))
      assert(native == composed, s"parity mismatch in round $round")
    }
  }

  private def plan(dfr: DataFrame): String = dfr.queryExecution.executedPlan.toString

  test("physical plan is the native exec: no union, no window, one exchange per side") {
    val p = plan(AsOfJoin.asofJoinNative(
      df(leftSchema, Row(L(1), L(10), t("2024-01-01 10:00:00"))),
      df(rightSchema, right: _*),
      "u", "ts", Seq("rate", "tag")))
    assert(p.contains("AsOfJoin "), p) // nodeName strips the Exec suffix
    assert(!p.contains("Union"), p)
    assert(!p.contains("Window"), p)
    assert("Exchange".r.findAllIn(p).size == 2, p)
  }

  test("a side already partitioned on the key is not re-shuffled") {
    val l = df(leftSchema,
      Row(L(1), L(10), t("2024-01-01 10:00:00"))).repartition(4, col("u"))
    val r = df(rightSchema, right: _*)
    val p = plan(AsOfJoin.asofJoinNative(l, r, "u", "ts", Seq("rate", "tag")))
    // repartition(4, u) satisfies ClusteredDistribution(u): only the
    // right side needs an exchange (ENSURE_REQUIREMENTS), the left
    // keeps its REPARTITION_BY_COL exchange from the explicit call.
    assert("ENSURE_REQUIREMENTS".r.findAllIn(p).size == 1, p)
  }

  test("mismatched pre-partitioned sides are re-coordinated, results unchanged") {
    val lRows = Seq(
      Row(L(1), L(10), t("2024-01-01 10:00:00")),
      Row(L(2), L(10), t("2024-01-01 12:00:00")),
      Row(L(3), L(99), t("2024-01-01 10:00:00")))
    val got = AsOfJoin.asofJoinNative(
      df(leftSchema, lRows: _*).repartition(7, col("u")),
      df(rightSchema, right: _*).repartition(3, col("u")),
      "u", "ts", Seq("rate", "tag"))
      .select("id", "rate", "tag").collect().toSeq.sortBy(_.getLong(0))
    assert(got == Seq(
      Row(L(1), D(5.0), "a"),
      Row(L(2), D(7.0), "b"),
      Row(L(3), D(1.0), "z")))
  }

  test("output partitioning feeds a same-key aggregation without another shuffle") {
    val joined = AsOfJoin.asofJoinNative(
      df(leftSchema, Row(L(1), L(10), t("2024-01-01 10:00:00"))),
      df(rightSchema, right: _*),
      "u", "ts", Seq("rate", "tag"))
    val agg = joined.groupBy("u").agg(sum("rate").as("r"), count(lit(1)).as("n"))
    val p = plan(agg)
    // 2 exchanges for the join inputs, 0 more for the same-key groupBy.
    assert("Exchange".r.findAllIn(p).size == 2, p)
    assert(agg.collect().nonEmpty)
  }
}
