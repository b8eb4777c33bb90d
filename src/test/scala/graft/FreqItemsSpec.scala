package graft

import org.apache.spark.sql.functions._

/** Frequent-items sketch (single-pass Misra-Gries via
  * `df.stat.freqItems`): the algorithm's guarantee is CONTAINMENT —
  * every value whose true frequency exceeds the support threshold is
  * in the result (false positives allowed, false negatives not).
  */
class FreqItemsSpec extends SparkSpecBase {

  test("all true heavy hitters are contained in the sketch result") {
    val session = spark
    import session.implicits._
    // 60% 'hot', 25% 'warm', rest singleton-ish cold values
    val data = Seq.tabulate(2000) { i =>
      if (i % 10 < 6) "hot" else if (i % 10 < 8) "warm" else s"cold_$i"
    }.toDF("v")
    val freq = data.stat.freqItems(Array("v"), 0.2)
      .head().getSeq[String](0).toSet
    assert(freq.contains("hot"), freq)
    assert(freq.contains("warm"), freq)
  }

  test("the sketch result size is bounded by ~1/support, not cardinality") {
    val session = spark
    import session.implicits._
    val data = (0 until 5000).map(i => s"unique_$i").toDF("v")
    val freq = data.stat.freqItems(Array("v"), 0.05)
      .head().getSeq[String](0)
    // 5000 distinct values, support 0.05 → at most ~20 survivors + noise
    assert(freq.size <= 40, s"size ${freq.size}")
  }

  test("the query-surface entry runs over the documents corpus") {
    val out = SparkEntry.queries("t9_freq_items")(
      spark, "/root/testdata/sf0.001")
    // exploded (col_name, item) scalar rows, sorted — the shape the
    // driver's comparator can canonicalize (arrays crash its sort)
    assert(out.columns.toSeq == Seq("col_name", "item"))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.exists(_._1 == "source") && rows.exists(_._1 == "lang"))
    assert(rows.sortBy(identity).toSeq == rows.toSeq, "output must be sorted")
  }
}
