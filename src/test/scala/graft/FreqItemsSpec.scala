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
    // exact heavy hitters (>10% support) with their counts, plus the
    // containment flag derived from the live Misra-Gries sketch — the
    // sketch guarantee is that every true heavy hitter is contained.
    assert(out.columns.toSeq == Seq("col_name", "item", "cnt", "in_sketch"))
    // only `lang` has values above 10% true support in the corpus;
    // `source` items that show up in the raw sketch are false
    // positives, which the exact-side filter correctly drops.
    val rows = out.collect()
    assert(rows.exists(_.getString(0) == "lang"), rows.mkString(", "))
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"heavy hitter ${r.getString(0)}=${r.getString(1)} " +
          s"(cnt ${r.getLong(2)}) missing from sketch")
    }
  }
}
