package graft

import org.apache.spark.sql.functions._

/** d14 (exact-substring dedup, Lee et al. duplicated-window coverage)
  * on a constructed corpus where every 8-token window count is
  * checkable by hand:
  *
  *  - A and B share exactly ONE 8-token run (the boilerplate case) —
  *    each has 1 duplicated window out of 5, which sits exactly ON the
  *    20% flag boundary (1*5 >= 5), pinning the integer
  *    cross-multiplication;
  *  - C is unique — zero duplicated windows;
  *  - D repeats its own opening 8-token run after an 8-token spacer
  *    (the within-doc repeat case): exactly the two copy positions
  *    are duplicated, 2 of 17 windows, below the flag line;
  *  - E is shorter than the window — zero windows, never flagged.
  */
class SubstringDedupSpec extends SparkSpecBase {

  private def toks(p: String, n: Int): String =
    (1 to n).map(i => s"$p$i").mkString(" ")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-d14").toString
    val shared = toks("s", 8)
    import spark.implicits._
    Seq(
      (1L, s"$shared ${toks("a", 4)}", "en", "web"),
      (2L, s"b1 b2 $shared b3 b4", "en", "web"),
      (3L, toks("c", 12), "en", "web"),
      (4L, s"${toks("d", 8)} ${toks("e", 8)} ${toks("d", 8)}", "en", "web"),
      (5L, "e1 e2 e3", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("duplicated-window counts and the 20% flag: cross-doc run, " +
      "within-doc repeat, unique, sub-window doc") {
    val got = SparkEntry.queries("d14_substring_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got === Map(
      1L -> ((5L, 1L, true)),   // exactly 20% -> flagged
      2L -> ((5L, 1L, true)),
      3L -> ((5L, 0L, false)),
      4L -> ((17L, 2L, false)), // within-doc repeat found, below 20%
      5L -> ((0L, 0L, false))))
  }

  test("d15 removal rewrite: every token covered by a duplicated " +
      "window is excised, the rest survive in order") {
    val got = SparkEntry.queries("d15_substring_removal")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === Map(
      1L -> ((12L, 8L, toks("a", 4))),        // shared run excised
      2L -> ((12L, 8L, "b1 b2 b3 b4")),       // mid-doc run excised
      3L -> ((12L, 0L, toks("c", 12))),       // untouched
      4L -> ((24L, 16L, toks("e", 8))),       // both self-repeat copies go
      5L -> ((3L, 0L, "e1 e2 e3"))))          // sub-window doc untouched
  }
}
