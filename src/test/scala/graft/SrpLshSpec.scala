package graft

import org.apache.spark.sql.functions._
import graft.queries.{SimilarityQueries, TextQueries}

/** Signed-random-projection LSH (s7) and the BPE-ish pre-tokenizer
  * (t17): signature determinism, the banding retrieval guarantee, and
  * segmentation goldens.
  */
class SrpLshSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("SRP signatures are deterministic and 32-bit") {
    val a = SimilarityQueries.srpSignatures(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SimilarityQueries.srpSignatures(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.values.forall(s => s >= 0L && s < (1L << 32)))
    // signatures carry signal: not all identical
    assert(a.values.toSet.size > 1)
  }

  test("banded retrieval is exhaustive within the pigeonhole radius") {
    // 4 bands of 8 bits: any pair within Hamming distance 3 leaves at
    // least one band untouched, so band-bucketing MUST surface it.
    // Pairs at distance 4..10 are best-effort (standard LSH recall);
    // pairs beyond the threshold must never be emitted.
    val sig = SimilarityQueries.srpSignatures(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val exhaustive = (for {
      (ida, sa) <- sig; (idb, sb) <- sig if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (ida, idb, h.toLong)).toSet

    val out = SparkEntry.queries("s7_srp_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (a, b, h) => a < b && h <= 10 })
    val within3 = out.filter(_._3 <= 3).toSet
    assert(within3 == exhaustive,
      s"banding missed ${(exhaustive -- within3).size} pairs inside the guarantee radius")
  }

  test("BPE-ish segmentation golden: letter runs, 3-digit chunks, marks") {
    import spark.implicits._
    val toks = Seq("Hello, world has 12345 units!").toDF("text")
      .select(regexp_extract_all(col("text"),
        lit(TextQueries.bpePattern), lit(0)).as("toks"))
      .as[Seq[String]].head()
    assert(toks ==
      Seq("Hello", ",", "world", "has", "123", "45", "units", "!"))
  }

  test("t17 token stats are exact integers over the fixture corpus") {
    val out = SparkEntry.queries("t17_bpe_tokens")(spark, sf)
    val row = out.agg(
      count(lit(1)), min("n_bpe"), max("n_uniq"), sum("n_tok_chars")).head()
    assert(row.getLong(0) > 0)
    assert(row.getLong(1) >= 0L)
    // distinct tokens never exceed total tokens; chars are positive
    assert(out.filter(col("n_uniq") > col("n_bpe")).count() == 0)
    assert(row.getLong(3) > 0L)
  }
}
