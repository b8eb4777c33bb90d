package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** The Packing library API: chunk geometry on planted text, the
  * bin-overflow bound packing consumers pad against, and shard
  * locality. Oracle parity for the same expressions is carried by
  * t12/t14, which delegate here.
  */
class PackingSpec extends SparkSpecBase {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunks cover the document in order with a short tail") {
    val out = Packing.chunk(
        df((1L, (1 to 10).map(i => s"w$i").mkString(" "))),
        chunkTokens = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 3)
    assert(out(0) == (0L, 4L, "w1 w2 w3 w4"))
    assert(out(1) == (1L, 4L, "w5 w6 w7 w8"))
    assert(out(2) == (2L, 2L, "w9 w10"))
  }

  test("an empty-ish document still yields exactly one chunk") {
    val out = Packing.chunk(df((1L, "only three words"))).collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L)
  }

  test("a null text is not silently dropped") {
    val out = Packing.chunk(df((1L, null), (2L, "two words here")))
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(1L, 2L), "every input document must appear")
  }

  test("bins never exceed the budget by more than one chunk") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val binTotals = Packing.packBins(
        Packing.chunk(docs).drop("chunk_text"),
        shards = 4, binTokens = 256)
      .groupBy("shard", "bin").agg(sum("chunk_tokens").as("t"))
    val over = binTotals.filter(col("t") > 256 + 64 - 1).count()
    assert(over == 0L, "a bin exceeded budget + chunk slack")
    // every bin but each shard's last is full up to straddle slack:
    // a chunk crossing the boundary is charged to the earlier bin, so
    // a non-final bin holds at least budget - (chunkTokens - 1) tokens
    import org.apache.spark.sql.expressions.Window
    val notLast = binTotals.withColumn("maxBin",
        max("bin").over(Window.partitionBy("shard")))
      .filter(col("bin") < col("maxBin"))
    val under = notLast.filter(col("t") < 256 - (64 - 1)).count()
    assert(under == 0L, "a non-final bin is under-full beyond straddle slack")
  }

  test("chunks of one document always land in one shard") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val spread = Packing.packBins(
        Packing.chunk(docs).drop("chunk_text"))
      .groupBy("doc_id").agg(countDistinct("shard").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(spread == 1L)
  }

  test("misuse fails fast") {
    intercept[IllegalArgumentException] {
      Packing.chunk(df((1L, "a b")), chunkTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Packing.packBins(Packing.chunk(df((1L, "a b"))), shards = 0)
    }
    // overlap: stride past k would silently drop tokens between windows
    intercept[IllegalArgumentException] {
      Packing.chunkOverlap(df((1L, "a b")), chunkTokens = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkOverlap(df((1L, "a b")), chunkTokens = 4, stride = 0)
    }
  }

  test("overlapping chunks share exactly k - stride tokens and the " +
      "tail window is short, never dropped") {
    // 10 tokens, k=4, stride=3 → windows at 0,3,6 cover w1..w10 and
    // the last full window ends at 10; 1 + ceil((10-4)/3) = 3 chunks
    val out = Packing.chunkOverlap(
        df((1L, (1 to 10).map(i => s"w$i").mkString(" "))),
        chunkTokens = 4, stride = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 3L, 4L, "w4 w5 w6 w7"),
      (2L, 6L, 4L, "w7 w8 w9 w10")))
    // 11 tokens: the boundary formula must open a short tail window
    // rather than lose w11
    val tail = Packing.chunkOverlap(
        df((1L, (1 to 11).map(i => s"w$i").mkString(" "))),
        chunkTokens = 4, stride = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getString(4)))
    assert(tail.last == (3L, 2L, "w10 w11"))
  }

  test("overlap boundary cases: n <= k is one chunk; stride = k " +
      "degenerates to the disjoint chunker") {
    val one = Packing.chunkOverlap(df((1L, "a b c")), chunkTokens = 4,
      stride = 2).collect()
    assert(one.length == 1 && one.head.getString(4) == "a b c")
    val exact = Packing.chunkOverlap(df((1L, "a b c d")), chunkTokens = 4,
      stride = 2).collect()
    assert(exact.length == 1, "n == k must be exactly one chunk")
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val disjoint = Packing.chunk(df((1L, text)), chunkTokens = 4)
      .select("chunk_id", "chunk_tokens", "chunk_text")
      .collect().map(_.toSeq).toSet
    val degen = Packing.chunkOverlap(df((1L, text)), chunkTokens = 4,
        stride = 4)
      .select("chunk_id", "chunk_tokens", "chunk_text")
      .collect().map(_.toSeq).toSet
    assert(degen == disjoint)
  }
}
