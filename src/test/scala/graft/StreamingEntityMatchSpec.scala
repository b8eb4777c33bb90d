package graft

import graft.streaming.StreamingEntityMatch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming entity-match gate: flags must be VERIFIED matches (the
  * edit-distance check runs in-state, unlike the near-dup gate's
  * candidate flags), attribution respects arrival order with lowest
  * admitted rec_id winning, matched records are not re-admitted, and
  * the multi-key blocking guarantee carries over from the batch
  * operator.
  */
class StreamingEntityMatchSpec extends SparkSpecBase {

  private val keys = Seq(expr("substring(name, 1, 4)"),
    expr("substring(name, 5, 4)"))

  test("editDistance is the classic Levenshtein") {
    import StreamingEntityMatch.editDistance
    assert(editDistance("", "") == 0)
    assert(editDistance("abc", "abc") == 0)
    assert(editDistance("abc", "aXc") == 1)
    assert(editDistance("abc", "ab") == 1)
    assert(editDistance("abc", "xyz") == 3)
    assert(editDistance("kitten", "sitting") == 3)
  }

  test("verified matches flag against the earliest admitted record, " +
      "across and within micro-batches; bucket sharing without edit " +
      "proximity never flags") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val query = StreamingEntityMatch
      .gate(input.toDF().toDF("rec_id", "name"), keys, maxEdits = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("entity_flags").start()
    try {
      // wave 1: two novel records — nothing flags; "abcdZZZZ" SHARES
      // record 1's first block but is distance 4 — the verifier must
      // reject what the near-dup gate would have flagged
      input.addData(1L -> "abcdwxyz", 2L -> "abcdZZZZ")
      query.processAllAvailable()
      assert(spark.table("entity_flags").count() == 0)

      // wave 2: 3 is a 1-edit variant of 1 (typo in char 2 breaks
      // key 1; key 2 carries it); 4 and 5 are same-batch variants of
      // each other and novel vs the corpus — 4 (lower id) admits,
      // 5 flags against 4
      input.addData(3L -> "aXcdwxyz", 4L -> "ppppqqqq", 5L -> "ppppqqqX")
      query.processAllAvailable()
      val flags = spark.table("entity_flags")
        .groupBy("rec_id").agg(min("match_of").as("m"))
        .as[(Long, Long)].collect().toSet
      assert(flags == Set(3L -> 1L, 5L -> 4L), s"got $flags")

      // wave 3: replaying an admitted id is not a self-match; a new
      // variant of 2 attributes to 2 through the SHARED first block
      // (its own second block is novel); and residence is per-bucket:
      // 3 matched under key 2 in wave 2 but claimed the (then-empty)
      // "aXcd" bucket under key 1, so 7 — one edit from 3, two from
      // 1 — attributes to 3, the chained edge resolve() would close
      input.addData(1L -> "abcdwxyz", 6L -> "abcdZZZX",
        7L -> "aXcdwxyZ")
      query.processAllAvailable()
      val extra = spark.table("entity_flags")
        .filter(col("rec_id").isin(1L, 6L, 7L))
        .groupBy("rec_id").agg(min("match_of").as("m"))
        .as[(Long, Long)].collect().toSet
      assert(extra == Set(6L -> 2L, 7L -> 3L), s"got $extra")
    } finally query.stop()
  }

  test("a flag is emitted per matching blocking key and consumers " +
      "min-reduce: an exact duplicate flags in BOTH buckets") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val query = StreamingEntityMatch
      .gate(input.toDF().toDF("rec_id", "name"), keys, maxEdits = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("entity_flags2").start()
    try {
      input.addData(10L -> "mmmmnnnn")
      query.processAllAvailable()
      input.addData(11L -> "mmmmnnnn")
      query.processAllAvailable()
      val rows = spark.table("entity_flags2")
        .select("rec_id", "ki", "match_of")
        .as[(Long, Int, Long)].collect().toSet
      assert(rows == Set((11L, 0, 10L), (11L, 1, 10L)), s"got $rows")
    } finally query.stop()
  }
}
