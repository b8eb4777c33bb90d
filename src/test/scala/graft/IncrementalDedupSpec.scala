package graft

import graft.queries.TextQueries

/** d12 (incremental ingest dedup) cross-checked against the BATCH LSH
  * candidate graph: a new-batch doc is refused admission exactly when
  * the batch pipeline would have paired it with an existing doc, and
  * dup_of is the earliest such existing doc. New×new collisions (both
  * sides in the same batch) must NOT affect admission — the batch is
  * deduplicated against the corpus, not against itself.
  * Also pins the m6 canonical-mapping invariants.
  */
class IncrementalDedupSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("admission decisions match the batch LSH candidate graph") {
    val got = SparkEntry.queries("d12_incremental_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getInt(2)))
    val pairs = TextQueries.lshCandidatePairs(spark, dir)
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // independent reference: min existing collision partner per new doc
    val expected: Map[Long, Long] = pairs
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (n, e) => n % 4 == 0 && e % 4 != 0 }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }

    assert(got.nonEmpty)
    got.foreach { case (id, dupOf, admitted) =>
      assert(id % 4 == 0, s"doc $id is not in the new batch")
      assert(dupOf == expected.get(id),
        s"doc $id: dup_of $dupOf != expected ${expected.get(id)}")
      assert((admitted == 1) == dupOf.isEmpty, s"doc $id flag mismatch")
    }
    // one decision per new-batch doc, no drops
    val newDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter("doc_id % 4 = 0").count()
    assert(got.length.toLong == newDocs)
  }

  test("m6 canonical mapping: one canonical per digest group, " +
      "canonical is the minimum member") {
    val rows = SparkEntry.queries("m6_media_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val byFp = rows.groupBy(_._2)
    byFp.foreach { case (fp, members) =>
      val canon = members.map(_._1).min
      assert(members.forall(_._3 == canon), s"group $fp canonical drift")
      assert(members.forall(m => m._4.toInt == members.length),
        s"group $fp n_copies drift")
      assert(members.count(_._5 == 0) == 1, s"group $fp canonical count")
      assert(members.filter(_._5 == 0).head._1 == canon)
    }
  }
}
