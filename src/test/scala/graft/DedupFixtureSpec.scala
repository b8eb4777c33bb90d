package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** The round-19 dedup fixtures (shared verified-edge / component
  * tables consumed by d8/d17/d18/d19) must serve EXACTLY what a live
  * derivation computes — the fixture is a memo, never a semantic
  * change. Runs on the real sf0.001 corpus so the parity covers the
  * full LSH→verify→CC chain, not a toy edge list.
  */
class DedupFixtureSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("edge fixture == live verified-near-dup derivation at 0.2") {
    val live = TextQueries.verifiedNearDupEdges(spark, dir, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixture = TextQueries.nearDupEdgesFixture(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live.nonEmpty, "corpus should contain verified near-dups")
    assert(fixture == live)
  }

  test("component fixture == live CC over the live edges") {
    val live = graft.operators.ConnectedComponents
      .run(TextQueries.verifiedNearDupEdges(spark, dir, threshold = 0.2),
        "doc_a", "doc_b")
      .select(col("id"), col("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixture = TextQueries.nearDupComponentsFixture(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixture == live)
  }

  test("fixture is served from the same store on repeat calls") {
    val a = TextQueries.nearDupEdgesFixture(spark, dir).inputFiles.toSet
    val b = TextQueries.nearDupEdgesFixture(spark, dir).inputFiles.toSet
    assert(a == b && a.nonEmpty)
  }
}
