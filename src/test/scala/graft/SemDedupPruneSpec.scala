package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the s10 SemDeDup pruning verdict that the
  * value-hash oracle can't articulate: the decision must PARTITION the
  * corpus — every vector exactly once, exactly one canonical kept per
  * cluster (the cluster min), every dropped vector pointing at a kept
  * canonical in its own cluster.
  */
class SemDedupPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val verdict = graft.queries.SimilarityQueries
    .entries("s10_semdedup_prune")._1(spark, dir)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1) == 1L,
      if (r.isNullAt(2)) None else Some(r.getLong(2))))

  test("every corpus vector gets exactly one verdict") {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(verdict.length == n)
    assert(verdict.map(_._1).distinct.length == verdict.length)
  }

  test("kept xor dup_of: canonicals carry no pointer, dropped carry one") {
    assert(verdict.forall { case (_, kept, dupOf) => kept == dupOf.isEmpty })
  }

  test("each cluster keeps exactly its minimum id; dup_of targets are kept") {
    val byCluster = verdict.collect { case (id, _, Some(canon)) => (canon, id) }
      .groupBy(_._1)
    val keptIds = verdict.collect { case (id, true, _) => id }.toSet
    assert(byCluster.nonEmpty, "fixture produced no clusters — thin test")
    byCluster.foreach { case (canon, members) =>
      assert(keptIds.contains(canon), s"canonical $canon was dropped")
      assert(members.map(_._2).forall(_ > canon),
        s"cluster $canon has a member below its canonical")
    }
  }
}
