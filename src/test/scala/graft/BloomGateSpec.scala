package graft

import graft.functions.BloomExprs
import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Bloom ingest gate: the no-false-negative guarantee (also pinned by
  * the d13 oracle), the false-positive rate staying near the
  * configured fpp, and the property that makes the gate USEFUL —
  * skipping rows the bloom cleared changes nothing about the dup set.
  */
class BloomGateSpec extends SparkSpecBase {

  test("no false negatives: every key the corpus put in probes true") {
    val session = spark
    import session.implicits._
    val corpus = (1 to 2000).map(i => s"corpus document body $i").toDF("text")
    // probe the corpus against itself — every row must flag
    val gated = NearDup.bloomGate(corpus, corpus,
      expectedItems = 10000L, fpp = 0.03)
    assert(gated.filter(!col("might_be_dup")).count() == 0,
      "a member key probed false — bloom false negative")
  }

  test("false-positive rate on disjoint keys stays near the configured fpp") {
    val session = spark
    import session.implicits._
    val corpus = (1 to 2000).map(i => s"left $i").toDF("text")
    val novel = (1 to 2000).map(i => s"right $i").toDF("text")
    val fpp = 0.03
    val fp = NearDup.bloomGate(corpus, novel,
      expectedItems = 10000L, fpp = fpp)
      .filter(col("might_be_dup")).count()
    // deterministic for a fixed corpus + filter geometry; 3x the
    // configured rate leaves margin for hash clustering at this size
    assert(fp <= (3 * fpp * 2000).toLong,
      s"$fp false positives out of 2000 (fpp=$fpp)")
  }

  test("rows the bloom clears can be skipped without changing the dup set") {
    val session = spark
    import session.implicits._
    val corpus = (1 to 500).map(i => s"known text $i").toDF("text")
    val batch = ((1 to 40).map(i => (i.toLong, s"known text ${i * 10}")) ++
      (41L to 140L).map(id => (id, s"novel text $id"))).toDF("id", "text")
    val gated = NearDup.bloomGate(corpus, batch, expectedItems = 10000L)
    val dedupAll = batch.join(corpus, Seq("text"), "left_semi")
      .select("id").as[Long].collect().toSet
    val dedupGated = gated.filter(col("might_be_dup"))
      .join(corpus, Seq("text"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(dedupAll == dedupGated,
      "skipping bloom-cleared rows changed the dup set")
    assert(dedupAll == (1L to 40L).toSet)
    // and the gate actually shrank the join input (the point of it)
    val sent = gated.filter(col("might_be_dup")).count()
    assert(sent < 140 && sent >= 40, s"gate passed $sent of 140 rows")
  }

  test("an UNDERSIZED filter saturates to pass-through: fp rate climbs " +
      "toward 1 but false negatives stay impossible") {
    val session = spark
    import session.implicits._
    // 10,000 distinct corpus keys crammed into a filter sized for 100
    // (100x undersized): the bit array saturates
    val corpus = (1 to 10000).map(i => s"sat corpus $i").toDF("text")
    val novel = (1 to 2000).map(i => s"sat novel $i").toDF("text")
    val members = NearDup.bloomGate(corpus, corpus,
      expectedItems = 100L, fpp = 0.03)
    // the no-false-negative side never depends on sizing
    assert(members.filter(!col("might_be_dup")).count() == 0,
      "saturation produced a false negative")
    // the degradation mode is PASS-THROUGH, not data loss: nearly all
    // novel rows flag and simply proceed to the verification join
    val fp = NearDup.bloomGate(corpus, novel,
      expectedItems = 100L, fpp = 0.03)
      .filter(col("might_be_dup")).count()
    assert(fp > 1800, s"expected a saturated filter (fp→1), got $fp/2000")
    // …and the d12-style composition downstream is still exact: the
    // dup set after gating equals the ungated dup set
    val batch = ((1 to 30).map(i => (i.toLong, s"sat corpus ${i * 100}")) ++
      (31L to 60L).map(id => (id, s"sat fresh $id"))).toDF("id", "text")
    val gated = NearDup.bloomGate(corpus, batch, expectedItems = 100L)
    val dedupAll = batch.join(corpus, Seq("text"), "left_semi")
      .select("id").as[Long].collect().toSet
    val dedupGated = gated.filter(col("might_be_dup"))
      .join(corpus, Seq("text"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(dedupAll == dedupGated && dedupAll == (1L to 30L).toSet,
      "saturated gate changed the dup set")
  }

  test("NULL keys are definitively novel on both sides — never a " +
      "sentinel-value collision") {
    val session = spark
    import session.implicits._
    // corpus WITH a NULL key: without the isNotNull guards, xxhash64's
    // seed-hash-for-NULL would enter the filter and every NULL-key
    // batch row would flag might_be_dup
    val corpus = (Seq(Some("shared x")) ++ Seq(Option.empty[String]))
      .toDF("text")
    val batch = Seq((1L, Some("shared x")), (2L, Option.empty[String]),
      (3L, Some("novel y"))).toDF("id", "text")
    val got = NearDup.bloomGate(corpus, batch, expectedItems = 100L)
      .select("id", "might_be_dup").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "a real member key must flag")
    assert(!got(2L), "a NULL key can never match an equi-join — must not flag")
    // and the column is a plain boolean (no null leaking through)
    assert(NearDup.bloomGate(corpus, batch, expectedItems = 100L)
      .filter(col("might_be_dup").isNull).count() == 0)
  }

  test("a null probe key evaluates to null, not a crash or a flag") {
    val session = spark
    import session.implicits._
    val corpus = Seq("x").toDF("text")
    val filter = corpus.select(xxhash64(col("text")).as("k"))
      .stat.bloomFilter("k", 100L, 0.03)
    val out = Seq(Some(7L), None).toDF("k")
      .select(BloomExprs.bloom_might_contain(filter, col("k")).as("hit"))
      .collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
