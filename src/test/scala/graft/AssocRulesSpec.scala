package graft

import graft.operators.AssocRules

/** Association-rule mining: hand-computed support/confidence/lift
  * goldens, the support prune, duplicate-row set semantics, and the
  * exact ppm arithmetic. q58's DuckDB oracle pins the same derivation
  * cross-engine at corpus scale.
  */
class AssocRulesSpec extends SparkSpecBase {

  test("confidence and lift come out in exact ppm over basket sets") {
    val session = spark
    import session.implicits._
    // baskets: {a,b}, {a,b}, {a,c}, {b} → N=4
    // n_a=3, n_b=3, n_c=1; pairs: (a,b)=2, (a,c)=1
    val baskets = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b")).toDF("ok", "item")
    val got = AssocRules.mine(baskets, "ok", "item", minPairSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).sortBy(p => (p._1, p._2))
    assert(got.toSeq == Seq(
      // (a,b): conf a→b = 2e6/3 = 666666; lift = 2·4e6/(3·3) = 888888
      ("a", "b", 2L, 3L, 3L, 666666L, 666666L, 888888L),
      // (a,c): conf a→c = 1e6/3 = 333333; c→a = 1e6/1; lift = 4e6/3
      ("a", "c", 1L, 3L, 1L, 333333L, 1000000L, 1333333L)))
  }

  test("minPairSupport prunes pairs before any rule math") {
    val session = spark
    import session.implicits._
    val baskets = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("ok", "item")
    val got = AssocRules.mine(baskets, "ok", "item", minPairSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a", "b")))
  }

  test("duplicate (basket, item) rows collapse to set semantics — " +
      "supports and pair counts never double-count") {
    val session = spark
    import session.implicits._
    val dup = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "b")).toDF("ok", "item")
    val got = AssocRules.mine(dup, "ok", "item", minPairSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("a", "b", 2L, 2L, 2L)))
  }
}
