package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

/** Entity resolution: the multi-pass blocking guarantee (one edit
  * breaks at most one key → the pair always surfaces), verified-only
  * merging, transitive closure, golden-record election, and the
  * honest failure mode (a typo that breaks EVERY blocking key is
  * missed — blocking is a recall/scale tradeoff, not magic).
  */
class EntityResolutionSpec extends SparkSpecBase {

  private def recs(rows: (Long, String)*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("rec_id", "name")
  }

  private val twoKeys = Seq(expr("substring(name, 1, 4)"),
    expr("substring(name, 5, 4)"))

  test("a single-char typo breaking one blocking key is recovered " +
      "through the other; matched records share an entity with the " +
      "lowest rec_id as golden") {
    // 8-char names; keys = first/last 4 chars. The typo hits char 2
    // (breaks key 1, key 2 intact).
    val df = recs(
      0L -> "abcdwxyz", 1L -> "aXcdwxyz",
      2L -> "ppppqqqq")
    val out = EntityResolution.resolve(df, twoKeys, maxEdits = 1)
      .collect().map(r => r.getAs[Long]("rec_id")
        -> r.getAs[Long]("entity")).toMap
    assert(out(0L) == out(1L), s"typo pair must merge: $out")
    assert(out(0L) == 0L, "entity label is the lowest member id")
    assert(out(2L) == 2L, "singleton stays its own entity")
  }

  test("candidates come only from shared blocks — a within-distance " +
      "pair sharing NO blocking key is (honestly) missed") {
    // names differ in one char, but that char sits in BOTH halves'
    // keys? Impossible for one edit — so construct a pair differing
    // in TWO chars (one per key) at distance 2 with maxEdits = 2:
    // every key is broken, so blocking never surfaces the pair.
    val df = recs(0L -> "abcdwxyz", 1L -> "aXcdwXyz")
    val out = EntityResolution.resolve(df, twoKeys, maxEdits = 2)
      .collect().map(r => r.getAs[Long]("rec_id")
        -> r.getAs[Long]("entity")).toMap
    assert(out(0L) == 0L && out(1L) == 1L,
      s"no shared block => no candidate => no merge: $out")
  }

  test("verification gates candidates: sharing a block without being " +
      "within maxEdits never merges") {
    val df = recs(0L -> "abcdwxyz", 1L -> "abcdZZZZ")
    val out = EntityResolution.resolve(df, twoKeys, maxEdits = 1)
      .collect().map(r => r.getAs[Long]("rec_id")
        -> r.getAs[Long]("entity")).toMap
    assert(out(0L) == 0L && out(1L) == 1L,
      s"distance-4 pair must not merge: $out")
  }

  test("matching is transitive: a chain a~b~c is one entity even " +
      "when a and c are farther than maxEdits apart") {
    val df = recs(
      0L -> "abcdwxyz", 1L -> "aXcdwxyz", 2L -> "aXcdwxyZ")
    val out = EntityResolution.resolve(df, twoKeys, maxEdits = 1)
      .collect().map(r => r.getAs[Long]("entity")).distinct
    assert(out.length == 1, s"chain must close into one entity: $out")
  }

  test("duplicate candidates across blocking keys collapse — pair " +
      "appears once even when both keys match") {
    val df = recs(0L -> "abcdwxyz", 1L -> "abcdwxyz")
    val cand = EntityResolution.candidates(df, twoKeys)
    assert(cand.count() == 1L)
  }

  test("property (seeded): every injected single-substitution variant " +
      "is recovered under 6+6 split keys, with the original as golden, " +
      "and nothing else merges") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(i: Int) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val originals = (0 until 200).map(i => (i.toLong * 2, hex(i)))
    // variant for every third record: substitute 'Z' at a
    // key-dependent position — hits key 1 (chars 1-6) or key 2
    // (chars 7-12), never both
    val variants = (0 until 200 by 3).map { i =>
      val n = hex(i); val p = i % 12
      (i.toLong * 2 + 1, n.substring(0, p) + "Z" + n.substring(p + 1))
    }
    val keys = Seq(expr("substring(name, 1, 6)"),
      expr("substring(name, 7, 6)"))
    val out = EntityResolution
      .resolve(recs((originals ++ variants): _*), keys, maxEdits = 1)
      .collect().map(r => r.getAs[Long]("rec_id")
        -> r.getAs[Long]("entity")).toMap
    variants.foreach { case (vid, _) =>
      assert(out(vid) == out(vid - 1) && out(vid) == vid - 1,
        s"variant $vid must join its original's entity: ${out(vid)}")
    }
    // no accidental merges: entity count == original count (md5 hex
    // originals are pairwise far; deterministic under this seed set)
    assert(out.values.toSet.size == originals.size)
  }

  test("multi-pass PHONETIC rescue: a soundex blocking pass recovers " +
      "spelling-variant pairs that every substring key misses, without " +
      "disturbing the substring passes' own matches") {
    // jonsonxy/johnsonx: the inserted 'h' SHIFTS every later char, so
    // the first-4 AND last-4 substring keys both break (jons≠john,
    // onxy≠sonx) — a single substitution can never do that (the
    // multi-pass guarantee), but a single insertion does, and THAT is
    // the case phonetic blocking exists for: both names soundex to
    // J525. ponsonab keeps its substring-key rescue (typo in key 2
    // only), and a soundex-equal-but-FAR pair (albertqq/alpertzz,
    // both A416, distance 3) stays unmerged: blocking proposes,
    // Levenshtein disposes.
    val df = recs(
      0L -> "jonsonxy", 1L -> "johnsonx", // soundex-only rescue (lev 2)
      2L -> "ponsonab", 3L -> "ponsonaZ", // substring-key match (lev 1)
      4L -> "albertqq", 5L -> "alpertzz") // soundex-close, lev 3
    val subsOnly = EntityResolution
      .resolve(df, twoKeys, maxEdits = 2)
      .collect().map(r => r.getAs[Long]("rec_id")
        -> r.getAs[Long]("entity")).toMap
    assert(subsOnly(0L) != subsOnly(1L),
      "substring keys alone must MISS the shifted jonson/johnson pair " +
        s"(the case phonetic blocking exists for): $subsOnly")
    val withPhonetic = EntityResolution
      .resolve(df, twoKeys :+ soundex(col("name")), maxEdits = 2)
      .collect().map(r => r.getAs[Long]("rec_id")
        -> r.getAs[Long]("entity")).toMap
    assert(withPhonetic(0L) == withPhonetic(1L),
      s"soundex pass must rescue jonsonxy/johnsonx: $withPhonetic")
    assert(withPhonetic(2L) == withPhonetic(3L),
      s"substring-pass match must survive the extra key: $withPhonetic")
    assert(withPhonetic(4L) != withPhonetic(5L),
      "soundex collision beyond maxEdits must NOT merge — " +
        s"verification still gates: $withPhonetic")
  }

  test("multi-pass TRANSPOSITION rescue (the q84 char-bag key): an " +
      "adjacent swap at the key boundary breaks both substring keys " +
      "but never the character-multiset key") {
    val charBag =
      "aggregate(transform(sequence(1, 8), i -> " +
        "pmod(CAST(conv(substring(md5(concat('5:', " +
        "substring(name, i, 1))), 1, 15), 16, 10) AS LONG), " +
        "1000000000000L)), 0L, (a, b) -> a + b)"
    // swap chars 4↔5: last char of key 1's window, first of key 2's
    val df = recs(0L -> "abcdwxyz", 1L -> "abcwdxyz")
    val subsOnly = EntityResolution.resolve(df, twoKeys, maxEdits = 2)
      .collect().map(r => r.getAs[Long]("entity")).distinct
    assert(subsOnly.length == 2,
      "boundary transposition must break both substring keys")
    val withBag = EntityResolution
      .resolve(df, twoKeys :+ expr(charBag), maxEdits = 2)
      .collect().map(r => r.getAs[Long]("entity")).distinct
    assert(withBag.length == 1,
      "char-bag key must rescue the transposed pair")
  }
}
