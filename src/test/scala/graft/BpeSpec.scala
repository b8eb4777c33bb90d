package graft

import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** Learned BPE: the classic Sennrich corpus hand-golden (merge order
  * AND tie-breaks), the greedy-left overlap semantics on identical
  * symbol runs, unseen-word segmentation, and the vocab/segment
  * consistency contract. t31/t32's DuckDB oracles pin the identical
  * rounds cross-engine at corpus scale.
  */
class BpeSpec extends SparkSpecBase {

  private def corpus = {
    val session = spark
    import session.implicits._
    // the Sennrich et al. (2016) example vocabulary, as documents
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("the Sennrich example learns es, est, est</w>, lo, low, ew — " +
      "counts and tie-breaks exact") {
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    assert(merges == Seq(
      // round 1: (e,s)=(s,t)=(t,</w>)=9 tie → smallest left wins
      Merge(1L, "e", "s", 9L),
      Merge(2L, "es", "t", 9L),
      Merge(3L, "est", "</w>", 9L),
      // (l,o)=(o,w)=7 tie → 'l' < 'o'
      Merge(4L, "l", "o", 7L),
      Merge(5L, "lo", "w", 7L),
      // (e,w)=(n,e)=(w,est</w>)=6 tie → 'e' smallest
      Merge(6L, "e", "w", 6L)))
    val segs = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(segs("low") == List("low", "</w>"))
    assert(segs("lower") == List("low", "e", "r", "</w>"))
    assert(segs("newest") == List("n", "ew", "est</w>"))
    assert(segs("widest") == List("w", "i", "d", "est</w>"))
  }

  test("greedy-left apply on identical-symbol runs: aaaa → aa aa, " +
      "aaa → aa a (never the overlapping middle)") {
    val session = spark
    import session.implicits._
    val words = Seq("aaaa", "aaa", "a").toDF("word")
    val segs = Bpe.segment(words, "word", Seq(Merge(1L, "a", "a", 0L)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(segs("aaaa") == List("aa", "aa", "</w>"))
    assert(segs("aaa") == List("aa", "a", "</w>"))
    assert(segs("a") == List("a", "</w>"))
  }

  test("segment() replays training order on unseen words and agrees " +
      "with the trained vocabulary on seen ones") {
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    val session = spark
    import session.implicits._
    val words = Seq("low", "newest", "lowest", "wider").toDF("word")
    val segs = Bpe.segment(words, "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    // seen words must match the trained vocab exactly
    val trained = vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(segs("low") == trained("low"))
    assert(segs("newest") == trained("newest"))
    // unseen: merges apply in order — lowest = lo|w + est</w> (round 5's
    // lo+w fires before 'west' could exist; est</w> from rounds 1-3)
    assert(segs("lowest") == List("low", "est</w>"))
    assert(segs("wider") == List("w", "i", "d", "e", "r", "</w>"))
  }

  test("token counts broadcast the trained vocab onto the corpus") {
    val session = spark
    import session.implicits._
    val docs = Seq((1L, "low lower low"), (2L, "newest")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    val got = Bpe.tokenCounts(docs, vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // low=[low,</w>]=2, lower=[low,e,r,</w>]=4, newest=[n,ew,est</w>]=3
    assert(got.toSeq == Seq((1L, 3L, 2L + 4L + 2L), (2L, 1L, 3L)))
  }

  test("token counts never drop unseen words: with merges the fallback " +
      "is the exact trained segmentation, without it the char count") {
    val session = spark
    import session.implicits._
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 6)
    // 'lowest' is NOT in the training corpus; segment() says
    // [low, est</w>] = 2 tokens (see the segment test above)
    val docs = Seq((1L, "low lowest")).toDF("doc_id", "text")
    val exact = Bpe.tokenCounts(docs, vocab, merges = merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.toSeq == Seq((1L, 2L, 2L + 2L)))
    // merges omitted: the miss falls back to chars+marker (7 for
    // 'lowest') instead of silently vanishing from BOTH counts
    val chars = Bpe.tokenCounts(docs, vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chars.toSeq == Seq((1L, 2L, 2L + 7L)))
  }

  test("training stops early when the vocabulary runs out of pairs") {
    val session = spark
    import session.implicits._
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // ab</w> fully merges in 2 rounds; round budget 10 must not spin
    val (merges, vocab) = Bpe.train(tiny, "text", rounds = 10)
    assert(merges.size == 2)
    assert(vocab.collect().map(_.getSeq[String](2).toList).toList ==
      List(List("ab</w>")))
  }
}
