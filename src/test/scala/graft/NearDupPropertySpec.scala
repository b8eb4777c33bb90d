package graft

import graft.operators.NearDup
import scala.util.Random

/** Randomized soundness of the near-dup pipeline: on corpora built by
  * seeded mutation (near-dups, exact dups, unrelated docs), every pair
  * the pipeline reports must carry the TRUE shingle-set Jaccard — the
  * verification stage means LSH banding can only cost recall, never
  * precision — and clustering must equal connected components over the
  * reported pairs computed by an independent driver-side union-find.
  */
class NearDupPropertySpec extends SparkSpecBase {

  private val words =
    ('a' to 'z').map(c => s"tok$c") ++ (0 until 40).map(i => s"w$i")

  private def randomCorpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val bases = Seq.tabulate(6)(b =>
      Seq.fill(14)(words(rnd.nextInt(words.length))).mkString(" "))
    (0 until 24).map { i =>
      val base = bases(rnd.nextInt(bases.length)).split(" ")
      // mutate 0-3 positions — some docs end up near-dups, some exact
      val mutated = (0 until rnd.nextInt(4)).foldLeft(base) { (w, _) =>
        w.updated(rnd.nextInt(w.length), words(rnd.nextInt(words.length)))
      }
      (i.toLong, mutated.mkString(" "))
    }
  }

  private def trueJaccard(a: String, b: String): Double = {
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val (sa, sb) = (shingles(a), shingles(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("reported pairs always carry the true Jaccard (no false values)") {
    import spark.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val corpus = randomCorpus(seed)
      val byId = corpus.toMap
      val pairs = NearDup.verifiedPairs(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5)))
      assert(pairs.nonEmpty, s"seed $seed produced no candidate pairs")
      pairs.foreach { case ((a, b), j) =>
        val expected = trueJaccard(byId(a), byId(b))
        assert(math.abs(j - expected) < 1e-4,
          s"seed $seed pair ($a,$b): reported $j, true $expected")
      }
    }
  }

  test("clusters equal union-find over the thresholded verified pairs") {
    import spark.implicits._
    for (seed <- Seq(5L, 6L)) {
      val corpus = randomCorpus(seed)
      val df = corpus.toDF("doc_id", "text")
      val edges = NearDup.verifiedPairs(df).collect()
        .filter(_.getDouble(5) >= 0.2)
        .map(r => (r.getLong(0), r.getLong(1)))
      val parent = collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(k => k -> find(k)).toMap
      val got = NearDup.clusters(df, threshold = 0.2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed")
    }
  }
}
