package graft

/** Semantic invariants of the round-8 curation queries, beyond the
  * DuckDB hash oracle: t20's power-of-two bucket bounds (which bound
  * per-batch padding waste by construction) and t21's adaptive
  * threshold actually being a member score that keeps ~75% per group.
  */
class CurationQueriesSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("t20: every bucket's lengths sit in [2^b, 2^(b+1)) — so padding " +
      "to the bucket max wastes less than one min-length per doc") {
    val rows = SparkEntry.queries("t20_length_buckets")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, n, min, max, waste) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
      assert(min >= (1L << b) && max < (1L << (b + 1)),
        s"bucket $b holds lengths outside [2^$b, 2^${b + 1}): $min..$max")
      // range < 2^b and min >= 2^b → waste per doc < its own length
      assert(waste <= n * (max - min) && waste < n * min,
        s"bucket $b: waste $waste violates the power-of-two bound")
    }
    // buckets partition the corpus: totals add back up
    val total = spark.read.parquet(s"$dir/documents.parquet")
      .filter("n_chars > 0").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("t22: pred_q is a quantized conditional probability — at most " +
      "1e6 per bigram, one row per multi-token doc, n_bigrams exact") {
    val rows = SparkEntry.queries("t22_bigram_lm")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, q) =>
      // each term floor(c12·1e6/c1) is in [0, 1e6] since 1 ≤ c12 ≤ c1
      assert(n >= 1 && q >= 0 && q <= n * 1000000L,
        s"doc $id: pred_q $q outside [0, ${n}e6]")
    }
    // exhaustive coverage: exactly the docs with ≥2 whitespace tokens,
    // each contributing exactly tokens−1 bigrams
    val exp = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS t")
      .filter("t >= 2").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(rows.length == exp.size,
      s"${rows.length} scored docs vs ${exp.size} multi-token docs")
    rows.foreach { case (id, n, _) =>
      assert(n == exp(id) - 1L, s"doc $id: $n bigrams, ${exp(id)} tokens")
    }
  }

  test("t23: selection is exactly the per-language top-ceil(n/4) of the " +
      "raw pool by (mean_ppm desc, doc_id) — a true order statistic") {
    val rows = SparkEntry.queries("t23_dsir_select")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // scored pool = exactly the non-target docs; targets never score
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .filter("source NOT IN ('src0','src1')")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == raw,
      s"scored ${rows.length} docs vs ${raw.size} raw-pool docs")
    rows.foreach { case (id, _, n, q, ppm, _) =>
      assert(ppm == q * 1000000L / n, s"doc $id: mean_ppm $ppm != $q e6/$n")
    }
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val k = (docs.length + 3) / 4
      val sel = docs.filter(_._6)
      assert(sel.length == k,
        s"$lang: selected ${sel.length}, expected ceil(${docs.length}/4)=$k")
      // dominance: every selected row orders before every unselected one
      val worstSel = sel.map(d => (-d._5, d._1)).max
      docs.filterNot(_._6).foreach { d =>
        assert(Ordering[(Long, Long)].lt(worstSel, (-d._5, d._1)),
          s"$lang: unselected doc ${d._1} (ppm ${d._5}) outranks a " +
            s"selected one")
      }
    }
  }

  test("t21: the threshold is a member score and keeps 75%±ties per " +
      "language; every language contributes") {
    val rows = SparkEntry.queries("t21_adaptive_quality_gate")(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.size >= 4, s"expected several languages, got ${byLang.keys}")
    byLang.foreach { case (lang, docs) =>
      val n = docs.length
      val thr = docs.head._3
      assert(docs.forall(_._3 == thr), s"$lang: threshold not constant")
      assert(docs.exists(_._2 == thr),
        s"$lang: threshold $thr is not a member score (order statistic)")
      val kept = docs.count(_._4)
      // exactly the docs at rank >= ceil(n/4) minus ties below; ties
      // AT the threshold are kept, so kept >= n - ceil(n/4) + 1
      assert(kept >= n - (n + 3) / 4 + 1 && kept <= n,
        s"$lang: kept $kept of $n below the 75% floor")
      assert(docs.forall(d => d._4 == (d._2 >= thr)),
        s"$lang: kept flag disagrees with the threshold compare")
    }
  }
}
