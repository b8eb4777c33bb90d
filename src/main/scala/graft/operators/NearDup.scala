package graft.operators

// The MinHash/LSH/verify internals deliberately live beside their
// DuckDB-oracle SQL twins in TextQueries (one definition per
// semantics, both engines in one place); this facade re-exposes them
// DataFrame-first. Engine-independent primitives (the portable hash)
// live in graft.functions instead.
import graft.queries.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The near-duplicate pipeline as a DataFrame-first library API — the
  * entry point for a consumer curating their OWN corpus, not the
  * bundled test tables. Every stage reuses the exact expressions the
  * oracle-verified queries (d3/d4/d7/d8/t19) run, so the API cannot
  * drift from the checked semantics:
  *
  *   signatures       per-doc MinHash signature (narrow map, no shuffle)
  *   candidatePairs   banded-LSH bucket join — O(collisions), never O(n²)
  *   verifiedPairs    exact shingle-set Jaccard on candidates only,
  *                    semi-join-gated so only candidate docs' shingles
  *                    ever explode
  *   clusters         connected components over thresholded verified
  *                    edges (pointer jumping, O(log diameter) rounds)
  *   leakageSafeSplit train/val/test by CLUSTER, so a duplicate family
  *                    never straddles a split boundary
  *
  * Input contract: `idCol` must be a unique long, `textCol` a
  * whitespace-tokenized string. Any other columns pass through
  * untouched where the result is row-aligned (leakageSafeSplit) and
  * are ignored elsewhere.
  */
object NearDup {

  private def normalized(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))

  /** The input rows with byte-level duplicates removed: docs whose
    * whitespace-normalized lowercase text hashes identically keep only
    * the minimum-id member. All other columns pass through.
    */
  def exactDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      // md5(null) is null and the window groups nulls together — an
      // unguarded fingerprint would collapse EVERY null-text document
      // (metadata-only / failed-extraction rows) into one survivor.
      // Null text is absence of content, not shared content: each such
      // doc keeps a unique fingerprint and survives.
      .withColumn("__fp",
        when(col(textCol).isNull,
          concat(lit("__null__:"), col(idCol).cast("string")))
          .otherwise(md5(regexp_replace(lower(col(textCol)), "\\s+", " "))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__fp").orderBy(col(idCol))))
      .filter(col("__rk") === 1).drop("__fp", "__rk")
  }

  /** (doc_id, h0..h3) MinHash signature per document. */
  def signatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    TextQueries.withMinhashSignature(normalized(docs, idCol, textCol))
      .select("doc_id", "h0", "h1", "h2", "h3")

  /** (band, doc_a, doc_b) LSH band collisions — the candidate set. */
  def candidatePairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    TextQueries.lshCandidatePairsDf(normalized(docs, idCol, textCol))

  /** (doc_a, doc_b, n_inter, n_a, n_b, jaccard) — exact Jaccard for
    * every candidate pair.
    */
  def verifiedPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    TextQueries.verifiedJaccardDf(normalized(docs, idCol, textCol))

  /** (doc_id, component) for every document in a near-dup cluster at
    * `threshold`; component = the cluster's minimum doc id (its
    * canonical document). Docs with no near-dup are absent — treat
    * them as their own singleton cluster (as leakageSafeSplit does).
    */
  def clusters(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.2): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0, 1], got $threshold")
    val edges = TextQueries.verifiedNearDupEdgesDf(
      normalized(docs, idCol, textCol), threshold)
    ConnectedComponents.run(edges, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("component"))
  }

  /** Input rows plus (split ∈ train/val/test) assigned by near-dup
    * CLUSTER: both members of a duplicate family always land on the
    * same side, so evaluation can never score against a training
    * near-copy. Assignment is a portable salted-hash bucket over the
    * cluster canonical — deterministic across runs, engines, and
    * cluster sizes.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.2,
      trainBuckets: Int = 8, valBuckets: Int = 1,
      testBuckets: Int = 1): DataFrame = {
    require(trainBuckets > 0 && valBuckets > 0 && testBuckets > 0,
      "every split needs at least one bucket")
    val comp = clusters(docs, idCol, textCol, threshold)
      .withColumnRenamed("doc_id", "__nd_id")
    val total = trainBuckets + valBuckets + testBuckets
    // salt 11 = the t19 oracle's cluster-split salt; shares
    // TextProfile's bucket derivation so split semantics live once
    val bucket = TextProfile.hashBucket(col("__grp"), total.toLong, salt = 11)
    docs
      .join(comp, col(idCol).cast("long") === col("__nd_id"), "left")
      .withColumn("__grp",
        coalesce(col("component"), col(idCol).cast("long")))
      .withColumn("split",
        when(bucket < trainBuckets, "train")
          .when(bucket < trainBuckets + valBuckets, "val")
          .otherwise("test"))
      .drop("__nd_id", "component", "__grp")
  }

  /** Bloom ingest gate — the constant-space pre-filter in front of
    * exact/near dedup at ingest: build a Bloom filter over the
    * corpus's content keys once, probe every incoming row with the
    * codegen'd [[graft.functions.BloomExprs.bloom_might_contain]],
    * and only rows flagged `might_be_dup` proceed to the expensive
    * verification join (d12's batch-vs-index equi-join). Rows probing
    * false are DEFINITELY novel — a Bloom filter has no false
    * negatives — so for the typical mostly-novel ingest batch the
    * verification join shrinks from |batch| to ~|true dups| +
    * fpp·|batch| rows, and the corpus side is never shuffled for the
    * novel majority.
    *
    * Scale shape: the filter build is one corpus aggregate (partial
    * per-partition filters OR-merged driver-side); the filter itself
    * is O(expectedItems·log(1/fpp)) BITS — ~1.2 MB per million keys
    * at 1% — rides the probe-side plan as a codegen reference, and
    * the probe is a narrow map. Nothing here grows with the batch.
    * Keys are `xxhash64(content)` so the probe is allocation-free.
    *
    * NULL keys are definitively novel on BOTH sides: the equi-join
    * this gate fronts (d12's batch-vs-index join) can never match a
    * NULL key, so corpus NULLs never enter the filter and a NULL-key
    * batch row probes `might_be_dup = false` — without this,
    * xxhash64's seed-hash-for-NULL would make every NULL-key batch
    * row collide with any corpus NULL as if they shared a value.
    *
    * SIZING: `expectedItems` must be >= the corpus's DISTINCT key
    * count. Undersizing saturates the filter's bits and the realized
    * false-positive rate climbs toward 1 — the gate then degrades to
    * pass-through (every row proceeds to the verification join:
    * correct, since the no-false-negative side never depends on
    * sizing, but the pre-filtering benefit is gone). Size from a
    * cheap upper bound (row count / approx_count_distinct) and round
    * up; overestimating only costs bits.
    *
    * Returns `batch` plus a `might_be_dup` boolean.
    */
  def bloomGate(
      corpus: DataFrame,
      batch: DataFrame,
      keyCol: String = "text",
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val filter = corpus
      .filter(col(keyCol).isNotNull)
      .select(xxhash64(col(keyCol)).as("__bloom_key"))
      .stat.bloomFilter("__bloom_key", expectedItems, fpp)
    batch.withColumn("might_be_dup",
      col(keyCol).isNotNull &&
        graft.functions.BloomExprs.bloom_might_contain(
          filter, xxhash64(col(keyCol))))
  }
}
