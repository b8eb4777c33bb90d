package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate-nearest-neighbor search — the fourth ANN
  * architecture beside IVF (IvfIndex), PQ (PqIndex), and LSH
  * (SemanticDedup), and the one most production vector stores
  * actually deploy (NSW/HNSW family: Malkov & Yashunin 2018). Two
  * phases, both DataFrame-native:
  *
  * **Graph build** — a k-NN graph from the SemanticDedup SRP-LSH
  * candidate machinery (banded signature equi-joins, never an
  * all-pairs scan): candidate pairs within `maxHamming` signature
  * bits are scored with the codegen'd exact cosine, SYMMETRIZED
  * (NSW graphs are navigable in both directions), and cut to each
  * node's `graphDegree` best neighbors with a per-node window — edge
  * rows (node, nbr), ~n·degree of them, the index that replaces the
  * corpus cross join.
  *
  * **Beam search** — the BfsHops fixed-round unroll applied to
  * best-first navigation: seed each query with a deterministic
  * FIXED-SIZE entry set scored exactly (an absolute seed count, NOT a
  * corpus fraction — the round-13 lesson: a fractional stride made
  * round 0 an O(n) scan per query, a constant-factor saving over the
  * exact scan rather than an index; HNSW bounds the same entry
  * problem with its O(1)-entry top layer), then per round expand the
  * current beam's out-neighbors (an equi-join of the q·beam frontier
  * into the edge table), fetch candidate vectors with an id
  * equi-join against the corpus, score, merge, and keep the `beam`
  * best per query (window over q·(beam·degree) rows — query-sized,
  * never corpus-sized). A fixed `rounds` budget replaces HNSW's
  * greedy convergence test so the whole search is a static plan;
  * dedup across rounds is the merge window itself.
  *
  * Scale shape: graph build is the LSH-join cost (the d4/s7 family's
  * banded equi-join, linear in collisions) plus the bounded
  * n·degree² NN-descent rounds; search SCORES O(seeds + rounds·beam·
  * degree) vectors per query — corpus-independent — while the
  * per-round candidate FETCH is an id equi-join against the corpus
  * (locally a narrow scan + tiny-side broadcast probe; at 100 TB an
  * id-bucketed corpus layout makes it a co-located lookup join).
  * Every step is deterministic (ties break on id everywhere), so
  * results are reproducible and the s5-style recall-floor contract
  * is hash-checkable.
  *
  * RECALL-AT-SCALE (measured, SCALE.md round 14): on unstructured
  * (near-random high-dim) corpora, `graphDegree` is the recall lever
  * and must grow roughly with log(corpus) — degree 8 holds the level
  * at 2k vectors, 32 at 20k–200k with a wider beam; rounds beyond 4
  * move nothing once the graph is non-navigable (the beam converges).
  * Structured corpora (planted clusters, KnnBeamSpec) hold ≥0.85
  * recall at degree 8 across sizes. Budget the build accordingly:
  * NN-descent shuffles n·degree² candidate rows per refine round.
  */
object KnnBeam {

  /** ceil(log2(x)) for x >= 1. */
  private def ceilLog2(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1L)

  /** Sentinel for `graphDegree`: derive the degree from the corpus
    * count — the `adaptiveBandRows` pattern applied to SCALE.md
    * Finding 2 (recall on unstructured corpora needs degree ~log n;
    * a fixed degree 8 collapsed 5–7/50 at the 10× decade).
    */
  val AutoDegree = 0

  /** Build-time corpus-vector broadcast budget (bytes of raw floats,
    * n·dims·4): up to this size the NN-descent score joins
    * force-broadcast the (id, vector) fetch side, converting the
    * wedge-row shuffle from n·degree²·(ids + one 64-float vector) to
    * ids-only. 256 MB ≈ 1M vectors at dim 64 — a comfortable hash
    * relation on any executor sized for this build job; past it the
    * joins run unhinted (AQE shuffles them — an unbounded corpus is
    * never force-pinned). The gate floor sits at 8 MB, just under
    * AQE's default auto-broadcast ceiling, so at every bundled scale
    * the hint is absent and plans stay byte-identical.
    */
  val VecBroadcastBudget: Long = 256L << 20

  /** degree = max(8, min(32, 8·(⌈log2 n⌉ − 11))): pinned to BOTH
    * measured points — 8 holds the recall level at n ≤ 2k (every
    * bundled corpus, so shipped hashes are unchanged) and 32 is what
    * the 10×–100× dim-permuted decades needed (SCALE.md Finding 2);
    * the 32 cap is the measurement boundary, not an asymptote —
    * recalibrate past 200k rather than extrapolate (NN-descent pays
    * n·degree² per refine round; the degree-64 wedge shuffle is a
    * recorded box limit).
    */
  private[graft] def autoDegree(n: Long): Int =
    math.max(8, math.min(32, 8 * (ceilLog2(math.max(1L, n)) - 11)))

  private def resolveDegree(graphDegree: Int, n: => Long): Int = {
    require(graphDegree >= 0,
      s"graphDegree must be AutoDegree (0) or positive: $graphDegree")
    if (graphDegree == AutoDegree) autoDegree(n) else graphDegree
  }

  /** Sentinel for `beam`: derive the serving beam from the corpus
    * count (the [[AutoDegree]] pattern applied to the SERVE side —
    * the round-15 weak item: the shipped fixed beam 24 measured 7/50
    * recall at the 200k decade where beam 96 + rounds 8 reach 24/50).
    */
  val AutoBeam = 0

  /** Sentinel for `rounds` (0 is a legal explicit budget, so the
    * sentinel is negative).
    */
  val AutoRounds = -1

  /** Auto serving budget at corpus count `n`: beam = 4·degree,
    * rounds = max(4, degree/4), with degree = [[autoDegree]](n) — ONE
    * rule for both the plain and the FILTERED search (the filtered
    * qualified accumulator rides the same navigation budget). Pinned
    * to the round-16 measured points (SCALE.md, hash-threshold
    * seeds): degree 8 → (32, 4) — covering every bundled corpus,
    * where beam 32 is exactly s28's calibrated filtered config and
    * buys the plain search +1 hit at the binding sf0.1 — and degree
    * 32 → (128, 8), the cheapest swept config holding the ≥20/50
    * floor at the 200k decade (beam 96: 17/50; 128: 24/50; 192:
    * 31/50; rounds 12 and seeds 256 move nothing at beam 128).
    * Per-query serve work is O(seeds + rounds·beam·degree) scored
    * vectors — corpus-independent — so the auto budget grows the
    * serve cost ~8× per decade past 4k vectors while recall holds,
    * instead of holding cost flat while recall collapses.
    */
  private[graft] def serveBudget(n: Long): (Int, Int) = {
    val d = autoDegree(n)
    (4 * d, math.max(4, d / 4))
  }

  private def resolveServe(
      beam: Int, rounds: Int, n: => Long): (Int, Int) =
    if (beam == AutoBeam || rounds == AutoRounds) {
      val (ab, ar) = serveBudget(n)
      (if (beam == AutoBeam) ab else beam,
        if (rounds == AutoRounds) ar else rounds)
    } else (beam, rounds)

  /** (bits, nBands) of the adaptive banding at corpus count `n` —
    * shared by [[buildGraph]]'s transient banding and the PERSISTED
    * [[BandIndex]], so an index built at count n bands exactly the
    * way the transient path would.
    */
  private[graft] def bandParams(
      n: Long, targetBucket: Long = 32L): (Int, Int) = {
    val bits = math.min(16,
      math.max(8, ceilLog2(math.max(1L, n / targetBucket))))
    (bits, math.max(1, 32 / bits))
  }

  /** ADAPTIVE banding of the 32-bit SRP signature: band width grows
    * with log(corpus) so each (band, value) bucket holds a BOUNDED
    * ~`targetBucket` vectors — the fix for the fixed-width trap: a
    * constant 8-bit band space has only 256 values, so buckets grow
    * n/256 and the candidate self-join is Σ|bucket|² = O(n²/256) (it
    * filled the box's disk at the 100× decade). bits =
    * min(16, max(8, ceil(log2(n/targetBucket)))), nBands = 32 div bits
    * (overlapping the signature from bit 0 — bands stay disjoint
    * prefixes of shifted windows as in SemanticDedup). At the bundled
    * corpora (n ≤ 2000) this degenerates to SemanticDedup's exact
    * 4×8 scheme, so shipped hashes are unchanged; the adaptivity only
    * engages where the fixed scheme breaks. The 16-bit CAP keeps
    * nBands ≥ 2 (round-14 ADVICE: uncapped, ~2M vectors would reach
    * bits=17 → ONE band, dropping LSH OR-amplification entirely — a
    * recall cliff). The price of the cap is bucket occupancy growing
    * past targetBucket beyond ~2M·targetBucket vectors (Σ|bucket|²
    * grows again); past that regime, re-band with a wider signature
    * (64-bit SRP → 4×16 bands) rather than fewer bands.
    */
  private def adaptiveBandRows(
      sig: DataFrame, n: Long, targetBucket: Long = 32L): DataFrame = {
    val (bits, nBands) = bandParams(n, targetBucket)
    (0 until nBands).map { b =>
      sig.select(col("vec_id"), col("srp"), lit(b).as("band"),
        shiftright(col("srp"), b * bits)
          .bitwiseAND((1L << bits) - 1L).as("bv"))
    }.reduce(_ unionByName _)
  }

  /** (node, nbr, cosine) edge rows: each node's `graphDegree` nearest
    * LSH candidates by exact cosine, symmetrized THEN cut (so a hub
    * can still be entered from the nodes that chose it), then
    * improved by `refineRounds` of NN-DESCENT (Dong, Moses & Li
    * 2011): per round, each node's candidate set grows by its
    * neighbors' neighbors (the wedge join — bounded at degree²
    * candidates per node by the cut, so n·degree² rows total, linear
    * in n at fixed degree), scores exactly, and re-cuts to the
    * `graphDegree` best. On corpora where LSH collisions are weakly
    * informative (high-dim near-random vectors), a couple of descent
    * rounds is what turns the graph from "random candidates" into a
    * navigable k-NN graph — the published construction real NSW
    * stacks use at scale.
    *
    * Isolated nodes (no band collision within `maxHamming`) have no
    * edges — entry seeds, not graph repair, are what bounds their
    * recall cost.
    *
    * The build-time exact score rides along on every edge so
    * incremental maintenance ([[insertBatchIndexed]]) can re-cut
    * affected neighborhoods WITHOUT refetching vectors (cosine is
    * deterministic, so a stored score equals a recomputed one
    * bit-for-bit). [[search]] ignores the extra column.
    */
  def buildGraph(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      graphDegree: Int = AutoDegree,
      maxHamming: Int = 16,
      refineRounds: Int = 2,
      vecBroadcastBudget: Long = VecBroadcastBudget): DataFrame = {
    require(refineRounds >= 0, s"negative refineRounds: $refineRounds")
    val c = emb.select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    val sig = SemanticDedup.signatures(emb, idCol, vecCol, dims)
      .localCheckpoint(true)
    val n = sig.count()
    val degree = resolveDegree(graphDegree, n)
    // the vector-fetch side of the score joins, gated by MEASURED
    // size (n·dims·4 bytes): past AQE's own ~10 MB ceiling but under
    // the budget, force the broadcast — without it the second fetch
    // join shuffles the n·degree² wedge rows WITH a 64-float vector
    // attached (≈56 GB at the 200k/degree-32 decade, the s28 1.21
    // exponent; the ids-only wedge is ≈3 GB), and one ~50–250 MB
    // hash relation per executor is the cheap side of that trade.
    // Below AQE's ceiling the hint adds nothing (AQE broadcasts from
    // statistics — bundled scales keep byte-identical plans); past
    // the budget the corpus no longer fits an executor and the join
    // must be allowed to shuffle — never force-broadcast unbounded
    // (the removeBatch/load precedent)
    val vecBytes = n * dims.toLong * 4L
    val cSide =
      if (vecBytes > (8L << 20) && vecBytes <= vecBroadcastBudget)
        broadcast(c)
      else c
    val w = Window.partitionBy("node")
      .orderBy(col("cosine").desc, col("nbr"))
    def cut(scored: DataFrame): DataFrame = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= degree)
      .select("node", "nbr", "cosine")
    def score(cand: DataFrame): DataFrame = cand
      .join(cSide, cand("node") === cSide("__cid"))
      .withColumnRenamed("__cv", "qv").drop("__cid")
      .join(cSide, cand("nbr") === cSide("__cid"))
      .withColumnRenamed("__cv", "nv").drop("__cid")
      .withColumn("cosine", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
      .select("node", "nbr", "cosine")

    val bands = adaptiveBandRows(sig, n)
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.srp").as("fa"), col("y.srp").as("fb"))
      .distinct()
      .filter(bit_count(col("fa").bitwiseXOR(col("fb")))
        .cast("long") <= maxHamming)
      .select(col("vec_a").as("node"), col("vec_b").as("nbr"))
    val sym0 = score(pairs)
    val sym = sym0
      .unionByName(sym0.select(col("nbr").as("node"),
        col("node").as("nbr"), col("cosine")))
    var graph = cut(sym).localCheckpoint(true)
    for (_ <- 1 to refineRounds) {
      // wedge candidates: neighbors-of-neighbors through the CURRENT
      // graph, both orientations (an undirected descent step), capped
      // at degree² per node by construction.
      //
      // Deliberately RE-SCORES stored edges (round-16 measured-and-
      // rejected, SCALE.md): carrying stored cosines through and
      // anti-joining them out of the wedge set is bit-identical but
      // SLOWER — the stored overlap is ≤ (2·degree + hits)/degree² of
      // the candidate volume, the vector fetch for it rides a
      // broadcast-hash join wherever the corpus fits an executor
      // (every measured decade), and the anti-join adds a full
      // sort-merge pass over the n·degree² wedge rows: 10× build
      // 12.2 → 29.1 s, 100× 483 → 585 s. The cheap score is cheaper
      // than the bookkeeping that avoids it.
      val edges = graph.select("node", "nbr")
      val hop2 = edges.as("a")
        .join(edges.as("b"), col("a.nbr") === col("b.node"))
        .select(col("a.node").as("node"), col("b.nbr").as("nbr"))
        .filter(col("node") =!= col("nbr"))
      val cands = edges
        .unionByName(edges.select(col("nbr").as("node"),
          col("node").as("nbr")))
        .unionByName(hop2)
        .distinct()
      val next = cut(score(cands)).localCheckpoint(true)
      org.apache.spark.sql.graft.bridge.checkpointedRdd(graph)
        .foreach(_.unpersist(blocking = false))
      graph = next
    }
    graph
  }

  /** INCREMENTAL maintenance — d12's snapshot-N+1 shape for the ANN
    * index (production vector stores insert without rebuilding): new
    * vectors LSH-join the EXISTING index for candidates (the
    * batch-vs-index equi-join — work is O(batch collisions), the
    * index side is never self-joined), their edges are scored exactly
    * and cut to `graphDegree`, and only the AFFECTED existing nodes —
    * those a new edge points at, ≤ batch·degree of them — get their
    * neighborhoods re-scored and re-cut. Untouched nodes' edges pass
    * through byte-identical. No NN-descent runs on insert: descent is
    * the BUILD-time densifier; an insert's candidates already come
    * from the live banded index, and the next full rebuild (or a
    * periodic descent sweep) re-densifies. The incremental graph is
    * therefore not edge-identical to a fresh rebuild — the contract
    * is bounded RECALL delta, pinned by KnnBeamSpec against the
    * bundled corpus and by s25's oracle floor.
    *
    * Signatures are recomputed here as a narrow map over corpus ∪
    * batch — an O(index) floor PER CALL (it also recounts the index).
    * This path stays for the index-less convenience case;
    * [[insertBatchIndexed]] over a persisted [[BandIndex]] produces
    * the IDENTICAL edge set while touching only the batch's colliding
    * buckets and the affected neighborhoods — use it for any
    * maintained deployment.
    */
  def insertBatch(
      graph: DataFrame,
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      graphDegree: Int = AutoDegree,
      maxHamming: Int = 16): DataFrame = {
    // accept graphs with or without the build-time cosine column —
    // this path re-scores everything it cuts
    val g = graph.select("node", "nbr")
    val c = corpus.select(col(idCol).cast("long").as("__cid"),
      col(vecCol).as("__cv"))
    val b = batch.select(col(idCol).cast("long").as("__cid"),
      col(vecCol).as("__cv"))
    // lazy checkpoints (round 19): flat plans as before, but the ONE
    // count action below materializes full+sigFull together and the
    // rest rides the consumer's single job — was 4 eager jobs
    val full = c.unionByName(b).localCheckpoint(false)
    val sigFull = SemanticDedup
      .signatures(full, "__cid", "__cv", dims).localCheckpoint(false)
    val sigBatch = sigFull.join(
      b.select(col("__cid").as("vec_id")), Seq("vec_id"), "left_semi")
    // batch-vs-index with the SAME adaptive band width on both sides
    // (sized from the FULL index count — bucket occupancy is an
    // index-side property), so per-batch-row fan-out stays ~bands ×
    // targetBucket at any index size
    val nFull = sigFull.count()
    val degree = resolveDegree(graphDegree, nFull)
    val cand = adaptiveBandRows(sigBatch, nFull).as("x")
      .join(adaptiveBandRows(sigFull, nFull).as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("node"), col("y.vec_id").as("nbr"),
        col("x.srp").as("fa"), col("y.srp").as("fb"))
      .distinct()
      .filter(bit_count(col("fa").bitwiseXOR(col("fb")))
        .cast("long") <= maxHamming)
      .select("node", "nbr")
    val w = Window.partitionBy("node")
      .orderBy(col("cosine").desc, col("nbr"))
    def score(pairs: DataFrame): DataFrame = pairs
      .join(full.select(col("__cid"), col("__cv").as("qv")),
        pairs("node") === col("__cid")).drop("__cid")
      .join(full.select(col("__cid"), col("__cv").as("nv")),
        col("nbr") === col("__cid")).drop("__cid")
      .withColumn("cosine", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
      .select("node", "nbr", "cosine")
    def cut(scored: DataFrame): DataFrame = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= degree)
      .select("node", "nbr")
    val batchEdges = cut(score(cand)).localCheckpoint(false)
    // symmetrize into the nodes the new edges point at, then re-cut
    // ONLY those — everything else passes through untouched
    val rev = batchEdges.select(col("nbr").as("node"),
      col("node").as("nbr"))
    val affected = rev.select("node").distinct().localCheckpoint(false)
    val merged = g.unionByName(batchEdges)
    val recut = cut(score(merged
      .join(affected, Seq("node"), "left_semi")
      .unionByName(rev).distinct()))
    merged.join(affected, Seq("node"), "left_anti")
      .unionByName(recut)
  }

  /** A PERSISTED banded-signature index — the round-14 verdict's fix
    * for [[insertBatch]]'s O(index) per-call floor (it recomputed
    * signatures + band rows + a count over the FULL corpus on every
    * insert). The index is what a production vector store maintains
    * beside the vectors: one row per (vector, band) carrying
    * (vec_id, srp, band, bv, pbv, vec) — the vector EMBEDDED so
    * candidate scoring never rejoins the corpus — plus the count and
    * banding geometry as metadata, so an insert never touches the
    * index beyond its colliding buckets.
    *
    * `pbv = pmod(bv, 256)` is the STORAGE partition key: persist
    * `rows` with `.repartition(col("band"), col("pbv"))
    * .sortWithinPartitions("bv").write.partitionBy("band", "pbv")`
    * (≤ nBands·256 directories at any corpus size — one file per
    * directory, rows bv-sorted; at the bundled 8-bit banding
    * pbv == bv exactly) and a batch's bucket filters prune the read
    * to its colliding buckets — the (band, pbv) filter prunes
    * DIRECTORIES statically, and the bare-column bv In-filter pushes
    * into parquet so row-group stats prune WITHIN a directory once
    * the banding outgrows the 256-way pbv aliasing (a directory then
    * holds 2^bits/256 buckets). This is the point-lookup layout
    * [[insertBatchIndexed]] exploits.
    *
    * Banding geometry is FIXED at build time (from the build count):
    * inserts keep the stored banding — re-banding is a rebuild
    * decision, taken when `count` outgrows the band width's
    * Σ|bucket|² budget (bandParams documents the thresholds), exactly
    * like any other index reorganization.
    */
  case class BandIndex(rows: DataFrame, count: Long, bits: Int,
      nBands: Int, churn: Long = 0L, gen: Long = 0L,
      appends: Long = 0L, tombs: Long = 0L) {
    /** Rebind to rows re-read from storage (count/geometry carried —
      * no recount).
      */
    def withRows(r: DataFrame): BandIndex = copy(rows = r)

    /** True once the maintained metadata says the index has drifted
      * past what incremental maintenance keeps healthy — pure
      * arithmetic either way (the rebuild DECISION costs nothing; the
      * rebuild itself is the index reorganization it names):
      *
      *   - GEOMETRY drift: the band width bandParams would pick at
      *     today's count no longer matches the stored one, so bucket
      *     occupancy (and with it Σ|bucket|² insert fan-out) has
      *     outgrown the targetBucket budget;
      *   - CHURN drift: maintenance ops (inserts, which skip the
      *     NN-descent densifier, and removals, which drop edges
      *     without repair) have touched more than `maxChurn` of the
      *     live corpus since the last full build. Calibrated by the
      *     round-16 drift curve (SCALE.md): ten chained no-descent
      *     inserts onto a half-corpus base at the 10× decade hold the
      *     ≥20/50 floor at EVERY step (min 31/50 at churn 0.375), but
      *     the gap to a fresh rebuild opens from parity to ~8–14 hits
      *     past churn ≈ 0.3 — the default schedules the re-densify
      *     while the maintained index is still comfortably above
      *     floor, not when it is about to fail.
      */
    def needsRebuild(targetBucket: Long = 32L,
        maxChurn: Double = 0.3): Boolean =
      bandParams(count, targetBucket)._1 != bits ||
        churn > maxChurn * count

    /** True once the store's READ AMPLIFICATION says a [[BandIndex
      * .compact]] is due — the IO analog of [[needsRebuild]] (which
      * schedules the re-densify; this schedules the cheaper file
      * fold). Pure metadata arithmetic, maintained by the store ops
      * themselves:
      *
      *   - `appends` counts [[BandIndex.append]]s since the last
      *     compact/full write. Each append lands ONE extra file per
      *     touched (band, pbv) directory, so a point-lookup that
      *     should read one bv-sorted file reads up to `appends + 1`
      *     — linear read amplification that compaction folds back
      *     to 1;
      *   - `tombs` counts tombstoned ids pending fold. Every load
      *     scans (and joins away) their dead rows and pays the
      *     tombstone-list join; compaction deletes both.
      *
      * Defaults: 16 appends is the measured fold point (SCALE.md
      * round 18, StoreAmpProbe on the 10× decade: max 10 files in
      * the hottest directory — under the appends+1 worst case, a
      * delta doesn't touch every hot directory — and the stabilized
      * point-probe at ~1.9× the compacted wall; compact folds both
      * back), and tombstones past 20% of the live count mean
      * a fifth of the physical rows are dead weight.
      */
    def needsCompact(maxAppends: Long = 16L,
        maxTombFrac: Double = 0.2): Boolean =
      appends > maxAppends || tombs > maxTombFrac * count

    /** Persist the point-lookup store layout the round-15 measurement
      * picked (flat insert curve across index decades, 63→9 s write):
      * one bv-SORTED file per (band, pbv) directory — the (band, pbv)
      * literal filter prunes directories statically, the bare-column
      * bv In-filter prunes parquet row groups within one — plus the
      * metadata (count/geometry/churn/gen) as a one-row parquet under
      * `_graft_meta` (underscore-prefixed: invisible to the rows
      * read). Every stored row carries the index's current `gen` —
      * the generation bar tombstones cut against (see [[BandIndex
      * .tombstone]]). Single-writer, like any index maintenance.
      */
    def write(dir: String): Unit = {
      rows.withColumn("gen", lit(gen))
        .repartition(col("band"), col("pbv"))
        .sortWithinPartitions("bv")
        .write.partitionBy("band", "pbv")
        .mode("overwrite").parquet(dir)
      BandIndex.writeMeta(dir, this)
    }
  }

  object BandIndex {
    private val MetaDir = "_graft_meta"
    private val TombDir = "_graft_tombstones"
    private val PendingDir = "_graft_pending"

    private[KnnBeam] def writeMeta(dir: String, idx: BandIndex): Unit = {
      val spark = idx.rows.sparkSession
      import spark.implicits._
      Seq((idx.count, idx.bits, idx.nBands, idx.churn, idx.gen,
          idx.appends, idx.tombs))
        .toDF("count", "bits", "nBands", "churn", "gen",
          "appends", "tombs")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$MetaDir")
    }

    /** The one-row store metadata, tolerant of stores written before
      * the compaction counters existed (appends/tombs default 0 —
      * the next maintenance op starts counting).
      */
    private def readMeta(spark: org.apache.spark.sql.SparkSession,
        dir: String): BandIndex = {
      val m = spark.read.parquet(s"$dir/$MetaDir").collect().head
      def longOr0(name: String): Long =
        if (m.schema.fieldNames.contains(name)) m.getAs[Long](name)
        else 0L
      BandIndex(spark.emptyDataFrame, m.getAs[Long]("count"),
        m.getAs[Int]("bits"), m.getAs[Int]("nBands"),
        m.getAs[Long]("churn"), m.getAs[Long]("gen"),
        longOr0("appends"), longOr0("tombs"))
    }

    private def fs(spark: org.apache.spark.sql.SparkSession,
        p: org.apache.hadoop.fs.Path) = StoreFiles.fs(spark, p)

    /** Rehydrate a stored index: rows re-read from the partitioned
      * store (lineage FLAT — chained in-memory inserts accumulate a
      * unionByName DAG; a load starts from the scan), tombstones
      * applied as a GENERATION-BARRED broadcast join at read: a
      * tombstone (vec_id, gen) kills the id's rows stamped at-or-below
      * that generation, so an id re-inserted AFTER its delete (whose
      * new rows [[append]] stamped with a LATER gen) survives while
      * its dead pre-delete rows stay masked — the LSM
      * sequence-number discipline; a plain anti-join on vec_id would
      * either resurrect deleted rows or swallow re-inserted ones.
      * Removals never rewrite data files — [[compact]] folds them.
      * Metadata comes from `_graft_meta` — no recount, no geometry
      * re-derivation. The `gen` column is dropped after the bar: the
      * in-memory row schema is unchanged and generations stay a
      * storage-layer concern.
      */
    def load(spark: org.apache.spark.sql.SparkSession,
        dir: String): BandIndex = {
      heal(spark, dir)
      val m = readMeta(spark, dir)
      val metaGen = m.gen
      // the metadata gen is the COMMITTED watermark: rows stamped
      // above it belong to an append whose commit (writeMeta) never
      // landed — invisible until [[recover]] rolls them forward (or
      // compact discards them); serving them would also defeat the
      // tombstone bar, whose cut is taken from the committed gen
      val rows0 = spark.read.parquet(dir)
        .filter(col("gen") <= metaGen)
      val tombPath = new org.apache.hadoop.fs.Path(dir, TombDir)
      val rows =
        if (fs(spark, tombPath).exists(tombPath)) {
          // UNHINTED join: the tombstone list is usually tiny and AQE
          // broadcasts it from its file statistics, but a
          // long-uncompacted list must be allowed to shuffle instead
          // of force-collecting to the driver
          val bar = spark.read.parquet(tombPath.toString)
            .groupBy("vec_id").agg(max("gen").as("__tgen"))
          rows0.join(bar, Seq("vec_id"), "left")
            .filter(col("__tgen").isNull || col("gen") > col("__tgen"))
            .drop("__tgen", "gen")
        } else rows0.drop("gen")
      m.withRows(rows)
    }

    /** Restore a store whose swap ([[compact]] or a full-rebuild
      * replace) crashed between its two renames: the live directory
      * is missing and the previous store sits parked at `<dir>.old`
      * — rename it back (the swap never committed; re-run it). A
      * park BESIDE a complete live store means only the post-swap
      * cleanup crashed — drop it. Runs at the start of every [[load]]
      * (one existence probe when nothing is parked), so the old
      * store stays servable across a mid-swap crash with no manual
      * step.
      *
      * CONTRACT (heal-at-load extends single-writer to swap
      * windows): because loads heal, a load racing an IN-FLIGHT
      * [[compact]]/[[replace]] swap — between its two renames —
      * would mistake the live swap for a crash, restore the park,
      * and abort the writer's rename. Loads are therefore excluded
      * during maintenance swaps, same as [[EdgeStore.heal]]'s
      * contract: the maintenance loop owns the store and pauses
      * serving loads across a swap. Healing behind a CRASHED writer
      * is always safe.
      */
    def heal(spark: org.apache.spark.sql.SparkSession,
        dir: String): Unit = {
      val live = new org.apache.hadoop.fs.Path(dir)
      val old = new org.apache.hadoop.fs.Path(dir + ".old")
      val fsys = fs(spark, old)
      if (fsys.exists(old)) {
        if (!fsys.exists(live))
          require(fsys.rename(old, live),
            s"heal: could not restore pre-swap store $old")
        else fsys.delete(old, true)
      }
    }

    /** Apply an [[insertBatchIndexed]] result to the store: append
      * ONLY the batch's band rows (delta-sized — same repartition +
      * sort discipline, so new rows land as one bv-sorted file per
      * touched directory; repeated appends accumulate one extra file
      * per touched directory until the next [[compact]]), refresh the
      * metadata, and return the RELOADED index — flat lineage for the
      * next chained insert.
      *
      * The delta is stamped with the NEXT generation (the committed
      * gen + 1, persisted to the metadata): a batch id whose
      * old rows are tombstoned — the update-in-place flow
      * (removeBatch → tombstone → insert → append) — re-admits
      * cleanly, because `load`'s generation bar masks only rows
      * stamped at-or-below the delete's gen and these new rows are
      * stamped above it. The tombstone list itself is never touched
      * here; stale entries are harmless under the bar and [[compact]]
      * folds them.
      *
      * The rows+metadata pair cannot commit atomically on a plain
      * filesystem, so append follows an INTENT-MARKER protocol: a
      * `_graft_pending` marker naming the next gen is written first,
      * then the delta rows, then the metadata (THE commit point —
      * `load` ignores rows above the committed gen), then the marker
      * clears. Every append first [[recover]]s a crashed
      * predecessor — rolling a committed-rows/uncommitted-meta
      * append forward by arithmetic, discarding a marker whose rows
      * never landed — and then probes the batch against rows of THE
      * MARKER'S OWN generation only: they exist iff the crashed
      * row-write committed, so a fully-committed batch (the
      * at-least-once redelivery after a crash) returns as a no-op
      * and a batch whose rows never landed probes zero REGARDLESS of
      * older dead rows. Scoping the probe to the pending gen (not
      * `gen <= committed`) is what makes the update-in-place flow
      * crash-safe: a redelivered batch of previously-TOMBSTONED ids
      * (remove-then-insert) must not see its ids' dead pre-delete
      * rows and conclude it already committed — and the probe still
      * runs tombstone-bar-FREE, because a batch committed and then
      * deleted leaves its physical rows in place at the pending gen
      * (tombstones never rewrite data files) and that redelivery
      * must no-op, not re-append.
      */
    def append(dir: String, ins: IndexedInsert): BandIndex = {
      val spark = ins.indexDelta.sparkSession
      val pendingGen = recoverPending(spark, dir)
      // an EMPTY batch appends nothing: advancing gen/appends for it
      // would charge the compaction trigger for a file that was never
      // written (found by the round-18 StoreAmpProbe rerun, whose
      // id-range batches on a sparse-id corpus were silently empty).
      // Behind a recovered marker the probe below handles emptiness
      // itself (present == batchN == 0 → committed no-op).
      if (pendingGen.isEmpty && ins.indexDelta.isEmpty) return ins.index
      // the committed-batch probe runs ONLY after a recovery: a
      // marker-free entry cannot be a crashed-append redelivery (the
      // protocol always leaves the marker), and a no-crash
      // redelivery is caught earlier by insertBatchIndexed's replay
      // guard — so the no-crash hot path pays zero extra jobs here
      val committed: BandIndex =
        if (pendingGen.isDefined) {
          val cur = load(spark, dir)
          // an empty marker dir (no gen file — either writePending's
          // file create crashed, so no rows of the crashed append
          // exist, or clearPending's recursive delete crashed AFTER
          // the commit, so the batch sits at the committed HEAD gen)
          // probes the head; a gen-bearing marker probes its own gen
          val probeGen = pendingGen.filter(_ >= 0L).getOrElse(cur.gen)
          val batchIds = ins.indexDelta
            .filter(col("band") === 0).select("vec_id")
            .localCheckpoint(true)
          val batchN = batchIds.count()
          // probe ONLY rows stamped with the crashed append's gen,
          // WITHOUT the tombstone bar: a batch id committed and later
          // DELETED is still a committed batch (the redelivery must
          // no-op, not crash claiming an impossible partial commit),
          // while dead OLDER rows of a tombstoned-then-reinserted id
          // carry lower gens and never reach this probe — the
          // update-in-place redelivery appends instead of silently
          // no-oping against its own corpses
          val raw = cur.withRows(
            spark.read.parquet(dir).filter(col("gen") === probeGen))
          val present = batchIds.join(
              prunedIndexRows(raw, ins.indexDelta, batchN, 8192),
              Seq("vec_id"), "left_semi").count()
          if (present == batchN) return cur // committed — no-op
          require(present == 0L,
            s"append: $present of $batchN batch ids already " +
              "committed — a partially applied batch cannot happen " +
              "under the marker protocol; the store needs compact " +
              "(or the batch is wrong)")
          cur.copy(count = cur.count + batchN,
            churn = cur.churn + batchN, gen = cur.gen + 1L,
            appends = cur.appends + 1L)
        } else ins.index.copy(gen = ins.index.gen + 1L,
          appends = ins.index.appends + 1L)
      writePending(spark, dir, committed.gen)
      ins.indexDelta.withColumn("gen", lit(committed.gen))
        .repartition(col("band"), col("pbv"))
        .sortWithinPartitions("bv")
        .write.partitionBy("band", "pbv")
        .mode("append").parquet(dir)
      writeMeta(dir, committed) // the commit point
      clearPending(spark, dir)
      load(spark, dir)
    }

    private def pendingPath(dir: String) =
      new org.apache.hadoop.fs.Path(dir, PendingDir)

    private def writePending(spark: org.apache.spark.sql.SparkSession,
        dir: String, gen: Long): Unit = {
      val p = new org.apache.hadoop.fs.Path(
        pendingPath(dir), s"gen-$gen")
      fs(spark, p).create(p, true).close()
    }

    private def clearPending(spark: org.apache.spark.sql.SparkSession,
        dir: String): Unit =
      fs(spark, pendingPath(dir)).delete(pendingPath(dir), true)

    /** Roll a crashed [[append]] forward or discard it. A pending
      * marker above the committed gen means an append wrote its
      * intent and maybe its rows but never its metadata:
      *
      *   - rows of the pending gen present (the row write's job
      *     commit landed — all-or-nothing): COMMIT by arithmetic —
      *     the delta holds nBands rows per id, so the id count read
      *     off its band-0 rows advances count/churn exactly as the
      *     crashed append would have;
      *   - no rows (crash before the row write committed): nothing
      *     happened — drop the marker.
      *
      * The orphan-row scan filters on `gen == pending`, which parquet
      * prunes to the delta files by row-group stats (committed files
      * carry only lower gens). Runs automatically at the start of
      * every append; [[compact]] instead DISCARDS uncommitted rows
      * (it rewrites the committed view). Safe to call any time.
      */
    def recover(spark: org.apache.spark.sql.SparkSession,
        dir: String): BandIndex = {
      recoverPending(spark, dir)
      load(spark, dir)
    }

    /** Repair the metadata COUNT from the store itself: one
      * column-pruned scan of the live band-0 rows (each live id holds
      * exactly one). The repair tool for [[tombstone]]'s documented
      * metadata-drift window (a crash between its list write and its
      * meta write leaves count high by that delete batch); churn and
      * gen are left as recorded — churn is a maintenance odometer,
      * not a derivable quantity, so the crashed delete's churn
      * increment stays lost (see [[tombstone]]'s drift note: the
      * under-counted churn DELAYS the rebuild trigger — repair the
      * count here, and rebuild by policy if crashes recur).
      * O(index/nBands) read — a maintenance tool, not a hot-path
      * call.
      */
    def recount(spark: org.apache.spark.sql.SparkSession,
        dir: String): BandIndex = {
      recoverPending(spark, dir)
      val idx = load(spark, dir)
      val live = idx.rows.filter(col("band") === 0)
        .select("vec_id").distinct().count()
      if (live != idx.count) writeMeta(dir, idx.copy(count = live))
      load(spark, dir)
    }

    /** @return None when no pending marker existed (the no-crash hot
      *         path); Some(pendingGen) when one did — the caller is
      *         on a crash-recovery path and must probe rows of that
      *         generation (and only that generation) to decide
      *         whether the crashed append committed. Some(-1) marks
      *         the degenerate empty-marker-dir window (no gen file
      *         survived) — the caller probes the committed head gen.
      */
    private def recoverPending(
        spark: org.apache.spark.sql.SparkSession,
        dir: String): Option[Long] = {
      val pend = pendingPath(dir)
      val fsys = fs(spark, pend)
      if (!fsys.exists(pend)) return None
      val gens = fsys.listStatus(pend).map(_.getPath.getName)
        .collect { case n if n.startsWith("gen-") =>
          n.stripPrefix("gen-").toLong }
      if (gens.isEmpty) { fsys.delete(pend, true); return Some(-1L) }
      val pGen = gens.max
      val m = readMeta(spark, dir)
      if (pGen > m.gen) {
        val orphanIds = spark.read.parquet(dir)
          .filter(col("gen") === pGen && col("band") === 0)
          .select("vec_id").distinct().count()
        if (orphanIds > 0L) {
          // rows unused by writeMeta; the rolled-forward append
          // counts toward the compaction trigger like any other
          val rolled = m.copy(count = m.count + orphanIds,
            churn = m.churn + orphanIds, gen = pGen,
            appends = m.appends + 1L)
          writeMeta(dir, rolled)
        }
      }
      fsys.delete(pend, true)
      Some(pGen)
    }

    /** Fold the store back to its canonical layout: rewrite the LIVE
      * rows (appended deltas merged, tombstones applied) as one
      * bv-sorted file per (band, pbv) directory and CLEAR the
      * tombstone list it applied. Metadata — including churn — is
      * preserved: compaction is an IO reorganization, not the
      * re-densifying rebuild `needsRebuild` schedules (no descent
      * runs, the row set is unchanged).
      *
      * WRITE-THEN-SWAP, never truncate-then-rewrite: the new store is
      * written COMPLETE to a `.compacting` sibling (reading the old
      * files directly — no executor-local checkpoint whose loss would
      * be unrecoverable), then the old directory is renamed aside,
      * the new one renamed in, and the old one deleted. A failure
      * before the first rename leaves the store untouched (a stale
      * `.compacting` is cleaned on the next attempt); a failure
      * between the renames leaves the previous store intact under
      * `<dir>.old` — and [[heal]], run by every load, renames it
      * back automatically, so the store stays servable. The
      * delete-everything-then-hope window of an in-place overwrite
      * never exists. Still single-writer, and index views loaded
      * BEFORE the compact dangle afterwards (their plans reference
      * the replaced files) — re-`load` after compacting, as with any
      * index reorganization.
      */
    def compact(spark: org.apache.spark.sql.SparkSession,
        dir: String): BandIndex = {
      val idx = load(spark, dir)
      // the rewrite folds every appended delta file and applies-and-
      // clears the tombstone list — both read-amplification counters
      // reset with it
      swapIn(spark, dir, idx.copy(appends = 0L, tombs = 0L))
      load(spark, dir)
    }

    /** Atomically replace the stored index with `idx` — the
      * [[compact]] write-then-swap discipline exposed for the
      * re-densifying REBUILD ([[IndexLifecycle.rebuildStores]]):
      * the new store (rows + metadata, no tombstones) is written
      * complete to a sibling before any rename, so a crash anywhere
      * leaves either the old store live or the old store parked at
      * `<dir>.old` — and [[heal]] (run by every load) restores the
      * park, keeping the pre-rebuild index servable. The counters
      * reset: a replacement store has one file set and no dead rows.
      */
    def replace(spark: org.apache.spark.sql.SparkSession,
        dir: String, idx: BandIndex): BandIndex = {
      swapIn(spark, dir, idx.copy(appends = 0L, tombs = 0L))
      load(spark, dir)
    }

    private def swapIn(spark: org.apache.spark.sql.SparkSession,
        dir: String, idx: BandIndex): Unit = {
      val fsys = fs(spark, new org.apache.hadoop.fs.Path(dir))
      val cur = new org.apache.hadoop.fs.Path(dir)
      val fresh = new org.apache.hadoop.fs.Path(dir + ".compacting")
      val old = new org.apache.hadoop.fs.Path(dir + ".old")
      if (fsys.exists(fresh)) fsys.delete(fresh, true) // stale attempt
      if (fsys.exists(old)) fsys.delete(old, true)
      idx.write(fresh.toString) // may read old files; they survive
      require(fsys.rename(cur, old),
        s"swapIn: could not rename $cur aside")
      require(fsys.rename(fresh, cur),
        s"swapIn: could not activate $fresh — previous store " +
          s"preserved at $old (heal restores it)")
      fsys.delete(old, true)
    }

    /** Apply a [[removeBatch]] result to the store: append the
      * removed ids to the tombstone list as (vec_id, gen) — the bar
      * is the index's CURRENT generation, so every stored row of the
      * id (all stamped at-or-below it) is masked by `load`, while a
      * later re-insert's rows ([[append]] stamps gen+1) are not. Data
      * files are never rewritten — [[compact]] folds the list.
      * Refreshes the metadata and returns the reloaded index.
      *
      * Crash window: list-then-meta, in that order — a crash between
      * the two leaves the VIEW correct (the list entry masks the
      * rows; the redelivered delete sees the ids not live and
      * no-ops) at the price of count staying one delete-batch HIGH
      * and churn one delete-batch LOW. That is METADATA DRIFT, not a
      * correctness flip (the reverse order would serve deleted rows
      * with a shrunken count) — but it is NOT a conservative drift:
      * needsRebuild fires on churn > maxChurn·count, and both errors
      * push the trigger toward firing LATER on exactly the store
      * that just churned. [[recount]] repairs the count half from
      * the live rows; the lost churn increment is not derivable
      * (churn is an odometer), so a store with repeated crashed
      * tombstones should schedule its re-densifying rebuild by
      * policy rather than wait on the under-counted trigger.
      */
    def tombstone(dir: String, rem: IndexedRemove): BandIndex = {
      rem.removedIds.select(col("vec_id"),
          lit(rem.index.gen).as("gen"))
        .write.mode("append").parquet(s"$dir/$TombDir")
      // the persisted delete is what leaves dead rows behind — count
      // it toward the compaction trigger at the persist step (the
      // in-memory removeBatch alone folds nothing into a store)
      writeMeta(dir, rem.index.copy(
        tombs = rem.index.tombs + rem.removedIds.count()))
      load(rem.removedIds.sparkSession, dir)
    }
  }

  /** One banded-signature pass over `emb` (the only full-corpus scan
    * in the index lifecycle — build time, amortized over every
    * insert it serves).
    */
  def buildBandIndex(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      targetBucket: Long = 32L): BandIndex = {
    val sig = SemanticDedup
      .signaturesWithVec(emb, idCol, vecCol, dims).localCheckpoint(false)
    val n = sig.count() // materializes the lazy checkpoint (round 19)
    val (bits, nBands) = bandParams(n, targetBucket)
    BandIndex(bandRowsOf(sig, bits, nBands), n, bits, nBands)
  }

  /** (vec_id, srp, band, bv, pbv, vec) band rows of a
    * (vec_id, srp, vec) signature frame under a FIXED geometry.
    */
  private def bandRowsOf(
      sig: DataFrame, bits: Int, nBands: Int): DataFrame =
    (0 until nBands).map { b =>
      sig.select(col("vec_id"), col("srp"), lit(b).as("band"),
        shiftright(col("srp"), b * bits)
          .bitwiseAND((1L << bits) - 1L).as("bv"),
        pmod(shiftright(col("srp"), b * bits)
          .bitwiseAND((1L << bits) - 1L), lit(256L)).cast("int")
          .as("pbv"),
        col("vec"))
    }.reduce(_ unionByName _)

  /** The point-lookup prune shared by [[insertBatchIndexed]] and
    * [[presentIds]]: the batch's bucket keys as LITERAL filters over
    * `index.rows` (band·1000 + pbv references only partition columns,
    * so a partitionBy("band","pbv") store prunes DIRECTORIES
    * statically; the bare-column bv In-filter pushes into parquet —
    * row-group stats prune within a directory on the bv-sorted
    * layout). Two conjunctive OVER-approximations of the exact
    * (band, bv) key set — exactness comes from the caller's
    * equi-join/semi-join; these only prune. Bounded by batch·nBands;
    * past `maxPruneKeys` the filter is skipped (identical rows, no
    * static prune, join keys stay available for runtime DPP).
    */
  private def prunedIndexRows(index: BandIndex, bandB: DataFrame,
      batchN: Long, maxPruneKeys: Int): DataFrame =
    if (batchN * index.nBands <= maxPruneKeys) {
      val rows = bandB
        .select((col("band") * 1000L + col("pbv")).as("k"), col("bv"))
        .distinct().collect()
      val keys = rows.map(_.getLong(0)).distinct.sorted
      val bvKeys = rows.map(_.getLong(1)).distinct.sorted
      index.rows.filter(
        (col("band") * 1000L + col("pbv")).isin(keys: _*) &&
          col("bv").isin(bvKeys: _*))
    } else index.rows

  /** Ids of `batch` rows ALREADY PRESENT in the index — the
    * replay/overlap probe, riding the same pruned bucket read as
    * [[insertBatchIndexed]]'s fail-fast guard (an unchanged vector's
    * band rows land in exactly the colliding buckets the probe
    * reads): O(batch collisions), never an index scan. The streaming
    * maintenance driver splits an at-least-once redelivery with it —
    * already-ingested ids skipped, the fresh remainder inserted.
    *
    * Detects a REPLAY (same id, same vector). A changed vector under
    * an existing id bands elsewhere and is NOT detectable
    * bucket-locally — updates stay remove-then-insert by contract.
    */
  def presentIds(index: BandIndex, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64, maxPruneKeys: Int = 8192): DataFrame = {
    val sigB = SemanticDedup.signaturesWithVec(
      batch.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("embedding")),
      "vec_id", "embedding", dims).localCheckpoint(false)
    val bandB = bandRowsOf(sigB, index.bits, index.nBands)
    bandB.select("vec_id").distinct()
      .join(prunedIndexRows(index, bandB, sigB.count(), maxPruneKeys),
        Seq("vec_id"), "left_semi")
  }

  /** The result of an indexed insert. `graph` is the full updated
    * edge view (old graph minus affected nodes, plus `delta`) — use
    * it directly for search; `delta` alone is what a store
    * maintaining edges partitioned by node overwrites (affected ∪
    * new nodes' partitions), so the WRITE is delta-sized too.
    * `indexDelta` is the batch's band rows — what [[BandIndex.append]]
    * adds to a persisted store (the in-memory `index` already unions
    * them for immediate chaining).
    */
  case class IndexedInsert(graph: DataFrame, delta: DataFrame,
      affected: DataFrame, index: BandIndex, indexDelta: DataFrame)

  /** The result of an indexed delete — [[removeBatch]]. Mirrors
    * [[IndexedInsert]]: `graph` is the full post-delete edge view,
    * `delta` the affected survivors' rewritten rows (delta-sized
    * store write), `removedIds` the live ids actually removed — what
    * [[BandIndex.tombstone]] appends to a persisted store.
    */
  case class IndexedRemove(graph: DataFrame, delta: DataFrame,
      affected: DataFrame, index: BandIndex, removedIds: DataFrame)

  /** Index-maintained [[insertBatch]] — same edges, none of the
    * O(index) work. Per call this touches:
    *
    *   - the BATCH (signatures are a narrow map over batch rows only);
    *   - the index's COLLIDING BUCKETS: the batch's distinct
    *     (band, pbv) keys (≤ batch·nBands of them) become a literal
    *     partition filter on `index.rows` — on a
    *     `partitionBy("band", "pbv")` store that is a STATIC
    *     partition prune (IndexedKnnInsertSpec pins partitions
    *     read ≤ batch buckets), and the residual bv equi-join runs on
    *     the pruned read. Above `maxPruneKeys` the filter is skipped
    *     (correctness unchanged — the equi-join still selects the
    *     same rows; the (band, pbv) join keys stay available for
    *     runtime DPP);
    *   - the old GRAPH's affected neighborhoods (≤ batch·degree
    *     nodes), fetched by the same literal-filter point-lookup —
    *     delta-sized on a node-partitioned edge store. Their stored
    *     build-time cosines make the re-cut a pure window — cosine is
    *     deterministic and symmetric (per-element products commute,
    *     accumulation order is fixed), so a stored score equals a
    *     recomputed one bit-for-bit and NO vector fetch happens at
    *     all.
    *
    * The index count advances by arithmetic (`count + batchN`,
    * batchN counted over the BATCH), never by recounting the index.
    * Batch-batch collisions are included (the batch side self-joins —
    * bounded by the batch's own bucket occupancy), so the edge set is
    * IDENTICAL to [[insertBatch]] at the same geometry and degree —
    * spec-pinned, not just recall-equivalent.
    *
    * `graph` must carry the build-time `cosine` column
    * ([[buildGraph]] output).
    *
    * IDs are IMMUTABLE KEYS: a batch must be disjoint from the index
    * (a replayed id would union duplicate band rows — future inserts
    * would score against the stale copy too — and double-count the
    * metadata count, skewing needsRebuild/autoDegree). A replay —
    * same id, same vector, the at-least-once-ingestion case — is
    * caught by a cheap semi-join riding the PRUNED bucket read (an
    * unchanged vector's band rows land in exactly the colliding
    * buckets the insert reads anyway) and fails fast; updating a
    * vector under an existing id is remove-then-insert
    * ([[removeBatch]]), never a blind re-insert — a changed vector
    * bands elsewhere, which no bucket-local check can see.
    *
    * `maxPruneKeys` caps the literal point-lookup filters (bucket
    * keys ≤ batch·nBands; affected ids ≤ batch·degree): past it the
    * code falls back to the broadcast semi-join — identical rows,
    * no static prune. 8192 covers the measured fixed-batch regime
    * (200·degree-32 = 6400 affected ids) while staying well under
    * where literal-IN expression trees, plan serialization, and
    * parquet In-filter pushdown degrade (round-15 ADVICE: the old
    * 100k cap was past all three).
    */
  def insertBatchIndexed(
      graph: DataFrame,
      index: BandIndex,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      graphDegree: Int = AutoDegree,
      maxHamming: Int = 16,
      maxPruneKeys: Int = 8192,
      assumeDisjoint: Boolean = false): IndexedInsert = {
    require(graph.columns.contains("cosine"),
      "insertBatchIndexed needs build-time cosines on the graph " +
        "edges (buildGraph keeps them); re-derive the graph or use " +
        "insertBatch")
    val g = graph.select("node", "nbr", "cosine")
    val sigB = SemanticDedup.signaturesWithVec(
      batch.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("embedding")),
      "vec_id", "embedding", dims).localCheckpoint(false)
    val batchN = sigB.count() // O(batch) — the index count is metadata
    val degree = resolveDegree(graphDegree, index.count + batchN)
    // lazy: prunedIndexRows' key collect (or the dup probe) is the
    // materializing action — no separate checkpoint job (round 19)
    val bandB = bandRowsOf(sigB, index.bits, index.nBands)
      .localCheckpoint(false)
    val idxRows = prunedIndexRows(index, bandB, batchN, maxPruneKeys)
    // replay guard (round-15 ADVICE): a batch id already in the index
    // means a replayed/overlapping batch — its band rows sit in the
    // colliding buckets this insert reads anyway, so the check is a
    // semi-join on the PRUNED read, not an index scan. A caller that
    // JUST split the batch on [[presentIds]] (the streaming loop) has
    // run the identical semi-join — `assumeDisjoint` skips the
    // guaranteed-zero re-check
    if (!assumeDisjoint) {
      val dupIds = bandB.select("vec_id").distinct()
        .join(idxRows, Seq("vec_id"), "left_semi").count()
      require(dupIds == 0L,
        s"insertBatchIndexed: $dupIds batch vec_ids already present " +
          "in the index — batches must be id-disjoint (replayed " +
          "batch?); to update a vector, removeBatch it first")
    }
    // candidates: batch vs (pruned index ∪ batch) — the batch side
    // self-joins too, so within-batch neighbors are found exactly as
    // insertBatch finds them; the index side is NEVER self-joined
    val allBands = idxRows.select("vec_id", "srp", "band", "bv",
        "pbv", "vec")
      .unionByName(bandB.select("vec_id", "srp", "band", "bv",
        "pbv", "vec"))
    // score BEFORE deduping band multiplicity: duplicates cost a few
    // extra codegen'd cosines but the dedup shuffle then moves
    // (node, nbr, cosine) rows — 24 bytes — instead of two 64-float
    // vectors per row; duplicate scores are identical, so max()
    // collapses them exactly
    val cand = bandB.as("x").join(allBands.as("y"),
        col("x.band") === col("y.band") && col("x.pbv") === col("y.pbv")
          && col("x.bv") === col("y.bv")
          && col("x.vec_id") =!= col("y.vec_id"))
      .filter(bit_count(col("x.srp").bitwiseXOR(col("y.srp")))
        .cast("long") <= maxHamming)
      .select(col("x.vec_id").as("node"), col("y.vec_id").as("nbr"),
        graft.functions.VectorExprs
          .cosine_similarity(col("x.vec"), col("y.vec")).as("cosine"))
      .groupBy("node", "nbr").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("node")
      .orderBy(col("cosine").desc, col("nbr"))
    def cut(scored: DataFrame): DataFrame = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= degree)
      .select("node", "nbr", "cosine")
    val batchEdges = cut(cand).localCheckpoint(false)
    // symmetrize into the nodes the new edges point at; their stored
    // cosines re-cut as a pure window over ≤ batch·degree
    // neighborhoods
    val rev = batchEdges.select(col("nbr").as("node"),
      col("node").as("nbr"), col("cosine"))
    val affected = rev.select("node").distinct().localCheckpoint(false)
    // the affected set is ≤ batch·degree ids — the same point-lookup
    // prune as the bucket filter: a literal id filter lets a
    // node-partitioned edge store prune statically (fall back to a
    // broadcast semi join past the cap; identical row set either way)
    // one cap+1-limited collect resolves both the branch test and the
    // literal id set (round 19: was a count job then a collect job)
    val affHead = affected.limit(maxPruneKeys + 1).collect()
      .map(_.getLong(0))
    val gAffected =
      if (affHead.length <= maxPruneKeys) {
        val ids = affHead.sorted
        g.filter(col("node").isin(ids: _*))
      } else g.join(affected, Seq("node"), "left_semi")
    val recut = cut(gAffected
      .unionByName(batchEdges.join(affected, Seq("node"), "left_semi"))
      .unionByName(rev)
      // duplicates (a pair reachable both ways) carry EQUAL cosines —
      // max() collapses them without a distinct pass
      .groupBy("node", "nbr").agg(max("cosine").as("cosine")))
    val untouchedBatch = batchEdges
      .join(affected, Seq("node"), "left_anti")
    val delta = recut.unionByName(untouchedBatch)
    val full = g.join(affected, Seq("node"), "left_anti")
      .unionByName(delta)
    IndexedInsert(full, delta, affected,
      index.copy(rows = index.rows.unionByName(bandB),
        count = index.count + batchN,
        churn = index.churn + batchN),
      bandB)
  }

  /** Tombstone-style delete — the d19 deletion-propagation shape on
    * the vector side, mirroring [[insertBatchIndexed]]'s bounded
    * touch set. Removing `removeIds` (one `idCol` column):
    *
    *   - drops the removed nodes' own edge rows and every edge
    *     POINTING AT a removed id; the affected survivors (≤
    *     removed·degree nodes) keep their remaining STORED edges —
    *     stored build-time cosines are exact, dropping rows preserves
    *     the cut's order, so the re-cut is a pure filter with no
    *     vector refetch and no re-scoring. Lost degree is NOT
    *     repaired per-delete (fresh pairs would need fresh cosines);
    *     it accumulates in the index `churn` until [[BandIndex
    *     .needsRebuild]] schedules the re-densifying rebuild — the
    *     same deal the no-descent insert makes;
    *   - the index view anti-joins the removed ids (a persisted store
    *     appends them to the tombstone list instead — [[BandIndex
    *     .tombstone]] — and folds it at the next [[BandIndex
    *     .compact]]);
    *   - metadata: count decreases and churn increases by the LIVE
    *     removed count (ids not present are ignored — deletes are
    *     idempotent), counted by one column-pruned semi-join against
    *     the index's band-0 rows (at 100 TB an id-keyed sidecar makes
    *     this a point lookup; it is the only index-sized touch here).
    *
    * Finding the affected survivors is a scan of the edge table's nbr
    * column (no store prunes by non-key column) — the VIEW is exact
    * either way; the WRITE stays delta-sized because untouched nodes'
    * rows pass through byte-identical, exactly as on insert. A
    * removed id may be re-inserted later: after the anti-join its
    * band rows are gone, so [[insertBatchIndexed]]'s replay guard
    * passes — update-in-place is exactly this remove-then-insert.
    */
  def removeBatch(
      graph: DataFrame,
      index: BandIndex,
      removeIds: DataFrame,
      idCol: String = "vec_id",
      maxPruneKeys: Int = 8192): IndexedRemove = {
    // lazy checkpoints: the ONE liveN count materializes ids+live
    // together (was 2 eager checkpoint jobs + the count — round 19)
    val ids = removeIds
      .select(col(idCol).cast("long").as("vec_id"))
      .distinct().localCheckpoint(false)
    // live removed ids: the ones actually in the index (band 0 holds
    // exactly one row per live id; the read prunes to two columns)
    val live = ids.join(
        index.rows.filter(col("band") === 0).select("vec_id"),
        Seq("vec_id"), "left_semi")
      .localCheckpoint(false)
    // ONE job resolves both the branch test and the literal id set
    // (round 19: was a count job THEN a collect job): a cap+1-limited
    // collect is exact below the cap, and only the rare over-cap path
    // still pays the full count (needed there for the metadata
    // arithmetic).
    val liveHead = live.limit(maxPruneKeys + 1).collect()
      .map(_.getLong(0))
    val liveN =
      if (liveHead.length <= maxPruneKeys) liveHead.length.toLong
      else live.count()
    // literal-prune fast path (the insert's point-lookup discipline):
    // a bounded id set filters as pushable literals; past the cap the
    // same sets come from broadcast semi/anti joins — identical rows
    val (gone, kept) =
      if (liveN == 0L) (graph.limit(0), graph)
      else if (liveN <= maxPruneKeys) {
        val arr = liveHead.sorted.map(Long.box)
        (graph.filter(col("node").isin(arr: _*) ||
            col("nbr").isin(arr: _*)),
          graph.filter(!col("node").isin(arr: _*) &&
            !col("nbr").isin(arr: _*)))
      } else {
        // past the literal cap: UNHINTED joins — a forced broadcast
        // of an unbounded delete set (a retention sweep can remove a
        // large corpus fraction) is a driver/executor OOM; AQE still
        // broadcasts when the id set actually fits the threshold, and
        // falls back to a shuffle join when it does not
        val asNode = live.select(col("vec_id").as("node"))
        val asNbr = live.select(col("vec_id").as("nbr"))
        val g = graph
          .join(asNode.withColumn("__rmn", lit(1)), Seq("node"), "left")
          .join(asNbr.withColumn("__rmb", lit(1)), Seq("nbr"), "left")
        val orig = graph.columns.map(col).toSeq
        (g.filter(col("__rmn").isNotNull || col("__rmb").isNotNull)
            .select(orig: _*),
          g.filter(col("__rmn").isNull && col("__rmb").isNull)
            .select(orig: _*))
      }
    // affected survivors: nodes that lost an edge but stay live
    val affected = gone.select("node").distinct()
      .join(live.select(col("vec_id").as("node")),
        Seq("node"), "left_anti")
      .localCheckpoint(false)
    val delta = kept.join(affected, Seq("node"), "left_semi")
    // hint the anti-join broadcast only for bounded delete sets; an
    // unbounded one rides AQE's own size decision
    val liveSide =
      if (liveN <= maxPruneKeys.toLong) broadcast(live) else live
    IndexedRemove(kept, delta, affected,
      index.copy(
        rows = index.rows.join(liveSide, Seq("vec_id"), "left_anti"),
        count = index.count - liveN,
        churn = index.churn + liveN),
      live)
  }

  /** Deterministic entry points: a FIXED ABSOLUTE number of seeds
    * (~`seedCount`, independent of corpus size), sampled by a
    * HASH THRESHOLD — keep ids whose Murmur3 hash is ≡ 0 modulo
    * ⌊n/seedCount⌋ (one cheap count action at build time, amortized
    * over every query the index serves) — so round 0 of [[search]]
    * scores O(seedCount) vectors per query at ANY corpus size. This
    * is the flat stand-in for HNSW's top layer: a bounded entry set
    * the greedy descent starts from. seedCount trades entry coverage
    * (recall on isolated graph regions) against round-0 cost —
    * recalibrate the recall floor when changing it.
    *
    * Hash-threshold, not id-modulus (the round-15 verdict item): a
    * stride on RAW ids is O(seedCount) only when ids are contiguous
    * from 0 — on a sparse id space (post-dedup survivors, sharded id
    * ranges, snowflake ids) `id % stride == 0` can select anywhere
    * from zero seeds (recall cliff: the walk has no entry) to a
    * corpus-sized set (round 0 degenerates to the exact scan). The
    * hash spreads ANY id distribution uniformly over the modulus, so
    * the expected seed count is n/stride ≈ seedCount regardless of
    * the id layout, still fully deterministic and plan-pushable (one
    * codegen'd filter over the scan, no shuffle, no sample() RNG).
    */
  def seeds(
      emb: DataFrame, idCol: String = "vec_id",
      seedCount: Int = 128): DataFrame = {
    require(seedCount >= 1, s"seedCount must be positive: $seedCount")
    val n = emb.count()
    // the modulus stays LONG: n/seedCount past 2^31 (plausible at the
    // 100 TB framing) would wrap an Int truncation to a tiny or
    // negative stride — round 0 degenerating to a corpus-sized scan
    // (or an empty entry set) exactly where the bounded entry matters
    // most. Identical selection for every stride below the boundary
    // (int→bigint promotion is value-preserving).
    val stride = math.max(1L, n / seedCount.toLong)
    emb.filter(pmod(hash(col(idCol)), lit(stride)) === 0)
      .select(col(idCol).as("node"))
  }

  /** Beam-search `topK` cosine neighbors of each query over a
    * pre-built graph. `queries` = (qIdCol, qVecCol); `corpus` =
    * (idCol, vecCol); output (q_id, n_id, rank, sim) with rank 1 the
    * best. Self-matches (q_id == n_id) are excluded, mirroring the
    * exact top-k definition the recall contract compares against.
    *
    * `corpusCount`: the corpus size the AUTO serve budget derives
    * (beam, rounds) from. Pass it when known — a maintained
    * [[BandIndex]] carries it as metadata — so the serving path stays
    * scan-free; left at the sentinel, the fallback runs ONE count job
    * over the corpus (and only when an AUTO sentinel needs it).
    */
  def search(
      graph: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      entry: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      qIdCol: String = "q_id",
      qVecCol: String = "qv",
      beam: Int = AutoBeam,
      rounds: Int = AutoRounds,
      topK: Int = 5,
      corpusCount: Long = -1L): DataFrame = {
    require(beam == AutoBeam || beam >= topK,
      s"beam $beam must cover topK $topK")
    require(rounds == AutoRounds || rounds >= 0,
      s"negative rounds: $rounds")
    // q is only ever BROADCAST (round 0 and each round's score join)
    // — identical tiny subplans that ReuseExchange collapses to one
    // broadcast build, so checkpointing it bought nothing (round 19;
    // a lazy-checkpoint variant of the whole walk was measured and
    // REVERTED: the beam is referenced by both the expansion join and
    // the merge union, and un-materialized rounds recompute in racing
    // stages — s14 2.8 → 4.3 s).
    val q = queries
      .select(col(qIdCol).as("q_id"), col(qVecCol).as("qv"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    // auto budget needs the corpus count — pass `corpusCount` (a
    // maintained BandIndex carries it as metadata) to keep the
    // serving path scan-free; the count JOB runs only as the
    // fallback, and only when an AUTO sentinel asks for it
    val (bm, rounds2) = resolveServe(beam, rounds,
      if (corpusCount >= 0L) corpusCount else c.count())
    require(bm >= topK, s"auto beam $bm must cover topK $topK")
    val sim = graft.functions.VectorExprs
      .cosine_similarity(col("qv"), col("nv"))
    val wBeam = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))

    def keepBest(scored: DataFrame, limit: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(wBeam))
      .filter(col("__rn") <= limit)
      .drop("__rn")

    // round 0: score the entry set against every query — the seed
    // table is a fixed ABSOLUTE size (seeds() derives its stride from
    // the corpus count), so this cross product is q·O(seedCount) rows
    // at any corpus size, with the query side broadcast
    var cur = keepBest(
      broadcast(q)
        .crossJoin(entry.join(c, entry("node") === c("n_id")).drop("node"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", sim)
        .select("q_id", "n_id", "sim"), bm)
      .localCheckpoint(true)

    for (_ <- 1 to rounds2) {
      // expand the beam's out-neighbors; the (q_id, n_id) frontier is
      // query-sized (q·beam rows) and joins INTO the stationary edge
      // table, then fetches exactly the candidate vectors by id.
      // No distinct() here (round 19): band-duplicate candidates cost
      // a few extra codegen'd cosines, but removing the (q_id, n_id)
      // exchange leaves ONE shuffle per round (below) — the dedup
      // happens in the merge aggregate anyway.
      val cand = cur.select(col("q_id"), col("n_id").as("node"))
        .join(graph, "node")
        .select(col("q_id"), col("nbr").as("n_id"))
      val scored = cand
        .join(c, "n_id")
        .join(broadcast(q), "q_id")
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", sim)
        .select("q_id", "n_id", "sim")
      // merge + dedup: a candidate already in the beam re-scores to
      // the identical sim (cosine is deterministic), so max() per
      // (q_id, n_id) collapses duplicates without a distinct pass.
      // The explicit q_id repartition is the round's ONLY exchange:
      // hash(q_id) satisfies the aggregate's (q_id, n_id) clustering
      // AND keepBest's q_id window, so neither inserts another
      // (round 19: was 3 exchanges — candidate distinct, aggregate,
      // window — per round).
      val next = keepBest(
        cur.unionByName(scored).repartition(col("q_id"))
          .groupBy("q_id", "n_id").agg(max("sim").as("sim")), bm)
        .localCheckpoint(true)
      org.apache.spark.sql.graft.bridge.checkpointedRdd(cur)
        .foreach(_.unpersist(blocking = false))
      cur = next
    }
    keepBest(cur, topK)
      .withColumn("rank", row_number().over(wBeam).cast("long"))
  }

  /** PREDICATE-CONSTRAINED beam search — filtered ANN on the graph
    * path (the production ask filtered HNSW answers; s17 covers the
    * IVF path): `topK` cosine neighbors of each query AMONG corpus
    * rows satisfying `pred`. The NAVIGATION beam stays UNFILTERED —
    * restricting expansion to qualifying nodes would disconnect the
    * graph exactly when the filter is selective (the known failure
    * mode of post-filtering HNSW naively); instead every scored
    * candidate also feeds a parallel QUALIFIED top-`beam` accumulator
    * per query, and the answer is that accumulator's top-`topK`.
    * Widen `beam` relative to the unfiltered search to compensate for
    * qualified hits being ~selectivity-spaced along the walk; the
    * per-round work stays q·beam·degree — corpus-independent — with
    * one boolean riding the candidate fetch.
    *
    * `pred` is evaluated on corpus rows (the id/vector columns plus
    * whatever else `corpus` carries), ONCE, in the plan — at 100 TB
    * it pushes into the corpus scan like any other predicate.
    */
  def searchFiltered(
      graph: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      entry: DataFrame,
      pred: org.apache.spark.sql.Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      qIdCol: String = "q_id",
      qVecCol: String = "qv",
      beam: Int = AutoBeam,
      rounds: Int = AutoRounds,
      topK: Int = 5,
      corpusCount: Long = -1L): DataFrame = {
    require(beam == AutoBeam || beam >= topK,
      s"beam $beam must cover topK $topK")
    require(rounds == AutoRounds || rounds >= 0,
      s"negative rounds: $rounds")
    // q rides broadcasts only — see [[search]] on why it is not
    // checkpointed (and why the rounds stay EAGER: a lazy variant
    // recomputed dual-referenced rounds in racing stages, measured
    // slower and reverted in round 19).
    val q = queries
      .select(col(qIdCol).as("q_id"), col(qVecCol).as("qv"))
    val c = corpus
      .withColumn("__ok", pred)
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"), col("__ok"))
    // auto budget: one rule for both search variants — the qualified
    // accumulator rides the same navigation budget; pass
    // `corpusCount` (BandIndex metadata) to keep serving scan-free
    val (bm, rounds2) = resolveServe(beam, rounds,
      if (corpusCount >= 0L) corpusCount else c.count())
    require(bm >= topK, s"auto beam $bm must cover topK $topK")
    val sim = graft.functions.VectorExprs
      .cosine_similarity(col("qv"), col("nv"))
    val wBeam = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))
    def keepBest(scored: DataFrame, limit: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(wBeam))
      .filter(col("__rn") <= limit)
      .drop("__rn")
    // one exchange per merge (round 19, the [[search]] trick): the
    // explicit q_id repartition satisfies both the (q_id, n_id)
    // dedup aggregate and the q_id beam window
    def merged(a: DataFrame, b: DataFrame, limit: Int): DataFrame =
      keepBest(a.unionByName(b).repartition(col("q_id"))
        .groupBy("q_id", "n_id").agg(max("sim").as("sim")), limit)

    val scored0 = broadcast(q)
      .crossJoin(entry.join(c, entry("node") === c("n_id")).drop("node"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", sim)
      .select("q_id", "n_id", "sim", "__ok")
      .localCheckpoint(true)
    var cur = keepBest(scored0.drop("__ok"), bm).localCheckpoint(true)
    var best = keepBest(scored0.filter(col("__ok")).drop("__ok"), bm)
      .localCheckpoint(true)
    // cur/best materialized eagerly above — the round-0 scored set is
    // no longer referenced (round-15 ADVICE: this chain leaked until
    // ContextCleaner GC)
    org.apache.spark.sql.graft.bridge.checkpointedRdd(scored0)
      .foreach(_.unpersist(blocking = false))
    for (_ <- 1 to rounds2) {
      // no distinct() on the expansion (round 19): duplicates re-score
      // to identical sims and the merge aggregate collapses them —
      // dropping the (q_id, n_id) exchange this side paid
      val cand = cur.select(col("q_id"), col("n_id").as("node"))
        .join(graph, "node")
        .select(col("q_id"), col("nbr").as("n_id"))
      val scored = cand
        .join(c, "n_id")
        .join(broadcast(q), "q_id")
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", sim)
        .select("q_id", "n_id", "sim", "__ok")
        .localCheckpoint(true)
      val nextCur = merged(cur, scored.drop("__ok"), bm)
        .localCheckpoint(true)
      val nextBest = merged(best,
        scored.filter(col("__ok")).drop("__ok"), bm)
        .localCheckpoint(true)
      // nextCur/nextBest are materialized — the round's scored set is
      // done too (round-15 ADVICE: it leaked alongside scored0)
      Seq(cur, best, scored).foreach(d =>
        org.apache.spark.sql.graft.bridge.checkpointedRdd(d)
          .foreach(_.unpersist(blocking = false)))
      cur = nextCur; best = nextBest
    }
    keepBest(best, topK)
      .withColumn("rank", row_number().over(wBeam).cast("long"))
  }
}
