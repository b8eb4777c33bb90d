package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The forced-broadcast guard (round-16 verdict item 1): a
  * `broadcast()` hint pins the build side into executor+driver
  * memory REGARDLESS of size — correct at every bundled sf and an
  * OOM at 100× when the hinted table grows with the data. AQE
  * already broadcasts whatever its file statistics say fits, and
  * shuffles (row-identically) past that, so the hint's only
  * legitimate use is a subtree whose cardinality is provably
  * SCALE-INVARIANT. This spec walks every `SparkEntry.queries`
  * ANALYZED plan and requires each broadcast hint to prove exactly
  * that, structurally:
  *
  *   - a global aggregate (no grouping columns) — ≤ 1 row;
  *   - a LIMIT — explicitly bounded;
  *   - every leaf a scale-invariant source: the fixed dims
  *     (region 5 / nation 25 rows at every sf), a LocalRelation
  *     (driver-built literal data: collected model tables, probe
  *     constants), or a small literal Range;
  *   - or a grouped aggregate whose grouping key has bounded,
  *     data-independent cardinality — not provable from the plan, so
  *     those sites carry an explicit entry in `justified` below with
  *     the bound written down.
  *
  * A new unhinted-unprovable broadcast anywhere in the 208-query
  * surface fails this spec by name — the class can't silently
  * re-enter (the round-16 removeBatch/load precedent, generalized).
  */
class BroadcastHintAuditSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  /** Scale-invariant parquet leaves: fixed-cardinality TPC-H dims. */
  private val boundedTables = Set("region.parquet", "nation.parquet")

  /** Hints the static rules can't prove, each with its cardinality
    * argument written down. Value = max allowed unproven hints in
    * that query's plan; one MORE than this fails the audit, so a new
    * unbounded hint can't hide behind an existing justification.
    */
  private val justified: Map[String, Int] = Map(
    // PageRank's rank table broadcast is GATED behind a runtime
    // count check (nNodes <= broadcastNodeLimit, PageRank.scala) —
    // the measured-bound pattern; past the gate it joins unhinted
    "p2_pagerank" -> 1,
    "p4_personalized_pagerank" -> 1,
    // per-event_type median/MAD/threshold tables: event_type is a
    // fixed enum (one row per type per table)
    "q53_mad_anomaly" -> 3,
    // decile-band revenue table — ≤ bucket-count rows by ntile
    "q81_pareto_parts" -> 1,
    // ABC class cut table — ≤ 3 classes
    "q82_abc_inventory" -> 1,
    // the aircraft-metadata dimension: registry-bounded (world
    // fleet, not fact-proportional) and the REFERENCE broadcast-
    // joins it — J2 fidelity (reference complete_flights join)
    "ref_complete_flights" -> 1,
    "ref_pipeline_e2e" -> 1,
    // k-means centroid (k×dim), per-cluster inertia, and k² pairwise
    // separation tables — k-bounded model artifacts
    "s20_cluster_metrics" -> 3,
    // per-dimension SQ8 quantization bounds — groupBy the posexplode
    // index, ≤ vector-dims rows
    "s22_sq8_rerank" -> 2,
    // per-lang quartile threshold — lang enum
    "t21_adaptive_quality_gate" -> 1,
    // DSIR hash-bucket weight/count tables — ≤ bucket modulus rows
    "t23_dsir_select" -> 3,
    // per-lang winsor bounds — lang enum
    "t24_winsorize" -> 1,
    // df of the LITERAL query-term list — ≤ |terms| rows
    "t25_bm25_topk" -> 1,
    // per-lang tercile cuts — lang enum
    "t26_lm_buckets" -> 1,
    // per-source gram totals — source enum
    "t29_source_overlap" -> 2,
    // per-n_tokens curriculum offsets: value-domain bounded (max doc
    // length) and GlobalOrder hard-requires keys <= maxKeys
    "t35_length_curriculum" -> 1,
    // count-min sketch table — ≤ depth×width rows by construction
    "t36_cms_frequency" -> 1)

  private def leafBounded(p: LogicalPlan): Boolean = p match {
    case r: LogicalRelation => r.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.forall(rp =>
        boundedTables.exists(rp.toString.contains))
      case _ => false
    }
    case _: LocalRelation => true
    case _: OneRowRelation => true
    case r: Range => r.numElements.isValidInt &&
      r.numElements.toInt <= 10000
    case _ => false
  }

  /** Dense non-negative id columns (the TESTDATA contract: ids run
    * 0..n-1), so a literal prefix filter `id < K` / `id in (…)`
    * bounds rows by K at EVERY scale — the standard "query workload"
    * side of the similarity queries.
    */
  private val idCols = Set("vec_id", "doc_id", "q_id")

  /** The analyzed plan keeps type-promotion Casts around literals
    * (constant folding is the optimizer's) — strip them.
    */
  private def litVal(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Cast(c, _, _, _) => litVal(c)
    case _ => None
  }

  private def idAttr(e: Expression): Boolean = e match {
    case a: AttributeReference => idCols(a.name)
    case Cast(c, _, _, _) => idAttr(c)
    case _ => false
  }

  private def idPrefixBound(e: Expression): Boolean = e match {
    case And(l, r) => idPrefixBound(l) || idPrefixBound(r)
    case LessThan(a, l) if idAttr(a) =>
      litVal(l).exists(_ <= 4096L)
    case LessThanOrEqual(a, l) if idAttr(a) =>
      litVal(l).exists(_ < 4096L)
    case EqualTo(a, l) if idAttr(a) => litVal(l).isDefined
    case In(a, vs) if idAttr(a) =>
      vs.forall(v => litVal(v).isDefined) && vs.size <= 4096
    case _ => false
  }

  private def subtreeBounded(p: LogicalPlan): Boolean = {
    val globalAgg = p.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }.nonEmpty
    val limited = p.collectFirst {
      case l: GlobalLimit => l
      case l: LocalLimit => l
    }.nonEmpty
    val idPrefixed = p.collectFirst {
      case f: Filter if idPrefixBound(f.condition) => f
    }.nonEmpty
    val leaves = p.collectLeaves()
    globalAgg || limited || idPrefixed ||
      (leaves.nonEmpty && leaves.forall(leafBounded))
  }

  test("every broadcast() hint across all queries sits over a " +
      "provably scale-invariant subtree (or carries a written-down " +
      "justification) — data-growing tables are never force-pinned " +
      "into memory") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = org.apache.spark.sql.graft.bridge
        .analyzed(fn(spark, dir))
      val hints = plan.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
          h
      }
      val unproven = hints.filterNot(h => subtreeBounded(h.child))
      val allowed = justified.getOrElse(name, 0)
      if (unproven.size > allowed)
        offenders += s"$name: ${unproven.size} unproven (allowed " +
          s"$allowed): " + unproven.map { h =>
            h.child.collectLeaves().map {
              case r: LogicalRelation => r.relation match {
                case hf: HadoopFsRelation => hf.location.rootPaths
                  .map(p => p.getName).mkString("+")
                case other => other.getClass.getSimpleName
              }
              case l => l.getClass.getSimpleName
            }.distinct.mkString("|")
          }.mkString(" ; ")
    }
    assert(offenders.isEmpty,
      s"forced broadcasts over data-growing subtrees:\n" +
        offenders.mkString("\n---\n"))
  }
}
