package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 connector generating deterministic ADS-B-style state
  * snapshots — the connector slot the reference fills with an HTTP
  * client (`/api/states/all`), rebuilt as a first-class distributed
  * source: the scan is split into `partitions` independent input
  * partitions (each executor generates its own range — nothing is
  * funnelled through the driver), and required-column pushdown means a
  * projection of 2 of the 4 columns only materializes those 2.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-states")
  *     .option("rows", 1000000).option("partitions", 32)
  *     .option("seed", 42).load()
  * }}}
  *
  * Rows are a pure function of (seed, row index) — splitmix64 — so any
  * subset, any partitioning, and repeated reads agree exactly.
  */
class StatesV2Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-states"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatesV2Source.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatesV2Table(new CaseInsensitiveStringMap(properties))
}

object StatesV2Source {
  val schema: StructType = StructType(Seq(
    StructField("icao24", StringType, nullable = false),
    StructField("last_contact", LongType, nullable = false),
    StructField("velocity", DoubleType, nullable = true),
    StructField("vertical_rate", DoubleType, nullable = true)))

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

class StatesV2Table(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = "graft_states"
  override def schema(): StructType = StatesV2Source.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the load-time options as table properties; the
    // per-read options arrive here. Merge with read options winning.
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ caseInsensitiveOptions.asScala).asJava)
    new StatesV2ScanBuilder(merged)
  }
}

class StatesV2ScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates with SupportsPushDownFilters
  with SupportsPushDownLimit {

  private var required: StructType = StatesV2Source.schema
  private var countStarPushed = false
  private var pushedAgg: Option[(Seq[StatesV2Agg], Seq[String])] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  // LIMIT n with no pushed filters is FULLY answerable by generating
  // only the first n indices (deterministic source — the prefix IS a
  // valid limit result), so Spark drops its own Limit. With filters
  // the cap is per-partition best-effort (partial push): each reader
  // stops after n surviving rows and Spark keeps the global Limit.
  override def pushLimit(l: Int): Boolean = {
    // defensive: never compose with an aggregate push (a limit above
    // an aggregate is not supposed to reach the scan, but a contract
    // drift here would silently truncate aggregation input)
    if (countStarPushed || pushedAgg.nonEmpty) return false
    limit = Some(l)
    true
  }

  override def isPartiallyPushed(): Boolean = pushed.nonEmpty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Filters over the generated columns are evaluated at generation
  // time inside each partition reader — rows that fail never become
  // InternalRows and never cross the scan boundary, and Spark drops
  // its own Filter node for fully-pushed predicates. Unsupported
  // shapes are returned as residuals for Spark to evaluate.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(StatesV2FilterEval.supported)
    pushed = sup
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // COUNT(*) with no grouping is answerable from the `rows` option
  // alone — complete pushdown, zero rows generated. Only valid on an
  // UNFILTERED scan: with pushed filters the count depends on the
  // data. Everything else stays in Spark.
  override def supportCompletePushDown(
      aggregation: aggregate.Aggregation): Boolean =
    isBareCountStar(aggregation) && pushed.isEmpty

  // Beyond the complete COUNT(*) case, PARTIAL aggregate pushdown:
  // each partition reader pre-aggregates its own range and emits one
  // row per (partition, group) — Spark plans the final merge (sum of
  // counts, min of mins, ...) on top. At scale this is the difference
  // between shuffling every generated row to the aggregation and
  // shuffling one row per group per partition.
  override def pushAggregation(
      aggregation: aggregate.Aggregation): Boolean = {
    if (isBareCountStar(aggregation) && pushed.isEmpty) {
      countStarPushed = true
      true
    } else {
      pushedAgg = StatesV2Agg.convert(aggregation)
      pushedAgg.isDefined
    }
  }

  private def isBareCountStar(a: aggregate.Aggregation): Boolean =
    a.groupByExpressions.isEmpty &&
      a.aggregateExpressions.length == 1 &&
      a.aggregateExpressions.head.isInstanceOf[aggregate.CountStar]

  override def build(): Scan = StatesV2Scan(
    rows = options.getLong("rows", 1000L),
    partitions = options.getInt("partitions", 4),
    seed = options.getLong("seed", 0L),
    rowsPerBatch = options.getLong("rowsPerBatch", 100L),
    maxRows = options.getLong("maxRows", 1000L),
    required = required,
    countStarPushed = countStarPushed,
    // Seq, not Array: the scan is a case class, and array fields
    // compare by reference — identical filtered scans would never be
    // equal, defeating plan canonicalization and scan reuse.
    pushed = pushed.toSeq,
    agg = pushedAgg,
    limit = limit,
    columnar = options.getBoolean("columnar", false))
}

/** A pushed aggregate call, reduced to a serializable shape the
  * partition readers can evaluate (the connector Aggregation classes
  * are not meant to travel to executors).
  */
sealed trait StatesV2Agg extends Serializable {
  /** Partial-buffer type this aggregate emits per (partition, group). */
  def bufferType: StructField
}

object StatesV2Agg {
  import aggregate._

  private def colType(name: String): DataType =
    StatesV2Source.schema(name).dataType

  final case class PCountStar() extends StatesV2Agg {
    val bufferType = StructField("count_star", LongType, nullable = false)
  }
  final case class PCount(col: String) extends StatesV2Agg {
    val bufferType = StructField(s"count_$col", LongType, nullable = false)
  }
  final case class PMin(col: String) extends StatesV2Agg {
    val bufferType = StructField(s"min_$col", colType(col), nullable = true)
  }
  final case class PMax(col: String) extends StatesV2Agg {
    val bufferType = StructField(s"max_$col", colType(col), nullable = true)
  }
  final case class PSum(col: String) extends StatesV2Agg {
    val bufferType = StructField(s"sum_$col", colType(col), nullable = true)
  }

  private def refName(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: org.apache.spark.sql.connector.expressions.NamedReference
        if f.fieldNames.length == 1 &&
          StatesV2Source.schema.fieldNames.contains(f.fieldNames()(0)) =>
      Some(f.fieldNames()(0))
    case _ => None
  }

  /** Accepts min/max/count/count(*)/sum over source columns (no
    * DISTINCT — a distinct partial cannot be merged) with plain-column
    * grouping; anything else declines the push and runs in Spark.
    */
  def convert(a: Aggregation): Option[(Seq[StatesV2Agg], Seq[String])] = {
    val groups = a.groupByExpressions.toSeq.map(refName)
    val aggs = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(PCountStar())
      case c: Count if !c.isDistinct => refName(c.column).map(PCount)
      case m: Min => refName(m.column).map(PMin)
      case m: Max => refName(m.column).map(PMax)
      case s: Sum if !s.isDistinct &&
          refName(s.column).exists(n => colType(n) != StringType) =>
        refName(s.column).map(PSum)
      case _ => None
    }
    if (aggs.nonEmpty && aggs.forall(_.isDefined) && groups.forall(_.isDefined))
      Some((aggs.flatten, groups.flatten))
    else None
  }
}

/** Three-valued-logic evaluation of pushed V1 filters against the pure
  * (seed, index) row derivation. A row survives iff every pushed filter
  * evaluates to Some(true) — `None` (NULL) rejects, matching SQL WHERE
  * semantics, so `Not(...)` over a NULL column cannot leak rows that
  * Spark's own Filter would drop.
  */
object StatesV2FilterEval {
  private val cols =
    Set("icao24", "last_contact", "velocity", "vertical_rate")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => cols(a)
    case GreaterThan(a, _) => cols(a)
    case GreaterThanOrEqual(a, _) => cols(a)
    case LessThan(a, _) => cols(a)
    case LessThanOrEqual(a, _) => cols(a)
    case In(a, _) => cols(a)
    case IsNull(a) => cols(a)
    case IsNotNull(a) => cols(a)
    case StringStartsWith(a, _) => cols(a)
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  /** THE per-column derivation — the reader's getters wrap these same
    * lambdas, so filter evaluation and row materialization share one
    * source of truth and can never silently diverge. Dispatch happens
    * once per binding, not per row.
    */
  def getter(name: String): Long => Any = name match {
    case "icao24" => h => "%06x".format(h & 0xffffffL)
    case "last_contact" => h => 1700000000L + ((h >>> 24) & 0xfffffL)
    case "velocity" => h =>
      if (((h >>> 8) % 13) == 0) null
      else ((h >>> 16) % 2000L).toDouble / 10.0
    case "vertical_rate" => h =>
      if (((h >>> 12) % 17) == 0) null
      else ((h >>> 20) % 600L).toDouble / 10.0 - 30.0
    case other =>
      throw new IllegalArgumentException(s"unknown column $other")
  }

  /** External-typed column value for filter comparison (null-able). */
  def value(name: String, h: Long): Any = getter(name)(h)

  private def cmp(a: String, h: Long, v: Any): Option[Int] = {
    val x = value(a, h)
    if (x == null || v == null) None
    else (x, v) match {
      case (s: String, t: String) => Some(s.compareTo(t))
      case (m: Number, n: Number) =>
        Some(java.lang.Double.compare(m.doubleValue(), n.doubleValue()))
      case _ => None
    }
  }

  def eval(f: Filter, h: Long): Option[Boolean] = f match {
    case EqualTo(a, v) => cmp(a, h, v).map(_ == 0)
    case GreaterThan(a, v) => cmp(a, h, v).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, h, v).map(_ >= 0)
    case LessThan(a, v) => cmp(a, h, v).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, h, v).map(_ <= 0)
    case In(a, vs) =>
      // SQL 3VL: x IN (..) is TRUE on a match, UNKNOWN (not FALSE) when
      // there is no match but x or any list element is NULL — else a
      // pushed Not(In(...)) would emit rows Spark's own Filter drops.
      if (vs.exists(v => cmp(a, h, v).contains(0))) Some(true)
      else if (value(a, h) == null || vs.contains(null)) None
      else Some(false)
    case IsNull(a) => Some(value(a, h) == null)
    case IsNotNull(a) => Some(value(a, h) != null)
    case StringStartsWith(a, p) => value(a, h) match {
      case null => None
      case s: String => Some(s.startsWith(p))
      case _ => Some(false)
    }
    case And(l, r) => (eval(l, h), eval(r, h)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, h), eval(r, h)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval(c, h).map(!_)
    // Fail fast, never filter silently: this branch is reachable only
    // if `supported` accepts a filter shape eval does not handle —
    // returning Some(false) there would silently DROP pushed rows (a
    // wrong-results bug); an exception surfaces the drift immediately.
    case other => throw new IllegalStateException(
      s"pushed filter $other has no eval branch — supported/eval drift")
  }

  // index loop, not forall: this runs once per generated row in the
  // reader's next() — Seq.forall would allocate an iterator per row
  def accepts(pushed: Seq[Filter], h: Long): Boolean = {
    var i = 0
    while (i < pushed.length) {
      if (!eval(pushed(i), h).contains(true)) return false
      i += 1
    }
    true
  }

  /** Numeric values compare by double widening in `cmp`; normalize to
    * the same key so a hash-set probe agrees with it.
    */
  private def norm(v: Any): Any = v match {
    case n: Number => java.lang.Double.valueOf(n.doubleValue())
    case other => other
  }

  /** Compile a filter list into one per-row predicate bound OUTSIDE
    * the generation loop. The payoff is In(col, values): a DPP
    * runtime filter can carry thousands of keys, and the interpreted
    * eval re-derives the column value and walks the list per row —
    * O(rows·k) string formats. Compiled, it is one derivation and one
    * hash-set probe per row; other shapes fall back to eval (already
    * O(1) per row).
    */
  def compile(filters: Seq[Filter]): Long => Boolean = {
    if (filters.isEmpty) return _ => true
    val preds: Array[Long => Boolean] = filters.map {
      case In(a, vs) if cols(a) =>
        val g = getter(a)
        val set = vs.filter(_ != null).map(norm).toSet
        // acceptance matches eval's 3VL In: only a real match is TRUE
        // (a NULL value or NULL-element no-match is UNKNOWN, a plain
        // no-match FALSE — both reject)
        (h: Long) => {
          val x = g(h)
          x != null && set.contains(norm(x))
        }
      case other =>
        (h: Long) => eval(other, h).contains(true)
    }.toArray
    (h: Long) => {
      var i = 0
      var ok = true
      while (ok && i < preds.length) {
        ok = preds(i)(h)
        i += 1
      }
      ok
    }
  }
}

/** Range partition. `filters` carries the EFFECTIVE filter list
  * (planning-time pushed + runtime/DPP): partitions are re-planned
  * AFTER runtime filters arrive, while the reader factory is forced
  * at physical planning (for the columnar decision) — filters baked
  * into the factory would silently miss every runtime filter.
  */
case class StatesV2RangePartition(
    start: Long, end: Long, seed: Long,
    filters: Seq[Filter] = Nil)
  extends InputPartition

case class StatesV2Scan(
    rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long, maxRows: Long, required: StructType,
    countStarPushed: Boolean = false,
    pushed: Seq[Filter] = Nil,
    agg: Option[(Seq[StatesV2Agg], Seq[String])] = None,
    limit: Option[Int] = None,
    columnar: Boolean = false)
  extends Scan with Batch
  with SupportsReportStatistics with SupportsRuntimeFiltering {

  // Runtime (join-driven) filters arrive DURING execution — after
  // planning, before readers are created. They prune generation the
  // same way planning-time pushed filters do; correctness never
  // depends on them (the join re-checks), so the unsupported subset
  // is simply ignored. var, not constructor state: excluded from
  // case-class equality so canonicalization/scan-reuse is unaffected.
  @transient private var runtime: Seq[Filter] = Nil

  // Size estimates are the PRE-filter, pre-aggregation upper bound
  // (the convention file sources follow): conservative for broadcast
  // decisions — a filtered/agg-pushed scan may emit far fewer rows
  // than reported, which can only make Catalyst less aggressive, and
  // it gives DPP's cost check a real denominator either way.
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = limit.map(l => math.min(rows, l.toLong)).getOrElse(rows)
    // 6-char icao24 + long + 2 nullable doubles + row overhead
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 48L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  // Only columns that survived pruning: Spark resolves these against
  // the scan OUTPUT, so naming a pruned-away column is an analysis
  // error inside the DPP rule.
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    readSchema().fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.toSeq.filter(StatesV2FilterEval.supported)

  private def effectiveFilters: Seq[Filter] = pushed ++ runtime

  override def readSchema(): StructType =
    if (countStarPushed)
      StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    else agg match {
      case Some((aggs, groups)) =>
        // Partial-aggregation contract: one row per (partition, group),
        // GROUP columns first, then the aggregate buffer columns —
        // Spark's rewrite maps them positionally and plans the final
        // merge aggregation on top.
        StructType(groups.map(g => StatesV2Source.schema(g)) ++
          aggs.map(_.bufferType))
      case None => required
    }

  // Surfaces pushed filters/aggregates in .explain() — PlanShapeSpec
  // and StatesV2AggPushdownSpec assert on it.
  override def description(): String = {
    val f = if (pushed.isEmpty) "" else
      pushed.mkString(", PushedFilters: [", ", ", "]")
    val a = agg.map { case (aggs, groups) =>
      aggs.map(_.bufferType.name).mkString(", PushedAggregation: [", ", ", "]") +
        (if (groups.isEmpty) "" else groups.mkString(" GroupBy: [", ", ", "]"))
    }.getOrElse("")
    val l = limit.map(n => s", PushedLimit: $n").getOrElse("")
    s"graft-states rows=$rows$f$a$l"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    if (countStarPushed) Array(StatesV2RangePartition(0L, 1L, seed))
    else limit match {
      // no filters: the limit is exact — only the first n indices are
      // ever generated (still split for parallelism)
      case Some(n) if pushed.isEmpty =>
        StatesV2Scan.splitRange(0L, math.min(rows, n.toLong), partitions,
          seed, effectiveFilters)
      case _ =>
        StatesV2Scan.splitRange(0L, rows, partitions, seed,
          effectiveFilters)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    if (countStarPushed) new StatesV2CountFactory(rows)
    else agg match {
      case Some((aggs, groups)) =>
        new StatesV2AggReaderFactory(aggs, groups, effectiveFilters)
      case None =>
        // per-partition cap only matters on the filtered (partial)
        // path; a fully-pushed limit already truncated the range, and
        // runtime filters pruning within that prefix is still correct
        // (the join that produced them re-checks membership anyway)
        new StatesV2ReaderFactory(required, effectiveFilters,
          limitPerPartition = if (pushed.isEmpty) None else limit,
          columnar = columnar)
    }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new StatesV2MicroBatchStream(
      rowsPerBatch, maxRows, partitions, seed, required, pushed)
}

object StatesV2Scan {
  def splitRange(
      start: Long, end: Long, partitions: Int, seed: Long,
      filters: Seq[Filter] = Nil)
      : Array[InputPartition] = {
    val total = end - start
    val n = math.max(1, partitions)
    val per = (total + n - 1) / n
    (0 until n).iterator
      .map(i => StatesV2RangePartition(
        start + i * per, math.min(end, start + (i + 1) * per), seed,
        filters))
      .filter(p => p.end > p.start)
      .toArray
  }
}

/** Offset = number of rows emitted so far; rows keep the same pure
  * (seed, index) derivation as the batch scan, so a streamed prefix
  * equals the batch read of the same length. `maxRows` bounds the
  * stream (latestOffset stops advancing), which is what lets tests —
  * and backfill jobs — drain it to completion.
  */
case class StatesV2Offset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class StatesV2MicroBatchStream(
    rowsPerBatch: Long, maxRows: Long, partitions: Int, seed: Long,
    required: StructType, pushed: Seq[Filter] = Nil)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Monotonic w.r.t. every offset this stream has seen — including ones
  // restored from a checkpoint. The no-arg latestOffset() alone CANNOT
  // be restart-safe: on restart the engine calls it BEFORE it ever
  // deserializes the restored offset, so a fresh instance would plan
  // end=rowsPerBatch and the following batch's start would regress,
  // re-emitting committed rows. SupportsAdmissionControl fixes this
  // structurally — the engine passes the restored start INTO
  // latestOffset(start, limit). deserializeOffset / planInputPartitions
  // / commit still advance as belt-and-braces.
  private var latest = 0L

  private def advanceTo(n: Long): Unit =
    latest = math.max(latest, n)

  override def initialOffset(): Offset = StatesV2Offset(0L)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    advanceTo(start.asInstanceOf[StatesV2Offset].n)
    val step = limit match {
      case _: ReadAllAvailable => maxRows // drain in one batch
      case m: ReadMaxRows => latest + m.maxRows()
      case _ => latest + rowsPerBatch
    }
    latest = math.min(maxRows, step)
    StatesV2Offset(latest)
  }

  override def latestOffset(): Offset = {
    latest = math.min(maxRows, latest + rowsPerBatch)
    StatesV2Offset(latest)
  }

  override def reportLatestOffset(): Offset = StatesV2Offset(latest)

  // Trigger.AvailableNow: "all currently available" is maxRows by
  // construction, already what latestOffset converges to — the engine
  // then drains rowsPerBatch-limited batches until it reaches it.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    advanceTo(n)
    StatesV2Offset(n)
  }

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    advanceTo(end.asInstanceOf[StatesV2Offset].n)
    StatesV2Scan.splitRange(
      start.asInstanceOf[StatesV2Offset].n,
      end.asInstanceOf[StatesV2Offset].n, partitions, seed, pushed)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StatesV2ReaderFactory(required, pushed)

  override def commit(end: Offset): Unit =
    advanceTo(end.asInstanceOf[StatesV2Offset].n)
  override def stop(): Unit = ()
}

/** Complete COUNT(*) pushdown: one partition, one row, no generation. */
class StatesV2CountFactory(rows: Long) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow(rows)
      override def close(): Unit = ()
    }
}

/** Partial aggregate pushdown: the reader walks its range once,
  * folding every surviving row into per-group buffers, and emits one
  * row per group — [group values..., agg buffers...] (the positional
  * contract readSchema() declares). Pushed filters
  * still gate rows BEFORE they reach a buffer, so filter + aggregate
  * pushdown compose. Memory is O(groups in this partition), the same
  * bound a map-side partial aggregation has.
  */
class StatesV2AggReaderFactory(
    aggs: Seq[StatesV2Agg], groups: Seq[String], pushed: Seq[Filter])
  extends PartitionReaderFactory {
  import StatesV2Agg._

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatesV2RangePartition]
    // partitions carry the authoritative filter list — re-planned
    // after runtime filters arrive (the factory is not); compiled
    // once per partition
    val accept = StatesV2FilterEval.compile(p.filters)
    val groupGetters = groups.map(StatesV2FilterEval.getter).toArray
    // bind one column getter per aggregate OUTSIDE the row loop —
    // getter() dispatches on the column name; doing it per row per
    // aggregate would add O(rows x aggs) string matches to the scan
    val aggGetters: Array[Long => Any] = aggs.map {
      case PCountStar() => null: (Long => Any)
      case PCount(c) => StatesV2FilterEval.getter(c)
      case PMin(c) => StatesV2FilterEval.getter(c)
      case PMax(c) => StatesV2FilterEval.getter(c)
      case PSum(c) => StatesV2FilterEval.getter(c)
    }.toArray
    // buffer slots: one Any per agg (counts are java.lang.Long;
    // min/max/sum hold null until the first non-null input)
    val buffers =
      new java.util.LinkedHashMap[IndexedSeq[Any], Array[Any]]()

    def fold(slot: Array[Any], h: Long): Unit = {
      var k = 0
      while (k < aggs.length) {
        aggs(k) match {
          case PCountStar() =>
            slot(k) = slot(k).asInstanceOf[java.lang.Long] + 1L
          case PCount(_) =>
            if (aggGetters(k)(h) != null)
              slot(k) = slot(k).asInstanceOf[java.lang.Long] + 1L
          case PMin(_) =>
            val v = aggGetters(k)(h)
            if (v != null && (slot(k) == null || ordLt(v, slot(k))))
              slot(k) = v
          case PMax(_) =>
            val v = aggGetters(k)(h)
            if (v != null && (slot(k) == null || ordLt(slot(k), v)))
              slot(k) = v
          case PSum(_) =>
            val v = aggGetters(k)(h)
            if (v != null) slot(k) = (slot(k), v) match {
              case (null, x) => x
              case (a: java.lang.Long, x: java.lang.Long) =>
                java.lang.Long.valueOf(a + x)
              case (a: java.lang.Double, x: java.lang.Double) =>
                java.lang.Double.valueOf(a + x)
              case (a, _) => a
            }
        }
        k += 1
      }
    }

    def ordLt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) => x.compareTo(y) < 0
      case (x: Number, y: Number) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue()) < 0
      case _ => false
    }

    def emptySlot(): Array[Any] = aggs.map {
      case PCountStar() | PCount(_) => java.lang.Long.valueOf(0L): Any
      case _ => null: Any
    }.toArray

    var i = p.start
    while (i < p.end) {
      val h = StatesV2Source.splitmix64(p.seed + i)
      if (accept(h)) {
        val key: IndexedSeq[Any] = groupGetters.map(_(h)).toIndexedSeq
        var slot = buffers.get(key)
        if (slot == null) { slot = emptySlot(); buffers.put(key, slot) }
        fold(slot, h)
      }
      i += 1
    }

    val it = buffers.entrySet().iterator()
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val e = it.next()
        val vals = e.getKey ++ e.getValue.toIndexedSeq
        current = InternalRow.fromSeq(vals.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

class StatesV2ReaderFactory(
    required: StructType, pushed: Seq[Filter] = Nil,
    limitPerPartition: Option[Int] = None,
    columnar: Boolean = false)
  extends PartitionReaderFactory {

  // Vectorized path — OPT-IN (`option("columnar", true)`): emits
  // ColumnarBatches (4096-row on-heap vectors) instead of one
  // InternalRow at a time. MEASURED OFF by default for this source:
  // vectorization pays when it amortizes a decode cost (parquet
  // pages, network wire formats); a pure-compute generator has none,
  // and the vector fill + ColumnarToRow copy made the columnar path
  // ~1.6x SLOWER than direct row generation on a 20M-row aggregate
  // (examples/ColumnarBench). The path stays fully functional — it is
  // the template a decode-bound connector would enable. Only for
  // planning-time-unfiltered scans; RUNTIME filters can still arrive
  // (Spark fixes columnar-vs-row at physical planning, BEFORE a DPP
  // subquery delivers its IN-set), so the columnar reader applies the
  // partition's filters itself via selective fill.
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && pushed.isEmpty

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val p = partition.asInstanceOf[StatesV2RangePartition]
    val batchSize = 4096
    val vectors = OnHeapColumnVector.allocateColumns(batchSize, required)
    val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
      vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
    val fills: Array[(Int, Long) => Unit] = required.fields.zipWithIndex.map {
      case (f, ci) =>
        val g = StatesV2FilterEval.getter(f.name)
        f.dataType match {
          case StringType => (row: Int, h: Long) =>
            vectors(ci).putByteArray(row,
              g(h).asInstanceOf[String].getBytes("UTF-8"))
          case LongType => (row: Int, h: Long) =>
            vectors(ci).putLong(row, g(h).asInstanceOf[Long])
          case DoubleType => (row: Int, h: Long) => g(h) match {
            case null => vectors(ci).putNull(row)
            case d => vectors(ci).putDouble(row, d.asInstanceOf[Double])
          }
          case other => throw new IllegalStateException(
            s"unexpected column type $other")
        }
    }
    // runtime (DPP) filters ride the partition — selective fill:
    // failing rows never enter the vectors. Compiled once: a DPP
    // IN-set probe is one hash lookup per row, not a list walk.
    val accept = StatesV2FilterEval.compile(p.filters)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var i = p.start
      override def next(): Boolean = {
        // single pass: the fill loop only stops on a full batch or
        // range exhaustion, so n == 0 means the range is done
        if (i >= p.end) return false
        vectors.foreach(_.reset())
        var n = 0
        while (n < batchSize && i < p.end) {
          val h = StatesV2Source.splitmix64(p.seed + i)
          if (accept(h)) {
            var c = 0
            while (c < fills.length) { fills(c)(n, h); c += 1 }
            n += 1
          }
          i += 1
        }
        batch.setNumRows(n)
        n > 0
      }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
        batch
      override def close(): Unit = batch.close()
    }
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatesV2RangePartition]
    // partitions carry the authoritative filter list (batch AND
    // streaming plan them in) — re-planned after runtime (DPP)
    // filters arrive, which the factory is not; compiled once
    val accept = StatesV2FilterEval.compile(p.filters)
    // bind the projection once per partition, not per row — each getter
    // wraps the SINGLE per-column derivation in StatesV2FilterEval
    // (strings converted to UTF8String for InternalRow), so filter
    // evaluation and row materialization can never diverge
    val getters: Array[Long => Any] = required.fields.map { f =>
      val g = StatesV2FilterEval.getter(f.name)
      if (f.dataType == StringType)
        (h: Long) => UTF8String.fromString(g(h).asInstanceOf[String])
      else g
    }
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      private var h = 0L
      private var emitted = 0
      private val cap = limitPerPartition.getOrElse(Int.MaxValue)
      // pushed filters are checked on the raw hash BEFORE any column
      // materialization — failing rows never allocate an InternalRow
      // and never leave the reader (may reference columns outside the
      // pruned projection; evaluated independently of `getters`).
      // A partially-pushed limit stops the walk after `cap` surviving
      // rows — Spark's own Limit still applies globally.
      override def next(): Boolean = {
        if (emitted >= cap) return false
        while ({ i += 1; i < p.end }) {
          h = StatesV2Source.splitmix64(p.seed + i)
          if (accept(h)) {
            emitted += 1
            return true
          }
        }
        false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(getters.map(_(h)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
