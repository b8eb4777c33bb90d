package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL order assignment — contiguous 0-based positions
  * under `ORDER BY (key, tie)` WITHOUT the single-partition window
  * that cannot exist at 100 TB (the t21/t24 rule applied to total
  * enumeration, Spark's `zipWithIndex` problem solved in pure
  * DataFrame terms).
  *
  * Two phases:
  *   1. per-key row counts aggregate (map-side combinable), then a
  *      prefix sum over the DISTINCT-KEY table — this one window IS
  *      single-partition, but over key-cardinality rows (a curriculum
  *      bucket/length/score domain, coarse by design), never the data;
  *   2. the offsets broadcast back onto the rows, and each row takes
  *      `offset(key) + row_number() within its key` — a window
  *      PARTITIONED by key.
  *
  * `salts > 1` adds the TWO-LEVEL (key, salt) scheme that removes the
  * per-key single-task-sort ceiling (the round-12/13 advice item):
  * each key's rows split into `salts` RANGE buckets of the numeric
  * tie (bucket = a monotone function of the tie value, derived from
  * the per-key min/max the SAME counts aggregate already computes),
  * per-(key, bucket) offsets come from one more prefix sum — a window
  * PARTITIONED BY KEY over ≤ `salts` rows — and each row takes
  * `offset(key) + offset(key, bucket) + row_number() within its
  * bucket`. Because the bucket is monotone in the tie, the positions
  * are EXACTLY the salts=1 positions (bucketing affects only load
  * balance, never order), and the heaviest single-task sort shrinks
  * from the heaviest KEY to the heaviest (key, bucket) — ~corpus/
  * (nKeys·salts) under value-uniform ties. Value CONCENTRATION (many
  * rows in a narrow tie range) can still overfill one bucket; that is
  * checked from the sub-key counts and fails with a named error, not
  * an executor OOM.
  *
  * `salts = AutoSalts (0)` makes the operator PICK: the counts
  * aggregate phase 1 runs anyway already measures the heaviest key,
  * so auto mode ships the flat single-shuffle plan whenever
  * `maxPerKey <= maxRowsPerKey` and escalates to the salted plan —
  * with just enough salts (2× headroom over the uniform split) — only
  * when the single-task ceiling is actually threatened. The round-14
  * lesson: t35 paid the salted plan's second shuffle unconditionally
  * at bundled scale, where the flat plan was provably safe. Positions
  * are identical either way, so the choice is pure load balance.
  *
  * Position is total and deterministic as long as (key, tie) is a
  * total order over the rows. The data shuffles once on the key
  * (flat) or twice on (key, bucket) (salted); no row ever crosses
  * into a global sort.
  *
  * This is the enumeration core behind curriculum ordering (t35):
  * training wants every example at a stable global position in
  * difficulty order, and a round-robin `pos % shards` then interleaves
  * the full difficulty ramp into every shard.
  */
object GlobalOrder {

  /** Sentinel for `salts`: derive the plan from the measured heaviest
    * key — flat when it fits `maxRowsPerKey`, salted (with
    * `ceil(2·maxPerKey / maxRowsPerKey)` salts) when it does not.
    * Escalation needs a NUMERIC tie; auto mode with a non-numeric tie
    * still ships the flat plan but fails loudly where escalation
    * would have engaged.
    */
  val AutoSalts = 0

  /** @param maxKeys hard gate on the BROADCAST table cardinality: the
    *        offsets table is both single-partition-sorted and
    *        broadcast, so a caller passing a fine-grained key (a row
    *        id instead of a bucket/length/score) must fail with a
    *        named error, not an executor OOM deep in the job. The
    *        default matches the graph family's broadcastNodeLimit.
    *        When salted, the gate applies to the SUB-KEY table —
    *        `nKeys · salts` rows must fit the same bound (round-14
    *        ADVICE: no silent 10M floor relaxing a caller-tightened
    *        maxKeys).
    * @param maxRowsPerKey hard gate on the HEAVIEST single-task sort:
    *        the per-key row count at salts=1, the per-(key, bucket)
    *        count when salted. Checked from the same aggregates (no
    *        extra data pass). A salts=1 caller whose corpus outgrows
    *        it should raise `salts` (more sub-keys × fewer rows) or
    *        pass [[AutoSalts]]; a SALTED caller tripping it has
    *        tie-value concentration — raise `salts` further or spread
    *        the tie domain.
    * @param salts sub-buckets per key: 1 = classic two-phase plan,
    *        [[AutoSalts]] (0) = derive from the measured heaviest key.
    *        Requires a NUMERIC tie column when > 1 (the bucket must
    *        be monotone in the tie, so it is derived from the tie's
    *        per-key value range).
    */
  def enumerate(
      df: DataFrame, keyCol: String, tieCol: String,
      posCol: String = "pos", maxKeys: Long = 5000000L,
      maxRowsPerKey: Long = 100000000L, salts: Int = 1): DataFrame = {
    require(salts >= 0 && salts <= 65536,
      s"GlobalOrder.enumerate: salts must be AutoSalts (0) or in " +
        s"[1, 65536], got $salts")
    import org.apache.spark.sql.types._
    val tieNumeric = df.schema(tieCol).dataType.isInstanceOf[NumericType]
    require(salts <= 1 || tieNumeric,
      s"GlobalOrder.enumerate: salts=$salts needs a numeric '$tieCol' " +
        s"(got ${df.schema(tieCol).dataType.simpleString}) — the salt " +
        "bucket must be monotone in the tie, so it derives from the " +
        "tie value range")
    // ONE counts aggregate serves every plan: per-key count always;
    // the tie range rides along when the tie is numeric, so a salted
    // (or auto-escalated) plan costs no second counting pass
    val counts =
      if (tieNumeric)
        df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"),
          min(col(tieCol).cast("double")).as("__lo"),
          max(col(tieCol).cast("double")).as("__hi"))
      else df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val stats = counts
      .agg(count(lit(1)).as("k"), coalesce(max("__n"), lit(0L)).as("m"))
      .head()
    val (nKeys, maxPerKey) = (stats.getLong(0), stats.getLong(1))
    require(nKeys <= maxKeys,
      s"GlobalOrder.enumerate: $nKeys distinct '$keyCol' keys exceed " +
        s"maxKeys=$maxKeys — the offsets table is sorted on one " +
        "partition and broadcast, so the key domain must be coarse " +
        "(a bucket/length/score, not a row id); pre-bucket the key " +
        "or raise maxKeys deliberately")
    val chosenSalts =
      if (salts != AutoSalts) salts
      else if (maxPerKey <= maxRowsPerKey) 1
      else {
        require(tieNumeric,
          s"GlobalOrder.enumerate: heaviest '$keyCol' key holds " +
            s"$maxPerKey rows, exceeding maxRowsPerKey=$maxRowsPerKey, " +
            s"and auto-salting needs a numeric '$tieCol' to derive " +
            "range buckets — refine the key domain or provide a " +
            "numeric tie")
        // 2× headroom over the uniform split: range buckets are only
        // as even as the tie values; concentration beyond that still
        // trips the per-(key, salt) gate below, loudly
        val needed = 2L * maxPerKey / maxRowsPerKey +
          (if ((2L * maxPerKey) % maxRowsPerKey == 0L) 0L else 1L)
        math.min(65536L, needed).toInt
      }
    if (chosenSalts <= 1)
      enumerateFlat(df, counts, keyCol, tieCol, posCol,
        maxPerKey, maxRowsPerKey)
    else
      enumerateSalted(df, counts, keyCol, tieCol, posCol,
        nKeys, maxKeys, maxRowsPerKey, chosenSalts)
  }

  private def prefixOffsets(counts: DataFrame, keyCol: String) = counts
    .withColumn("__offset",
      coalesce(sum("__n").over(Window.orderBy(col(keyCol))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

  private def enumerateFlat(
      df: DataFrame, counts: DataFrame, keyCol: String, tieCol: String,
      posCol: String, maxPerKey: Long, maxRowsPerKey: Long): DataFrame = {
    require(maxPerKey <= maxRowsPerKey,
      s"GlobalOrder.enumerate: heaviest '$keyCol' key holds $maxPerKey " +
        s"rows, exceeding maxRowsPerKey=$maxRowsPerKey — phase 2 sorts " +
        "each key in one task; raise `salts` (or pass AutoSalts) to " +
        "split keys into tie-range buckets (exact, see scaladoc) or " +
        "refine the key domain")
    val offsets = prefixOffsets(counts, keyCol)
      .select(col(keyCol), col("__offset"))
    val perKey = Window.partitionBy(col(keyCol)).orderBy(col(tieCol))
    df.join(broadcast(offsets), Seq(keyCol))
      .withColumn(posCol,
        col("__offset") + row_number().over(perKey).cast("long") - 1L)
      .drop("__offset")
  }

  private def enumerateSalted(
      df: DataFrame, counts: DataFrame, keyCol: String, tieCol: String,
      posCol: String, nKeys: Long, maxKeys: Long, maxRowsPerKey: Long,
      salts: Int): DataFrame = {
    // the broadcast sub-key table is nKeys·salts rows — gate it
    // against the caller's OWN bound (round-14 ADVICE: the old check
    // silently relaxed a caller-tightened maxKeys to a 10M floor)
    require(nKeys * salts <= maxKeys,
      s"GlobalOrder.enumerate: $nKeys distinct '$keyCol' keys x " +
        s"$salts salts = ${nKeys * salts} sub-keys exceed maxKeys=" +
        s"$maxKeys — the sub-offset table is broadcast too; coarsen " +
        "the key domain, lower salts, or raise maxKeys deliberately")
    val offsets = prefixOffsets(counts, keyCol)
      .select(col(keyCol), col("__offset"), col("__lo"), col("__hi"))
    // monotone range bucket in [0, salts): double math is safe here —
    // ANY monotone-in-tie bucketing yields the same positions (it
    // moves only load balance), and floor of a monotone double map is
    // monotone. Degenerate range (one distinct tie per key) → bucket 0.
    val bucket = least(lit(salts - 1), greatest(lit(0),
      floor((col(tieCol).cast("double") - col("__lo")) /
        greatest(col("__hi") - col("__lo"), lit(1e-300)) * salts)))
      .cast("int")
    val rows = df.join(broadcast(offsets), Seq(keyCol))
      .withColumn("__salt", bucket)
    // per-(key, salt) counts: map-side combinable; the within-key
    // prefix sum is a window PARTITIONED BY KEY over <= salts rows
    val subCounts = rows.groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__sn"))
    val maxPerSub = subCounts.agg(coalesce(max("__sn"), lit(0L)).as("m"))
      .head().getLong(0)
    require(maxPerSub <= maxRowsPerKey,
      s"GlobalOrder.enumerate: heaviest ('$keyCol', salt) bucket holds " +
        s"$maxPerSub rows, exceeding maxRowsPerKey=$maxRowsPerKey — " +
        "tie values concentrate in a narrow range; raise salts or " +
        "spread the tie domain")
    val subOffsets = subCounts
      .withColumn("__soffset",
        coalesce(sum("__sn").over(Window.partitionBy(col(keyCol))
          .orderBy(col("__salt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("__salt"), col("__soffset"))
    val perBucket = Window.partitionBy(col(keyCol), col("__salt"))
      .orderBy(col(tieCol))
    rows.join(broadcast(subOffsets), Seq(keyCol, "__salt"))
      .withColumn(posCol, col("__offset") + col("__soffset")
        + row_number().over(perBucket).cast("long") - 1L)
      .drop("__offset", "__soffset", "__lo", "__hi", "__salt")
  }
}
