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
  * Position is total and deterministic as long as (key, tie) is a
  * total order over the rows. The data shuffles once (on the key);
  * no row ever crosses into a global sort.
  *
  * This is the enumeration core behind curriculum ordering (t35):
  * training wants every example at a stable global position in
  * difficulty order, and a round-robin `pos % shards` then interleaves
  * the full difficulty ramp into every shard.
  */
object GlobalOrder {

  /** @param maxKeys hard gate on the DISTINCT-KEY cardinality: the
    *        offsets table is both single-partition-sorted and
    *        broadcast, so a caller passing a fine-grained key (a row
    *        id instead of a bucket/length/score) must fail with a
    *        named error, not an executor OOM deep in the job. The
    *        default matches the graph family's broadcastNodeLimit.
    * @param maxRowsPerKey hard gate on the HEAVIEST key's row count —
    *        the contract's other half: phase 2's per-key row_number
    *        sorts each key's entire row set in ONE task, so per-key
    *        volume (~corpus/nKeys under a coarse domain, worse under
    *        skew) is the real single-task ceiling the key-cardinality
    *        gate alone would gloss over. Checked from the SAME counts
    *        aggregate (no extra pass). Callers whose corpus outgrows
    *        it must either refine the key domain (more keys × fewer
    *        rows — the knob the two gates bracket from both sides) or
    *        move to a two-level (key, salt) scheme: enumerate salted
    *        sub-keys, then add per-(key) salt offsets the same
    *        prefix-sum way — same math, one more level.
    */
  def enumerate(
      df: DataFrame, keyCol: String, tieCol: String,
      posCol: String = "pos", maxKeys: Long = 5000000L,
      maxRowsPerKey: Long = 100000000L): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
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
    require(maxPerKey <= maxRowsPerKey,
      s"GlobalOrder.enumerate: heaviest '$keyCol' key holds $maxPerKey " +
        s"rows, exceeding maxRowsPerKey=$maxRowsPerKey — phase 2 sorts " +
        "each key in one task, so refine the key domain or add a salt " +
        "level (see scaladoc) instead of single-task-sorting this key")
    val offsets = counts
      .withColumn("__offset",
        coalesce(sum("__n").over(Window.orderBy(col(keyCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("__offset"))
    val perKey = Window.partitionBy(col(keyCol)).orderBy(col(tieCol))
    df.join(broadcast(offsets), Seq(keyCol))
      .withColumn(posCol,
        col("__offset") + row_number().over(perKey).cast("long") - 1L)
      .drop("__offset")
  }
}
