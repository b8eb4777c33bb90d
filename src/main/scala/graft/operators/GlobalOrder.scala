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
    */
  def enumerate(
      df: DataFrame, keyCol: String, tieCol: String,
      posCol: String = "pos", maxKeys: Long = 5000000L): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val nKeys = counts.count()
    require(nKeys <= maxKeys,
      s"GlobalOrder.enumerate: $nKeys distinct '$keyCol' keys exceed " +
        s"maxKeys=$maxKeys — the offsets table is sorted on one " +
        "partition and broadcast, so the key domain must be coarse " +
        "(a bucket/length/score, not a row id); pre-bucket the key " +
        "or raise maxKeys deliberately")
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
