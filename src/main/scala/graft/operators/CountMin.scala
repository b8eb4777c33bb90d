package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency
  * sketch that completes the mergeable-summary family (HLL q15, KLL
  * q52, theta q55, Misra-Gries t9, Bloom d13): `depth` hash rows ×
  * `width` counters, point estimate = min over rows of the hashed
  * counter. The defining invariant is ONE-SIDED error — an estimate
  * can only OVER-count (collisions add, never subtract) — and with
  * the portable salted MD5 hashes the sketch is fully deterministic,
  * so unlike the q15/q52 contracts DuckDB replays every counter and
  * every estimate EXACTLY (the SimHash precedent, applied to
  * frequencies).
  *
  * Scale shape: counters derive from the (token, count) aggregate —
  * already distinct-token-sized — via a `depth`-way explode and one
  * map-side-combinable (row, bucket) aggregate into depth·width
  * cells, KBs of state that BROADCAST onto any query side. Sketches
  * of two corpora merge by cell-wise addition (the aggregate is a
  * plain sum), which is what makes CMS the distributed-frequency
  * workhorse.
  */
object CountMin {

  /** Salt space for row hashes — disjoint from the other PortableHash
    * users (5 packing, 9 simhash, 13 substring windows). */
  private def salt(r: Int): Int = 20 + r

  private def bucket(r: Int, tok: org.apache.spark.sql.Column, width: Int) =
    pmod(graft.functions.PortableHash.saltedHash(salt(r), tok),
      lit(width.toLong))

  /** Build the sketch from a (tokenCol, countCol) frequency table:
    * (r, bucket, c) — depth·width cells. */
  def sketch(
      freqs: DataFrame, tokenCol: String, countCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width must be at least 2: $width")
    freqs
      .select(col(tokenCol).as("tok"), col(countCol).as("n"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        (0 until depth).foldLeft(lit(-1L)) { (acc, r) =>
          when(col("r") === r, bucket(r, col("tok"), width)).otherwise(acc)
        }.as("bucket"),
        col("n"))
      .groupBy("r", "bucket").agg(sum("n").as("c"))
  }

  /** Point estimates for `queries(tokenCol)`: min over rows of the
    * hashed cell — the sketch (depth·width rows) broadcasts.
    *
    * Cells the sketch never touched have no row but ARE zero
    * counters, so the join is a LEFT join with absent cells coalesced
    * to 0 before the min: every query token gets the textbook CMS
    * estimate, including tokens from outside the sketched corpus
    * (any untouched cell pins their estimate to the true 0). For
    * tokens of the sketched corpus all `depth` cells are touched and
    * the left join degenerates to the inner join it replaced.
    */
  def estimate(
      queries: DataFrame, tokenCol: String, cms: DataFrame,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width must be at least 2: $width")
    queries
      .select(col(tokenCol).as("tok"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket",
        (0 until depth).foldLeft(lit(-1L)) { (acc, r) =>
          when(col("r") === r, bucket(r, col("tok"), width)).otherwise(acc)
        })
      .join(broadcast(cms), Seq("r", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  /** The DuckDB twin of [[sketch]]+[[estimate]] bucket derivation for
    * row `r` — shared by the t36 oracle so the hash can never drift. */
  def bucketSql(r: Int, e: String, width: Int): String =
    s"(${graft.functions.PortableHash.saltedHashSql(salt(r), e)}) % $width"
}
