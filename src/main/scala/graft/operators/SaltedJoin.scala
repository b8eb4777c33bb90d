package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salting for shuffle joins.
  *
  * A hash-partitioned join sends every row of a hot key to ONE reducer;
  * at 100 TB a single key holding 10% of the fact table turns into one
  * straggler task that dominates the stage. Salting splits each hot
  * key's rows across `buckets` sub-partitions: the fact side gets a
  * deterministic salt in [0, buckets), the dimension side is replicated
  * once per salt value, and the join key becomes (key, salt) — so the
  * biggest reducer shrinks by ~buckets× at the cost of a buckets×
  * replication of the (smaller) dimension side.
  *
  * This is the deterministic, always-on complement to AQE's runtime
  * skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, which
  * only rewrites sort-merge joins whose runtime stats cross its
  * thresholds); it also composes with any join the planner picks.
  */
object SaltedJoin {

  /** Inner equi-join of a large skewed `fact` table against a
    * non-broadcastable `dim` table.
    *
    * @param saltFrom fact column(s) whose hash spreads a hot key's rows
    *                 across buckets — any column that varies within a
    *                 key group (a line number, an event id)
    */
  def inner(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltFrom: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 1, "salting needs at least 2 buckets")
    val salt = "__salt"
    val salted = fact.withColumn(salt,
      pmod(xxhash64(saltFrom.map(col): _*), lit(buckets)).cast("int"))
    val replicated = dim.withColumn(salt,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted(salt) === replicated(salt))
      .drop(salt)
  }

  /** Bucket count from a sampled key histogram: 1 (≡ plain join) when
    * no key exceeds `skewTolerance`× the average reducer's share of
    * the shuffle, else just enough buckets to bring the hottest key
    * back under that bound (capped at `maxBuckets`).
    *
    * The sampling pass reads only the (column-pruned) key column once;
    * at warehouse scale amortize it by computing the histogram on
    * ingest and passing the observed hot-key share to a cached plan.
    */
  def decideBuckets(
      fact: DataFrame,
      factKey: String,
      maxBuckets: Int = 16,
      sampleFraction: Double = 0.01,
      skewTolerance: Double = 4.0,
      seed: Long = 42L): Int = {
    val parts = fact.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val row = fact.select(col(factKey)).sample(sampleFraction, seed)
      .groupBy(factKey).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)),
        coalesce(sum(col("c")), lit(0L)))
      .head()
    val (mx, tot) = (row.getLong(0), row.getLong(1))
    if (tot == 0L) 1
    else {
      val share = mx.toDouble / tot
      // a key may occupy up to skewTolerance× an average reducer —
      // but never more than 20% of the whole shuffle: at low
      // parallelism skewTolerance/parts approaches 1 and would wave
      // through a key that dominates the table outright
      val bound = math.min(skewTolerance / parts, 0.2)
      if (share <= bound) 1
      else math.min(maxBuckets, math.ceil(share / bound).toInt)
    }
  }

  /** Self-tuning inner join: measures the fact side's hot-key share on
    * a sample and only pays the dimension-replication cost when the
    * measurement says the shuffle would actually skew — unskewed input
    * plans a completely plain equi-join.
    */
  def auto(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltFrom: Seq[String],
      maxBuckets: Int = 16,
      sampleFraction: Double = 0.01,
      skewTolerance: Double = 4.0): DataFrame = {
    val buckets = decideBuckets(fact, factKey, maxBuckets,
      sampleFraction, skewTolerance)
    if (buckets <= 1) fact.join(dim, fact(factKey) === dim(dimKey))
    else inner(fact, dim, factKey, dimKey, saltFrom, buckets)
  }
}
