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
}
