package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's portable deterministic hash: md5-hex-prefix reduced to
  * a 60-bit integer, salted by a small integer key. One definition in
  * BOTH forms — Column for Spark plans, SQL text for the DuckDB
  * oracles — is what keeps every hash-bucketed split, sample, and
  * signature bit-identical across engines, runs, and cluster sizes
  * (Spark's xxhash64/hash and DuckDB's hash() would never agree).
  *
  * Lives in `functions` so the library operators (TextProfile,
  * Packing, NearDup) do not depend upward on the benchmark query
  * registry for a core primitive.
  */
object PortableHash {

  /** k-salted portable 60-bit hash of a string column (Spark side). */
  def saltedHash(k: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$k:"), c)), 1, 15), 16, 10).cast("long")

  /** Same hash, DuckDB side. */
  def saltedHashSql(k: Int, e: String): String =
    s"('0x' || substr(md5('$k:' || $e), 1, 15))::BIGINT"
}
