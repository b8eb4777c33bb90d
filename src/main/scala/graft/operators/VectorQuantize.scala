package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/bandwidth lever
  * for vector corpora at scale (a 100 TB float32 embedding store is
  * 25 TB in int8, and most ANN distance work survives it). Per vector:
  * scale = max |x|, q_i = floor(x_i · 127 / scale + 0.5) ∈ [-127, 127]
  * — reconstruction x̂_i = q_i · scale / 127 has per-component error
  * ≤ scale / 254.
  *
  * Everything is a narrow map in fixed IEEE evaluation order
  * (`floor(x · 127 / s + 0.5)`, never `round`), so the quantized
  * bytes are bit-identical on any engine — half-even vs half-up
  * `round` disagreement is exactly the cross-engine hazard this
  * formulation avoids, and what lets the s8 query carry a value
  * oracle for a quantizer.
  */
object VectorQuantize {

  /** Appends `scale` (double, max |component|) and `q`
    * (array<long> of int8-range codes) for `vecCol`. A zero vector
    * quantizes to scale 0 and all-zero codes.
    */
  def int8(
      df: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    df
      // Column HOF, not expr(s"transform($vecCol, ...)") — robust to
      // column names that would need backticks in SQL text
      .withColumn("__xs", transform(col(vecCol), _.cast("double")))
      .withColumn("scale",
        expr("array_max(transform(__xs, x -> abs(x)))"))
      .withColumn("q", expr(
        """CASE WHEN scale = 0D THEN transform(__xs, x -> 0L)
           ELSE transform(__xs,
             x -> CAST(floor(x * 127D / scale + 0.5D) AS BIGINT)) END"""))
      .drop("__xs")

  /** Appends `dequantized` (array<double>) reconstructed from `q` and
    * `scale` — for measuring what the codes preserve.
    */
  def dequantize(df: DataFrame): DataFrame =
    df.withColumn("dequantized",
      expr("transform(q, c -> CAST(c AS DOUBLE) * scale / 127D)"))
}
