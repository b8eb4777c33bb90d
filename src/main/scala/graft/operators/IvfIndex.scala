package graft.operators

import graft.functions.VectorExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** IVF (inverted-file) approximate-nearest-neighbor index.
  *
  * The scale shape: k-means centroids are trained on a BOUNDED,
  * deterministically chosen sample (training cost is independent of
  * corpus size); the corpus-wide work — assigning every vector to its
  * cell — is one codegen'd narrow map ([[graft.functions.NearestCell]],
  * no shuffle); search probes only `nprobe` cells per query, turning
  * the brute-force cross join into an equi-join on `cell` that
  * broadcasts the (tiny) probed query set against the index.
  *
  * Every step is deterministic so results are reproducible run-to-run:
  * the sample is id-ordered, seeds are strided over it, per-cell sums
  * fold in id order (sequential double adds, not a shuffle-order
  * reduction), and nearest-cell ties resolve to the lowest cell.
  */
object IvfIndex {

  /** k × d centroid matrix. */
  case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    def dim: Int = centroids.headOption.map(_.length).getOrElse(0)
    def asColumn: Column = typedlit(centroids.map(_.toSeq).toSeq)
  }

  /** df + `outCol` = unit-normalized double copy of `vecCol`, null
    * for zero-norm rows (a zero vector has no direction; and under
    * ANSI mode — Spark 4 default — x/0 would throw mid-job, so the
    * when() keeps the division off those rows even though the
    * projection can evaluate before any filter). The norm is
    * materialized as its OWN column first so the per-element division
    * references a bound attribute: the inline formulation embeds the
    * O(d) norm aggregate inside the transform lambda, which
    * interpreted HOF evaluation re-runs PER ELEMENT — O(d²) per row
    * on corpus-wide paths.
    */
  /** A working-column name guaranteed absent from `df`: a fixed name
    * like `__unorm` would silently overwrite (and then drop) a
    * same-named caller column — encode()/unitNormalized are
    * public-facing via the operator APIs, so the caller's schema is
    * not ours to assume.
    */
  private[operators] def freshName(df: DataFrame, base: String): String =
    Iterator.iterate(base)(_ + "_")
      .dropWhile(df.columns.contains).next()

  private[operators] def unitNormalized(
      df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val raw = col(vecCol).cast(ArrayType(DoubleType))
    val norm = freshName(df, "__unorm")
    df.withColumn(norm,
        sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x)))
      .withColumn(outCol,
        when(col(norm) > 0, transform(raw, x => x / col(norm))))
      .drop(norm)
  }

  /** Deterministic spherical k-means (Lloyd iterations over an
    * id-ordered sample, unit-normalized vectors and centroids). Unit
    * centroids make squared-L2 argmin ≡ cosine argmax — even for
    * UN-normalized corpus vectors, since |v|² is constant across cells
    * — so [[assign]]/[[probe]] need no per-vector normalization and
    * the index serves cosine search natively.
    *
    * @param df          corpus with an id column and a vector column
    *                    (`array<float>` or `array<double>`)
    * @param sampleLimit training-sample bound (orderBy(id).limit —
    *                    a TakeOrdered, safe at any corpus size)
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      sampleLimit: Int = 100000): Model = {
    require(k > 0 && iters >= 0)
    // Zero-norm vectors are excluded from TRAINING (see
    // unitNormalized); assign/probe still handle such corpus rows
    // (deterministic first-cell assignment).
    val sample = unitNormalized(
        df.select(col(idCol).as("id"), col(vecCol).as("__vec")),
        "__vec", "v")
      .select("id", "v")
      .filter(col("v").isNotNull)
      .orderBy("id").limit(sampleLimit)
      .cache()
    val n = sample.count().toInt
    require(n >= k, s"need at least k=$k non-zero training vectors, got $n")
    val dim = sample.head().getSeq[Double](1).length
    // a ragged vector column would null-poison zip_with the same way —
    // fail with the offending length instead
    val badLen = sample.filter(size(col("v")) =!= dim).limit(1)
      .select(size(col("v"))).collect()
    require(badLen.isEmpty,
      s"IvfIndex: vectors must all have length $dim, found ${
        badLen.headOption.map(_.getInt(0)).getOrElse(-1)}")

    // Strided seeds: rows 0, stride, 2·stride, … in id order.
    val stride = math.max(1, n / k)
    var centroids: Array[Array[Double]] = sample
      .withColumn("rn", row_number().over(Window.orderBy("id")) - 1)
      .filter(col("rn") % stride === 0 && col("rn") < stride.toLong * k)
      .orderBy("rn")
      .collect()
      .map(_.getSeq[Double](1).toArray)

    for (_ <- 0 until iters) {
      val assigned = sample.withColumn("cell",
        VectorExprs.nearest_cell(col("v"), Model(centroids).asColumn))
      // Deterministic per-cell mean: members sorted by id, elementwise
      // sums folded sequentially in that order.
      val stats = assigned.groupBy("cell")
        .agg(
          count(lit(1)).as("cnt"),
          aggregate(
            sort_array(collect_list(struct(col("id"), col("v")))),
            array_repeat(lit(0.0), dim),
            (acc, m) => zip_with(acc, m.getField("v"), (x, y) => x + y))
            .as("vsum"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val cell = r.getInt(0)
        val mean = r.getSeq[Double](2).map(_ / r.getLong(1))
        val len = math.sqrt(mean.map(x => x * x).sum)
        // renormalize to the unit sphere (spherical k-means step);
        // a zero mean (cancelling members) keeps the old centroid
        if (len > 0) next(cell) = mean.map(_ / len).toArray
      } // cells with no members keep their previous centroid
      centroids = next
    }
    sample.unpersist()
    Model(centroids)
  }

  /** Corpus-wide cell assignment — a codegen'd narrow map, the only
    * full-data pass of index construction.
    */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("cell", VectorExprs.nearest_cell(col(vecCol), model.asColumn))

  /** The `nprobe` nearest cells for each (query-side) vector, as an
    * exploded `probe_cell` column. HOF arithmetic is fine here: the
    * query set is small by construction.
    */
  def probe(
      df: DataFrame, vecCol: String, model: Model, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= model.k)
    val cents = model.asColumn
    val dists = transform(
      sequence(lit(0), lit(model.k - 1)),
      i => struct(
        aggregate(
          zip_with(element_at(cents, i + 1), col(vecCol).cast(ArrayType(DoubleType)),
            (c, v) => (c - v) * (c - v)),
          lit(0.0), (acc, x) => acc + x).as("d"),
        i.as("cell")))
    val cells = freshName(df, "__cells")
    df.withColumn(cells,
        slice(array_sort(dists), 1, nprobe).getField("cell"))
      .withColumn("probe_cell", explode(col(cells)))
      .drop(cells)
  }
}
