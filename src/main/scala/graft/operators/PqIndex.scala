package graft.operators

import graft.functions.VectorExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Product quantization (PQ) — the memory-side half of the IVF-PQ
  * architecture large-scale ANN actually runs: each (unit-normalized)
  * vector is split into `m` subvectors, each subvector is quantized to
  * one of `k` learned sub-centroids, and the corpus is stored as `m`
  * small codes per vector (m=8, k=16 → 8 codes ≈ 8 bytes, a 32×
  * reduction over 64 floats). Search scans CODES, not vectors —
  * asymmetric distance computation (ADC) against the query — so the
  * bandwidth-bound corpus pass touches a fraction of the bytes, then a
  * tiny exact rerank on the shortlist restores accuracy.
  *
  * Scale shape, mirroring [[IvfIndex]]: codebooks are trained on a
  * BOUNDED id-ordered sample (training cost independent of corpus
  * size; one Spark job per Lloyd iteration trains ALL m subspaces at
  * once via a (subspace, cell) aggregation); encoding is a codegen'd
  * narrow map (m [[graft.functions.NearestCell]] argmins per row, no
  * shuffle); the ADC scan is one broadcast pass over the code table
  * with the fused [[graft.functions.PqAdcDistance]] loop.
  *
  * Vectors are unit-normalized before slicing (both at train/encode
  * and query time), which makes L2 ADC argmin agree with cosine
  * ranking — the same trick IvfIndex's spherical centroids use — so
  * PQ search serves the cosine queries the rest of the similarity
  * family answers. Determinism matches IvfIndex: id-ordered sample,
  * strided seeds, sequential id-ordered fold for the means, lowest-
  * index tie-breaks.
  */
object PqIndex {

  /** `m` codebooks × `k` sub-centroids × `dsub` dims. */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.headOption.map(_.length).getOrElse(0)
    def dsub: Int =
      codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
  }

  /** Unit-normalized double vector, null for zero-norm rows (which
    * have no direction — same exclusion IvfIndex.train applies, and
    * under ANSI mode the guarded when() keeps x/0 from throwing).
    * QUERY-SIDE ONLY: the norm aggregate sits inside the transform
    * lambda here, which interpreted HOF evaluation re-runs per
    * element (O(d²) per row) — fine for a handful of query vectors
    * projected before a join, wrong for a corpus pass. Corpus-wide
    * paths (train/encode) use [[IvfIndex.unitNormalized]], which
    * materializes the norm as its own column first.
    */
  def normalizedVec(vec: Column): Column = {
    val raw = vec.cast(ArrayType(DoubleType))
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    when(norm > 0, transform(raw, x => x / norm))
  }

  /** Train all `m` codebooks. One job per Lloyd iteration: subvectors
    * explode to (id, sub, v) rows, every row argmins against ITS
    * subspace's current codebook (element_at into the full codebook
    * literal), and one (sub, cell) aggregation folds the new means in
    * id order — deterministic and independent of m.
    */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 3,
      sampleLimit: Int = 100000): Model = {
    require(m > 0 && k > 0 && iters >= 0)
    val sample = IvfIndex.unitNormalized(
        df.select(col(idCol).as("id"), col(vecCol).as("__vec")),
        "__vec", "v")
      .select("id", "v")
      .filter(col("v").isNotNull)
      .orderBy("id").limit(sampleLimit)
      .cache()
    val n = sample.count().toInt
    require(n >= k, s"need at least k=$k non-zero training vectors, got $n")
    val dim = sample.head().getSeq[Double](1).length
    require(dim % m == 0,
      s"vector dim $dim must divide into m=$m subspaces")
    // a ragged (shorter) vector would null-pad the zip_with fold and
    // the null elements would unbox to silent 0.0s in the means —
    // fail with the offending length instead (same guard as IvfIndex)
    val badLen = sample.filter(size(col("v")) =!= dim).limit(1)
      .select(size(col("v"))).collect()
    require(badLen.isEmpty,
      s"PqIndex: vectors must all have length $dim, found ${
        badLen.headOption.map(_.getInt(0)).getOrElse(-1)}")
    val dsub = dim / m

    // (id, sub, subvector) rows — the per-iteration working set
    val subRows = sample.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("v"), i * dsub + 1, lit(dsub)))))
      .toDF("id", "sub", "sv")

    // strided seeds per subspace: rows 0, stride, … of the id-ordered
    // sample, sliced per subspace
    val stride = math.max(1, n / k)
    val seedRows = sample
      .withColumn("rn", row_number().over(Window.orderBy("id")) - 1)
      .filter(col("rn") % stride === 0 && col("rn") < stride.toLong * k)
      .orderBy("rn")
      .collect()
      .map(_.getSeq[Double](1).toArray)
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      seedRows.map(_.slice(s * dsub, s * dsub + dsub))
    }

    for (_ <- 0 until iters) {
      val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
      val assigned = subRows.withColumn("cell",
        VectorExprs.nearest_cell(col("sv"),
          element_at(booksLit, col("sub") + 1)))
      val stats = assigned.groupBy("sub", "cell")
        .agg(
          count(lit(1)).as("cnt"),
          aggregate(
            sort_array(collect_list(struct(col("id"), col("sv")))),
            array_repeat(lit(0.0), dsub),
            (acc, r) => zip_with(acc, r.getField("sv"), (x, y) => x + y))
            .as("vsum"))
        .collect()
      val next = books.map(_.map(_.clone()))
      stats.foreach { r =>
        val (sub, cell) = (r.getInt(0), r.getInt(1))
        next(sub)(cell) =
          r.getSeq[Double](3).map(_ / r.getLong(2)).toArray
      } // (sub, cell) pairs with no members keep their previous centroid
      books = next
    }
    sample.unpersist()
    Model(books)
  }

  /** Corpus-wide encoding — a codegen'd narrow map: m static argmin
    * calls per row over the normalized vector's slices. Zero-norm
    * vectors encode to null (no direction to quantize). The
    * normalization is materialized in its own projection first: the m
    * slices and the null check all reference that one column, so the
    * HOF normalization runs once per row, not m+1 times (Catalyst
    * won't collapse a multiply-referenced non-cheap expression back
    * into its consumers).
    */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val vn = IvfIndex.freshName(df, "__pq_vn")
    val codes = array((0 until model.m).map { s =>
      VectorExprs.nearest_cell(
        slice(col(vn), s * model.dsub + 1, model.dsub),
        typedlit(model.codebooks(s).map(_.toSeq).toSeq))
    }: _*)
    IvfIndex.unitNormalized(df, vecCol, vn)
      .withColumn("codes", when(col(vn).isNotNull, codes))
      .drop(vn)
  }

  /** ADC score of an ALREADY-NORMALIZED query column (see
    * [[normalizedVec]]) against a codes column — the fused native
    * loop; LOWER is closer (squared-L2 against the reconstruction of
    * a unit vector ≡ descending cosine).
    */
  def adcDistance(normalizedQuery: Column, codes: Column, model: Model): Column =
    graft.functions.VectorExprs.pq_adc_distance(
      normalizedQuery, codes, model.codebooks)
}
