package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for cosine similarity over two
  * Array[Float] embedding columns.
  *
  * The composable alternative (`zip_with` + `aggregate` higher-order
  * functions) allocates a zipped array and interprets two lambdas per
  * row — outside whole-stage codegen. This expression generates a
  * single fused primitive loop (no allocation, no virtual calls) and
  * keeps the surrounding stage codegen'd, which is what the inner loop
  * of a 100 TB brute-force or IVF re-rank scan needs.
  *
  * Accumulation is sequential in double precision — bit-identical to
  * the HOF formulation and the DuckDB oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // null even for non-null inputs (null ELEMENT propagation) — without
  // this, codegen on non-nullable children would elide the isNull slot
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  // A null ELEMENT propagates to a null result, matching the
  // zip_with+aggregate formulation and the DuckDB oracle — reading the
  // slot raw would silently yield 0.0f (zeroed UnsafeArrayData slot)
  // and a finite wrong similarity. The branch is free in practice
  // (always-false for real embedding columns).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          double xi = (double) $a.getFloat($i);
          double yi = (double) $b.getFloat($i);
          $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
        }
        if (!${ev.isNull}) {
          ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Index of the nearest centroid (squared-L2) for a vector — the IVF
  * cell-assignment primitive. `vec` is `array<float>` or
  * `array<double>`; `centroids` is an `array<array<double>>` literal
  * (k × d, broadcast as a constant into the generated code). Returns
  * the 0-based argmin; ties resolve to the lowest cell, so assignment
  * is deterministic.
  *
  * This is the 100 TB hot path of index building — every vector in the
  * corpus is assigned once — hence a fused codegen'd k×d loop rather
  * than interpreted higher-order functions. Measured
  * (examples.AssignBench, local[32], 1M rows × k=16 × d=64): 0.68s vs
  * 5.95s for the transform+aggregate+array_position HOF formulation —
  * 8.8×.
  */
case class NearestCell(left: Expression, right: Expression)
  extends BinaryExpression {

  private def vecElemType: Option[DataType] = left.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val centroidsOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecElemType.isDefined && centroidsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<double>>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType

  // null for an empty or null-element centroid set, even when both
  // inputs are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "nearest_cell"

  // An empty centroid set or a null INNER array yields a null result:
  // returning a phantom "cell 0" for k=0 (or NPE-ing a task on a null
  // centroid) would silently bucket every vector into a centroid that
  // does not exist. IvfIndex-built models never hit either case; this
  // is the SQL-registration misuse path.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val k = cs.numElements()
    if (k == 0) return null
    // resolve the element accessor once, not per k×d element
    val isFloat = vecElemType.get == FloatType
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < k) {
      if (cs.isNullAt(j)) return null
      val c = cs.getArray(j)
      val n = math.min(c.numElements(), v.numElements())
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = c.getDouble(i) - x
        d2 += diff * diff
        i += 1
      }
      if (d2 < bestD) { bestD = d2; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = vecElemType.get match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        int $k = $b.numElements();
        int $best = 0; double $bestD = Double.MAX_VALUE;
        if ($k == 0) { ${ev.isNull} = true; }
        for (int $j = 0; $j < $k; $j++) {
          if ($b.isNullAt($j)) { ${ev.isNull} = true; break; }
          org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
          int $n = java.lang.Math.min($c.numElements(), $a.numElements());
          double $d2 = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double diff = $c.getDouble($i) - (double) $a.$get($i);
            $d2 += diff * diff;
          }
          if ($d2 < $bestD) { $bestD = $d2; $best = $j; }
        }
        if (!${ev.isNull}) { ${ev.value} = $best; }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric distance computation (ADC) for product quantization:
  * squared L2 between a raw query vector and the RECONSTRUCTION of a
  * PQ-coded corpus vector — Σ_s ‖q_s − codebook[s][codes[s]]‖².
  * `left` is the query (`array<float|double>`, length m·dsub),
  * `right` is the code array (`array<int>`, length m); the codebooks
  * ride the plan as a codegen reference (m × k × dsub doubles — a few
  * KB — like [[NearestCell]]'s centroid literal).
  *
  * This is the 100 TB ANN hot loop: the corpus pass reads m small
  * codes per row instead of the full vector (32× less memory traffic
  * at m=8, k=16 over 64 floats), and the fused loop does m·dsub
  * subtract-square-adds with no allocation. Null codes (zero-norm
  * vectors that couldn't encode) and out-of-range codes yield null,
  * never a phantom distance.
  */
case class PqAdcDistance(
    left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {

  private def vecElemType: Option[DataType] = left.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (vecElemType.isDefined && codesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<int>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // null for malformed codes even when both inputs are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "pq_adc_distance"

  private val m = codebooks.length
  private val k = codebooks.headOption.map(_.length).getOrElse(0)
  private val dsub =
    codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    if (codes.numElements() != m || q.numElements() < m * dsub) return null
    val isFloat = vecElemType.get == FloatType
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val code = codes.getInt(s)
      if (code < 0 || code >= k) return null
      val c = codebooks(s)(code)
      val off = s * dsub
      var j = 0
      while (j < dsub) {
        val x = if (isFloat) q.getFloat(off + j).toDouble
        else q.getDouble(off + j)
        val diff = x - c(j)
        acc += diff * diff
        j += 1
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = vecElemType.get match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
    }
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      s"""
        double $acc = 0.0;
        if ($codes.numElements() != $m || $q.numElements() < ${m * dsub}) {
          ${ev.isNull} = true;
        }
        for (int $s = 0; !${ev.isNull} && $s < $m; $s++) {
          if ($codes.isNullAt($s)) { ${ev.isNull} = true; break; }
          int $code = $codes.getInt($s);
          if ($code < 0 || $code >= $k) { ${ev.isNull} = true; break; }
          double[] $c = $cb[$s][$code];
          int $off = $s * $dsub;
          for (int $j = 0; $j < $dsub; $j++) {
            double diff = (double) $q.$get($off + $j) - $c[$j];
            $acc += diff * diff;
          }
        }
        if (!${ev.isNull}) { ${ev.value} = $acc; }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graft.bridge

  /** Column-level entry point: `cosine_similarity(a, b)`. */
  def cosine_similarity(a: Column, b: Column): Column =
    bridge.column(
      CosineSimilarity(bridge.expression(a), bridge.expression(b)))

  /** Column-level entry point: `nearest_cell(vec, centroids)`. */
  def nearest_cell(vec: Column, centroids: Column): Column =
    bridge.column(
      NearestCell(bridge.expression(vec), bridge.expression(centroids)))

  /** Column-level entry point: `pq_adc_distance(query, codes)` with
    * driver-trained codebooks.
    */
  def pq_adc_distance(
      query: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    bridge.column(PqAdcDistance(
      bridge.expression(query), bridge.expression(codes), codebooks))

  /** Expose the functions to SQL: `SELECT cosine_similarity(a, b)`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    bridge.registerFunction(spark, "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "nearest_cell",
      exprs => NearestCell(exprs(0), exprs(1)))
  }
}
