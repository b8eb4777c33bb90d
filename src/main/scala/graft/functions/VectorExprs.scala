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

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
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
          double xi = (double) $a.getFloat($i);
          double yi = (double) $b.getFloat($i);
          $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
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

  override def prettyName: String = "nearest_cell"

  private def elem(x: ArrayData, i: Int): Double = vecElemType.get match {
    case FloatType => x.getFloat(i).toDouble
    case DoubleType => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val k = cs.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < k) {
      val c = cs.getArray(j)
      val n = math.min(c.numElements(), v.numElements())
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val diff = c.getDouble(i) - elem(v, i)
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
        for (int $j = 0; $j < $k; $j++) {
          org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
          int $n = java.lang.Math.min($c.numElements(), $a.numElements());
          double $d2 = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double diff = $c.getDouble($i) - (double) $a.$get($i);
            $d2 += diff * diff;
          }
          if ($d2 < $bestD) { $bestD = $d2; $best = $j; }
        }
        ${ev.value} = $best;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
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

  /** Expose the functions to SQL: `SELECT cosine_similarity(a, b)`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    bridge.registerFunction(spark, "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "nearest_cell",
      exprs => NearestCell(exprs(0), exprs(1)))
  }
}
