package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` — the executor half of
  * the Bloom ingest gate (`operators.NearDup.bloomGate`).
  *
  * The filter object rides the plan as a codegen reference
  * (`addReferenceObj`, same mechanism Spark's injected runtime bloom
  * filters use), so the probe is a fused primitive call inside
  * whole-stage codegen: no UDF boxing, no per-row deserialization, no
  * broadcast-variable lookup. Input is the row's `xxhash64` key — a
  * LongType probe keeps the generated code allocation-free (a
  * string/binary probe would re-hash bytes per row).
  *
  * The guarantee this carries to the query layer: `mightContainLong`
  * has NO false negatives — a key that was put into the filter always
  * probes true — which is exactly the property the d13 oracle pins.
  */
case class BloomMightContainLong(filter: BloomFilter, child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint probe key (xxhash64 the content " +
        s"first), got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomExprs {
  import org.apache.spark.sql.graft.bridge

  /** Column-level entry point: probe `filter` with a bigint key. */
  def bloom_might_contain(filter: BloomFilter, key: Column): Column =
    bridge.column(BloomMightContainLong(filter, bridge.expression(key)))
}
