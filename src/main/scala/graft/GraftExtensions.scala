package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point for spark-submit users:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * registers the engine's native functions in the session catalog so
  * they are available from pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[graft.functions.NearestCell].getName,
        "nearest_cell"),
      exprs => graft.functions.NearestCell(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
