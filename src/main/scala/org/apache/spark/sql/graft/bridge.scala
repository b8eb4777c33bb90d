package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's sql namespace: Column ⇄ Expression
  * conversion for the engine's custom Catalyst expressions. These
  * helpers are `private[sql]` upstream; a tiny shim in the sql package
  * is the standard pattern for third-party Catalyst extensions.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom expression under a SQL function name on an
    * existing session (the FunctionRegistry is `private[sql]`).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Analyzed logical plan of a DataFrame (`queryExecution` lives on
    * the classic Dataset, not the sql-api facade).
    */
  def analyzed(df: org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** Wrap a hand-built logical plan back into a DataFrame
    * (`Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The materialized RDD behind a `localCheckpoint`ed DataFrame, if
    * any — lets iterative operators free a superseded round's blocks
    * deterministically instead of waiting for the ContextCleaner to
    * GC the dropped reference (block-manager accumulation across a
    * long query sweep taxes whichever query runs last).
    */
  def checkpointedRdd(df: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[_]] = analyzed(df) match {
    case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
    case _ => None
  }

  /** Block until every queued listener event is delivered — metric
    * collection via SparkListener is asynchronous, and a measurement
    * read before the bus drains undercounts (`listenerBus` is
    * `private[spark]`).
    */
  def drainListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Idempotently add a planner strategy to a live session (the
    * public `ExperimentalMethods` hook — works on any session, unlike
    * `spark.sql.extensions` which must be set at session build time).
    */
  def addStrategy(
      spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy)) {
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ strategy
    }
  }
}
