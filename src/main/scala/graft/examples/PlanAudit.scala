package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** One-line plan summary per query: join strategies, exchange counts,
  * and whole-stage-codegen coverage — the things that decide whether a
  * plan survives a 100× scale-up. Flags cartesian products on
  * non-similarity queries (where they'd be a bug, not brute force).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other =>
        other +: (other.children.flatMap(walk) ++
          other.subqueries.flatMap(walk))
    }

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // finalize AQE
        val nodes = walk(df.queryExecution.executedPlan)
        val joins = nodes.collect {
          case _: BroadcastHashJoinExec => "BHJ"
          case _: SortMergeJoinExec => "SMJ"
          case _: ShuffledHashJoinExec => "SHJ"
          case _: CartesianProductExec => "CARTESIAN"
          case _: BroadcastNestedLoopJoinExec => "BNLJ"
        }
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
        val bcasts = nodes.count(_.isInstanceOf[BroadcastExchangeLike])
        val codegen = nodes.count(
          _.getClass.getSimpleName.startsWith("WholeStageCodegen"))
        println(f"[audit] $name%-28s joins=${joins.mkString("+")}%-16s " +
          f"shuffles=$shuffles bcast=$bcasts codegenSpans=$codegen")
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
