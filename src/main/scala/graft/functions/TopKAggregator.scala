package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate (a neighbor id and its similarity). */
final case class Scored(id: Long, score: Double)

/** Typed bounded top-k aggregator: keeps the k best candidates per
  * group with a size-capped buffer — O(n log k) per partition with
  * map-side partial aggregation, instead of materializing and sorting
  * every candidate under a ranking window. At 100 TB the window
  * approach shuffles all n candidates per group; this ships at most k
  * per partition per group.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `row_number() OVER (ORDER BY sim DESC, n_id)` formulation so both
  * physical strategies return the same rows.
  */
final class TopKAggregator(k: Int)
  extends Aggregator[Scored, List[Scored], List[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def bound(xs: List[Scored]): List[Scored] =
    xs.sortWith(better).take(k)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    bound(a :: buf)

  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    bound(b1 ++ b2)

  override def finish(reduction: List[Scored]): List[Scored] =
    reduction.sortWith(better)

  override def bufferEncoder: Encoder[List[Scored]] =
    ExpressionEncoder[List[Scored]]()

  override def outputEncoder: Encoder[List[Scored]] =
    ExpressionEncoder[List[Scored]]()
}

object TopKAggregator {
  /** Convenience: the aggregator as a typed Column. */
  def topK(k: Int): org.apache.spark.sql.TypedColumn[Scored, List[Scored]] =
    new TopKAggregator(k).toColumn
}
