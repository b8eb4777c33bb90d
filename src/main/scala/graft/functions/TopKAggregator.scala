package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate (a neighbor id and its similarity). */
final case class Scored(id: Long, score: Double)

/** Typed bounded top-k aggregator: keeps the k best candidates per
  * group in a SORTED size-capped buffer — an O(k) bounded insert per
  * row (usually O(1): a candidate worse than the current k-th is
  * rejected by one comparison) with map-side partial aggregation,
  * instead of materializing and sorting every candidate under a
  * ranking window. At 100 TB the window approach shuffles all n
  * candidates per group; this ships at most k per partition per group.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `row_number() OVER (ORDER BY sim DESC, n_id)` formulation so both
  * physical strategies return the same rows. Scores compare via
  * java.lang.Double.compare, the same TOTAL order Spark SQL sorts
  * doubles with (NaN greatest, so a NaN-scored candidate ranks first
  * here exactly as it would under the window) — a naive `>`/`==`
  * comparator is not total under NaN and can both drop rows and blow
  * up TimSort.
  */
final class TopKAggregator(k: Int)
  extends Aggregator[Scored, List[Scored], List[Scored]] {
  require(k >= 1, s"k must be positive, got $k")

  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c > 0 else a.id < b.id
  }

  // buffers are maintained sorted (best first); bound() is only needed
  // where two arbitrary sorted lists meet
  private def bound(xs: List[Scored]): List[Scored] =
    xs.sortWith(better).take(k)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    if (buf.lengthCompare(k) >= 0 && !better(a, buf.last)) buf
    else {
      val (fore, aft) = buf.span(x => better(x, a))
      (fore ::: a :: aft).take(k)
    }

  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    bound(b1 ++ b2)

  override def finish(reduction: List[Scored]): List[Scored] =
    reduction

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
