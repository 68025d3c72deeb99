package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-K as a BOUNDED partial aggregate — the scale path for
  * "top 20 posts per industry" that the window form cannot provide.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY m DESC)` shuffles EVERY
  * row to its group's reducer and sorts there: at 100 TB the shuffle is
  * the whole table. This Aggregator keeps a ≤k buffer per group and is
  * map-side combinable (ObjectHashAggregate plans a partial_topk before
  * the exchange), so the shuffle carries at most k rows per group per
  * map partition — the same contract as `TakeOrderedAndProject` but per
  * GROUP. Same (metric DESC, id ASC) total tiebreak as the window form;
  * equality with it is spec-pinned.
  *
  * Buffers hold (metric, id) pairs in result order; `merge` is a sorted
  * merge truncated at k, associative and commutative, so the result is
  * partitioning-independent (also spec-pinned).
  */
class TopKAgg(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"top-k needs k >= 1: $k")

  /** Result order: metric descending, id ascending on ties. */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    // fast path: a full buffer whose worst entry beats the row is unchanged
    if (b.length == k && !beats(a, b.last)) b else merge(b, Vector(a))

  override def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < b1.length || j < b2.length)) {
      val left = j >= b2.length || (i < b1.length && beats(b1(i), b2(j)))
      if (left) { out += b1(i); i += 1 } else { out += b2(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column form: `topK(k)(metric, id)` aggregates to the group's top-k
    * `array<struct<_1: metric, _2: id>>` in result order. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k))
    (metric, id) => fn(metric, id)
  }
}
