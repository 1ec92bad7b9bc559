package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for consistent sampling: keep the `k` rows with
  * the SMALLEST hash per group — the deterministic, mergeable way to
  * sample a 100 TB corpus (same rows selected no matter how the data
  * is partitioned or re-run; growing the corpus only evicts by hash
  * order).
  *
  * Why an Aggregator and not a window: `row_number().over(partitionBy
  * .orderBy(hash))` SORTS every group in full; this aggregator keeps a
  * bounded k-element state per group through map-side partial
  * aggregation, so the shuffle carries at most k values per group and
  * nothing is ever fully sorted. This is the custom-AGGREGATE tier of
  * the extension ladder (scalar Expressions and mapPartitions are the
  * other two used in this library).
  *
  * State is a sorted array of at most k (hash, id) pairs; reduce and
  * merge keep the k smallest — associative and commutative, so any
  * partial-aggregation tree yields the same result. BottomKSpec
  * asserts equality with the window formulation.
  */
final class BottomK(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[Long]] {
  require(k >= 1, "k must be >= 1")

  private val ord = implicitly[Ordering[(Long, Long)]]

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(state: Array[(Long, Long)], row: (Long, Long)): Array[(Long, Long)] =
    insert(state, row)

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] =
    b.foldLeft(a)(insert)

  /** Keep the k smallest (hash, id) pairs, sorted ascending. */
  private def insert(state: Array[(Long, Long)], row: (Long, Long)): Array[(Long, Long)] =
    if (state.length == k && ord.lteq(state.last, row)) state
    else (state :+ row).sorted(ord).take(k)

  /** Sample ids in ascending hash order. */
  override def finish(state: Array[(Long, Long)]): Array[Long] = state.map(_._2)

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
