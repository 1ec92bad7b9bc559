package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters sketch: the top-`k` most
  * frequent keys of a stream, found with a BOUNDED `capacity`-entry
  * state per aggregation buffer — the 100 TB answer to "top talkers"
  * when the key domain (users, IPs, objects) is too large to count
  * exactly. An exact top-k needs a counter per distinct key (billions);
  * this carries at most `capacity` counters through map-side partial
  * aggregation and the shuffle.
  *
  * Algorithm (the standard mergeable summary): counters are summed
  * pointwise; whenever more than `capacity` keys are held, every
  * counter is decremented by the (capacity+1)-th largest count and
  * non-positive ones are dropped. Guarantee: a key with true count t
  * is reported with estimate e where t - n/(capacity+1) <= e <= t
  * (n = stream length) — so any key more frequent than n/(capacity+1)
  * is ALWAYS retained, and capacity only trades memory for count
  * precision, never misses a sufficiently heavy hitter.
  *
  * Estimates depend on the partial-aggregation tree (different
  * partitionings evict at different moments), so results are
  * approximate-by-contract: the query using this is rows-only +
  * HeavyHittersSpec (planted-skew retention, error bound, exactness
  * below capacity).
  */
final class HeavyHitters(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, "k must be >= 1")
  require(capacity >= k, "capacity must be >= k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(state: Map[String, Long], key: String): Map[String, Long] =
    compress(state.updated(key, state.getOrElse(key, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    compress(b.foldLeft(a) { case (s, (key, c)) =>
      s.updated(key, s.getOrElse(key, 0L) + c)
    })

  /** Decrement-all eviction: subtract the (capacity+1)-th largest
    * count from every counter and drop the non-positive. In reduce()
    * the map only ever exceeds capacity by ONE, so the decrement is
    * simply the minimum — O(capacity), no sort, keeping the per-row
    * map-side hot path cheap; the sort only runs in merge(), where
    * two full sketches combine. */
  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val d =
        if (m.size == capacity + 1) m.values.min
        else m.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(capacity)
      m.collect { case (key, c) if c - d > 0 => key -> (c - d) }
    }

  /** Top-k surviving keys, by (estimate desc, key) for a total order. */
  override def finish(state: Map[String, Long]): Seq[(String, Long)] =
    state.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  /** Unpack a sketch result column named `top` into one
    * (rank, user_id, est_count) row per entry — shared by the batch
    * query and the streaming variant so their output shapes can never
    * drift apart (the stream==batch spec rests on that). */
  def topToRows(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    df.select(posexplode(col("top")))
      .select((col("pos") + 1).as("rank"),
        col("col._1").as("user_id"), col("col._2").as("est_count"))
  }
}
