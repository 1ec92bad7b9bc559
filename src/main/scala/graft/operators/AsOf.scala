package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic AS-OF join — the time-series primitive Spark lacks
  * natively: attach to each left row the most recent right row with
  * the same key and right time <= left time (or strictly <, per
  * `strict`).
  *
  * Never an inequality join: an `l.ts >= r.ts` theta-join explodes to
  * O(n·m) per key and sort-merges the whole space. Instead both sides
  * interleave into ONE stream, a single key-partitioned window carries
  * the latest right payload forward, and left rows read it — one
  * shuffle on the (high-cardinality) key, linear in input size, the
  * only as-of shape that survives 100 TB. AsOfSpec asserts equality
  * with the naive inequality-join formulation on both tie modes, and
  * LogAnalytics.logAsof (DuckDB-hash-checked) is built on this.
  *
  * Time columns must be integer-typed (epoch µs Longs in this corpus):
  * the strict variant excludes ties with an integer RANGE frame ending
  * at -1, so "strictly prior" is defined in the time domain, not row
  * order.
  */
object AsOf {

  /** Left rows + `r_<col>` columns of the as-of matched right row
    * (null when no prior right row exists for the key).
    *
    * DETERMINISM PRECONDITION: right rows must be unique per
    * (key, rightTime) — when two right rows tie on the same instant,
    * which one is carried depends on physical row order and can flip
    * between runs. Dedup the right side (or fold ties into one row)
    * before joining, exactly as with any engine's ASOF JOIN. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, strict: Boolean = false,
      rightPrefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(_ == key)
    require(!leftCols.exists(c => rightPayload.map(rightPrefix + _).contains(c)),
      s"left already has a ${rightPrefix}-prefixed output column; pass a different rightPrefix")
    val markers = Set("_t", "_is_l", "_lrow", "_rpay", "_asof")
    require(!(leftCols ++ right.columns).exists(markers.contains) && !markers.contains(key),
      "inputs use a reserved asofJoin marker column (_t, _is_l, _lrow, _rpay, _asof); rename it first")

    // one interleaved stream: left rows carry their payload, right rows
    // carry theirs; `_is_l` breaks time ties so a same-instant right row
    // sorts BEFORE the left row (visible to the non-strict frame)
    val l = left.select(
      col(key), col(leftTime).cast("long").as("_t"), lit(1).as("_is_l"),
      struct(leftCols.map(col): _*).as("_lrow"),
      lit(null).cast(right.select(rightPayload.map(col): _*).schema).as("_rpay"))
    val r = right.select(
      col(key), col(rightTime).cast("long").as("_t"), lit(0).as("_is_l"),
      lit(null).cast(left.select(leftCols.map(col): _*).schema).as("_lrow"),
      struct(rightPayload.map(col): _*).as("_rpay"))

    val w =
      if (strict)
        Window.partitionBy(col(key)).orderBy(col("_t"))
          .rangeBetween(Window.unboundedPreceding, -1)
      else
        Window.partitionBy(col(key)).orderBy(col("_t"), col("_is_l"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_is_l") === 1)

    carried.select(
      leftCols.map(c => col(s"_lrow.$c").as(c)) ++
        rightPayload.map(c => col(s"_asof.$c").as(s"$rightPrefix$c")): _*)
  }
}
