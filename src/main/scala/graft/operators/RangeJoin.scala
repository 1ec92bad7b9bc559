package graft.operators

import graft.{Cols, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic RANGE (interval) join — the second time-series primitive
  * Spark lacks natively: match each point row to the interval rows
  * whose [start, end) contains it.
  *
  * Spark plans `p.t >= i.start AND p.t < i.end` as a broadcast
  * nested-loop join — O(points × intervals) comparisons, the classic
  * range-join scale killer. This operator bins instead: every interval
  * explodes into the fixed-width bins it covers, every point maps to
  * its one bin, the join runs as a plain equi-join on the bin id, and
  * a residual exact filter removes same-bin near-misses. Cost is
  * O(points + intervals × avgSpan/bin) with an 8-byte shuffle key —
  * pick `bin` near the typical interval length so most intervals
  * explode into O(1) bins. RangeJoinSpec asserts equality with the
  * naive inequality join; the q_interval query oracle-checks it
  * against DuckDB's BETWEEN join.
  */
object RangeJoin {

  /** Inner join of `points` (at integer `ptCol`) to `intervals`
    * (over integer [`startCol`, `endCol`)): one output row per
    * (point, containing interval) pair. */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bin: Long): DataFrame = {
    require(bin >= 1, "bin must be >= 1")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "inputs already have a _bin column; rename it before pointInInterval")
    // backtick-quoted identifiers: a column named `a-b` or `evt.ts`
    // spliced raw into expr() would parse as arithmetic/field access
    // and silently mis-bin
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    // integer `div` (exact — a double `/` + cast could mis-bin near
    // integer boundaries at µs magnitudes); trunc-division is monotone,
    // which is all binning needs
    val iv = intervals
      // empty intervals ([s, s)) cover no bins: sequence(a, b) needs
      // a <= b, so floor((end-1)/bin) < floor(start/bin) must be guarded
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(
        expr(s"${q(startCol)} div $bin"), expr(s"(${q(endCol)} - 1) div $bin"))))
    val pt = points.withColumn("_bin", expr(s"${q(ptCol)} div $bin"))
    pt.join(iv, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }

  /** Oracle-checked interval-join query: traffic-spike hours (the
    * log_anomaly integer-domain definition) become [hour, hour+1h)
    * intervals; every purchase event joins to its containing spike
    * interval; output = purchases and value per spike hour. DuckDB
    * recomputes it with a plain BETWEEN join over the same derived
    * intervals. Bin = the interval width, so each interval lands in
    * exactly 1-2 bins. */
  def qInterval(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    // ONE spike definition: the intervals are derived from
    // LogAnalytics.logAnomaly (its own oracle row gates the rule), so
    // the anomaly threshold can never silently fork between the two
    // queries.
    val spikes = LogAnalytics.logAnomaly(s, dir)
      .select(unix_micros(col("hour")).as("start_us"),
        (unix_micros(col("hour")) + hourUs).as("end_us"))
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("ts_us"), col("value"))
    pointInInterval(purchases, "ts_us", spikes, "start_us", "end_us", bin = hourUs)
      .groupBy(timestamp_micros(col("start_us")).as("spike_hour"))
      .agg(count(lit(1)).as("n_purchases"),
        Cols.asDouble(sum(Cols.money(col("value")))).as("total_value"))
      .orderBy(col("spike_hour"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval" -> (qInterval _),
  )

  val oracles: Map[String, String] = Map(
    "q_interval" ->
      """WITH h AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us, count(*) AS n
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT hour_us, n, sum(n) OVER () AS total, count(*) OVER () AS n_hours FROM h),
        |spikes AS (
        |  SELECT hour_us AS start_us, hour_us + 3600000000 AS end_us FROM g
        |  WHERE n * n_hours > total * 2),
        |p AS (
        |  SELECT epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'purchase')
        |SELECT make_timestamp(s.start_us) AS spike_hour,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM p JOIN spikes s ON p.ts_us >= s.start_us AND p.ts_us < s.end_us
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
