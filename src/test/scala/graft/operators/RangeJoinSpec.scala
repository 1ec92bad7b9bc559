package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The binned range join must match the naive inequality join exactly
  * — including intervals spanning many bins, bin-boundary points,
  * empty intervals, and overlapping intervals (one output row per
  * containing interval). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, "p1"), (10L, "p10"), (99L, "p99"), (100L, "p100"),
    (101L, "p101"), (250L, "p250"), (999L, "p999"))
    .toDF("t", "pv")
  private lazy val intervals = Seq(
    (0L, 100L, "i0"),      // [0,100) — excludes the boundary point 100
    (100L, 101L, "i100"),  // width-1
    (90L, 260L, "i90"),    // spans several bins, overlaps i0/i100
    (300L, 300L, "i300"),  // empty — matches nothing
    (998L, 1005L, "i998"))
    .toDF("s", "e", "iv")

  private def naive: Set[(Long, String, String)] =
    points.join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .select(col("t"), col("pv"), col("iv"))
      .as[(Long, String, String)].collect().toSet

  test("binned join equals the naive inequality join across bin widths") {
    Seq(1L, 7L, 64L, 100L, 1000L).foreach { bin =>
      val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", bin)
        .select(col("t"), col("pv"), col("iv"))
        .as[(Long, String, String)].collect().toSet
      assert(got === naive, s"bin=$bin diverged")
    }
    // boundary semantics: end is exclusive, overlaps yield one row each
    assert(naive.contains((100L, "p100", "i100")))
    assert(!naive.exists(r => r._1 == 100L && r._3 == "i0"))
    assert(naive.contains((99L, "p99", "i0")) && naive.contains((99L, "p99", "i90")))
    assert(!naive.exists(_._3 == "i300"))
  }

  test("q_interval: every returned spike hour is a genuine anomaly hour") {
    val spikes = RangeJoin.qInterval(spark, sfDir)
    val anomalyHours = LogAnalytics.logAnomaly(spark, sfDir)
      .select(col("hour")).collect().map(_.getTimestamp(0)).toSet
    val got = spikes.select(col("spike_hour")).collect().map(_.getTimestamp(0)).toSet
    assert(got.nonEmpty && got.subsetOf(anomalyHours))
  }
}
