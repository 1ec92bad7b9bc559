package graft.functions

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The BottomK aggregator must select exactly the rows the full
  * per-group sort would, under any partial-aggregation tree. */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("q_sample equals the window+sort formulation, positions included") {
    val viaAgg = Analytics.qSample(spark, sfDir)
      .select(col("event_type"), col("pos"), col("sample_id"))
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    val viaWindow = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), xxhash64(col("event_id")).as("h"), col("event_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), (col("rnk") - 1).cast("int").as("pos"), col("event_id"))
      .as[(String, Int, Long)].collect().toSet
    assert(viaAgg.nonEmpty && viaAgg === viaWindow)
  }

  test("reduce/merge are associative: any partial-aggregation split agrees") {
    val agg = new BottomK(3)
    val rows = (1L to 40L).map(i => (i * 2654435761L % 97, i))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    (1 until rows.size - 1).foreach { cut =>
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq === whole.toSeq, s"split at $cut diverged")
    }
    assert(agg.finish(whole).length === 3)
  }
}
