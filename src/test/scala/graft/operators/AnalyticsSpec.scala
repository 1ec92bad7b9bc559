package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("distributed global-index ntile equals the window ntile formulation") {
    val viaOp = Analytics.qNtile(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val viaWindow = graft.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(12,2)").as("p"))
      .withColumn("quartile",
        ntile(4).over(Window.orderBy(col("p"), col("o_orderkey"))).cast("long"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("double").as("total_price"))
      .orderBy(col("quartile"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaOp.nonEmpty && viaOp === viaWindow)
  }

  test("q_ntile: bucket count is boundary-independent (B=3 ≡ B=64), no RDD hop in the plan") {
    def rows(b: Int) = Analytics.qNtile(spark, sfDir, buckets = Some(b))
      .as[(Long, Long, Double)].collect().toSeq
    val a = rows(3)
    assert(a === rows(64),
      "quartile table must not depend on where range partitioning cut the buckets")
    assert(a.map(_._1) === Seq(1L, 2L, 3L, 4L))
    // the bucketed-census rewrite keeps the whole thing in DataFrame
    // ops: no ExistingRDD / scan-from-RDD node may appear
    val plan = Analytics.qNtile(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      "q_ntile must not round-trip through the RDD API")
  }
}
