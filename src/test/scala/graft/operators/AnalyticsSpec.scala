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
}
