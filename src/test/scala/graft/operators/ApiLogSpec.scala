package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** The reference-schema lifecycle ([[ApiLog]]): the reshape carries
  * the reference's exact 14 columns in order (reference
  * README.md:172-189), and the full streaming-ingest lifecycle
  * preserves every reshaped row through the flush/commit loop into
  * the catalog folds. */
class ApiLogSpec extends SparkSpec {

  test("apiFrame: the reference's exact 14-column schema, in order") {
    val df = ApiLog.apiFrame(spark, sfDir)
    assert(df.columns.toSeq === Seq("time", "name", "bucket", "object",
      "httpStatusCode", "inputBytes", "outputBytes", "requestTime",
      "timeToFirstByte", "sourceHost", "userAgent", "accessKey",
      "requestId", "node"))
    // spot the deterministic derivations
    val r = df.orderBy(col("time")).limit(1).collect()(0)
    assert(r.getAs[String]("name").startsWith("s3:"))
    assert(r.getAs[String]("bucket").startsWith("bucket-"))
    assert(r.getAs[String]("requestTime").matches("\\d+m\\d+\\.\\d+s"))
    assert(Set(200, 404, 503).contains(r.getAs[Int]("httpStatusCode")))
    assert(df.count() === Tables.events(spark, sfDir).count())
  }

  test("lifecycle: the streaming flush/commit loop loses and duplicates nothing") {
    val out = ApiLog.lifecycle(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    val countRow = out.find(_.getAs[String]("q") == "count").get
    assert(countRow.getAs[Long]("n") === total,
      "the count catalog query must see every flushed row exactly once")
    assert(out.count(_.getAs[String]("q") == "recent") === 20)
    // errors fold only covers >= 400, and every error event maps there
    val errorRows = out.filter(_.getAs[String]("q") == "errors")
    assert(errorRows.nonEmpty)
    assert(errorRows.map(_.getAs[Long]("n")).sum ===
      Tables.events(spark, sfDir).filter(col("event_type") === "error").count())
    // latency fold is present for every op name with exact µs sums
    assert(out.count(_.getAs[String]("q") == "latency") === 5)
  }
}
