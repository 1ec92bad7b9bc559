package graft

import graft.sources.LogTable
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The SQL surface: a Trino user of the reference queries tables with
  * SQL, so registered views must answer plain spark.sql() with the
  * same results as the DataFrame operators — including over a live
  * LogTable. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll exposes every corpus table to spark.sql with exact semantics") {
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, event_type""".stripMargin).collect().toSeq
    val viaDf = operators.LogAnalytics.logByType(spark, sfDir)
      .select(col("event_type"), col("cnt")).collect().toSeq
    assert(viaSql.nonEmpty && viaSql === viaDf)
    // joins across registered views work too
    val nations = spark.sql(
      "SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey")
      .head().getLong(0)
    assert(nations === 25L)
    // integer time domain preserved in the view
    assert(spark.sql("SELECT min(ts_us) FROM events").head().get(0).isInstanceOf[Long])
  }

  test("registerViews exposes data + history + files metadata tables to SQL") {
    import spark.implicits._
    val t = LogTable(spark, Files.createTempDirectory("sql_meta_").toString)
    t.append((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((40 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
    t.compact()
    t.registerViews("lt")

    assert(spark.sql("SELECT count(*) FROM lt").head().getLong(0) === 50L)
    // history: 3 commits in order, operations visible to SQL
    val ops = spark.sql("SELECT operation FROM lt_history ORDER BY version")
      .as[String].collect().toSeq
    assert(ops === Seq("append", "append", "compact"))
    // files: manifest stats queryable — row counts must reconcile
    val fileRows = spark.sql("SELECT sum(rows) FROM lt_files").head().getLong(0)
    assert(fileRows === 50L)
    // column ranges surfaced for skipping diagnostics
    val ranges = spark.sql("SELECT ranges FROM lt_files").as[String].collect()
    assert(ranges.forall(_.contains("id:[")), s"missing id range in ${ranges.toSeq}")
  }

  test("a LogTable registers as a view and answers SQL across commits") {
    import spark.implicits._
    val t = LogTable(spark, Files.createTempDirectory("sql_table_").toString)
    t.append((0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.read().createOrReplaceTempView("log_table")
    assert(spark.sql("SELECT count(*) FROM log_table").head().getLong(0) === 10L)
    // views capture the snapshot at registration; re-register to see
    // new commits (same contract as Iceberg's snapshot-scoped reads)
    t.append((10 until 25).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    t.read().createOrReplaceTempView("log_table")
    assert(spark.sql("SELECT count(*) FROM log_table").head().getLong(0) === 25L)
    assert(spark.sql("SELECT max(id) FROM log_table").head().getLong(0) === 24L)
  }
}
