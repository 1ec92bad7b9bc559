package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Table properties ([[LogTable.setProperties]], Iceberg
  * TBLPROPERTIES): free-form manifest-carried config with unknown
  * keys round-tripping untouched, plus the honored
  * `write.max-records-per-file` — every data write rolls to a new
  * file past the cap, the target-file-size knob. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): LogTable =
    LogTable(spark, Files.createTempDirectory("props_spec_").toString)

  test("properties round-trip, merge on set, and survive reopen; unset removes") {
    val t = fresh()
    t.setProperties(Map("owner" -> "pipeline-a", "comment" -> "events rollup"))
    t.setProperties(Map("owner" -> "pipeline-b")) // merge: overwrite one key
    assert(t.properties === Map("owner" -> "pipeline-b", "comment" -> "events rollup"))
    val reopened = LogTable(spark, t.root)
    assert(reopened.properties === t.properties)
    t.unsetProperties(Seq("comment", "never-set"))
    assert(t.properties === Map("owner" -> "pipeline-b"))
  }

  test("write.max-records-per-file rolls data files at the cap on every write path") {
    val t = fresh()
    t.setProperties(Map(LogTable.MaxRecordsProp -> "100"))
    // one input partition would otherwise write ONE 1000-row file
    t.append((0 until 1000).map(i => (i.toLong, i.toLong)).toDF("id", "v").coalesce(1))
    val s = t.snapshot()
    assert(s.files.size >= 10, s"expected >=10 rolled files, got ${s.files.size}")
    assert(s.files.forall(_.rows <= 100L))
    assert(t.read().count() === 1000L)
    assert(t.read().distinct().count() === 1000L)
    // compact respects the cap too: the fold cannot recreate a monolith
    t.compact()
    assert(t.snapshot().files.forall(_.rows <= 100L))
    assert(t.read().count() === 1000L)
  }

  test("the cap composes with the declared sort order (each rolled file is internally sorted)") {
    val t = fresh()
    t.setProperties(Map(LogTable.MaxRecordsProp -> "200"))
    t.setSortOrder(Seq("v"))
    t.append((0 until 600).map(i => (i.toLong, ((i * 7919) % 600).toLong))
      .toDF("id", "v").coalesce(1))
    val files = t.snapshot().files
    assert(files.size >= 3)
    files.foreach { f =>
      val rows = spark.read.parquet(f.path).select($"v").as[Long].collect().toSeq
      assert(rows === rows.sorted, "each rolled file must stay internally sorted")
    }
  }

  test("set-props is metadata-only: appends walk and CDC span it silently") {
    val t = fresh()
    t.append(Seq((1L, 2L)).toDF("id", "v"))
    val cursor = t.currentVersion
    t.setProperties(Map("a" -> "b"))
    t.append(Seq((3L, 4L)).toDF("id", "v"))
    assert(t.readAppends(cursor).count() === 1L)
    assert(t.readCdc(cursor).filter(col("_change_type") === "delete").count() === 0L)
    assert(t.readCdc(cursor).count() === 1L)
  }

  test("honored keys validate at set time; SQL ALTER drives the same property") {
    val t = fresh()
    val e = intercept[IllegalArgumentException] {
      t.setProperties(Map(LogTable.MaxRecordsProp -> "zero"))
    }
    assert(e.getMessage.contains("positive integer"))

    val wh = Files.createTempDirectory("props_sql_wh_").toString
    GraftSql.setWarehouse(wh)
    GraftSql.exec(spark, "DROP TABLE IF EXISTS props_sql_t")
    GraftSql.exec(spark, "CREATE TABLE props_sql_t (id BIGINT)")
    GraftSql.exec(spark,
      "ALTER TABLE props_sql_t SET TBLPROPERTIES (" +
        "'write.max-records-per-file' = '50', 'owner' = 'sql-user')")
    assert(GraftSql.table("props_sql_t").properties ===
      Map("write.max-records-per-file" -> "50", "owner" -> "sql-user"))
    GraftSql.exec(spark,
      "INSERT INTO props_sql_t SELECT id FROM RANGE(200)")
    assert(GraftSql.table("props_sql_t").snapshot().files.forall(_.rows <= 50L))
    GraftSql.exec(spark,
      "ALTER TABLE props_sql_t UNSET TBLPROPERTIES ('owner')")
    assert(GraftSql.table("props_sql_t").properties ===
      Map("write.max-records-per-file" -> "50"))
    GraftSql.exec(spark, "DROP TABLE props_sql_t")
  }
}
