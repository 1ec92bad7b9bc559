package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Nested (struct-field) schema evolution: ADD / DROP / WIDEN /
  * RENAME by dotted path, all metadata-only — no file rewritten, old
  * snapshots intact, dropped and vacated paths blocked from
  * resurrection; renamed fields read old files through the per-field
  * physical-name coalesce. */
class NestedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): LogTable = {
    val t = LogTable(spark, Files.createTempDirectory("nested_evo_").toString)
    t.append(Seq((1L, ("x", 10)), (2L, ("y", 20)))
      .toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("a"), col("s._2").as("b")).as("s")))
    t
  }

  test("addField: old files read NULL, new appends carry the field, no rewrite") {
    val t = fresh()
    val filesBefore = t.snapshot().files.map(_.path)
    t.addField("s.c", DoubleType)
    assert(t.snapshot().files.map(_.path) === filesBefore, "metadata-only")

    val out1 = t.read().select("id", "s.a", "s.b", "s.c").orderBy("id").collect()
    assert(out1.forall(_.isNullAt(3)), "pre-add rows must read the field as NULL")

    t.append(Seq((3L, ("z", 30, 1.5))).toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("a"), col("s._2").as("b"),
        col("s._3").as("c")).as("s")))
    val out2 = t.read().filter(col("id") === 3L).select("s.c").as[Double].head()
    assert(out2 === 1.5)
  }

  test("dropField: projected out now, visible in old snapshots, path blocked forever") {
    val t = fresh()
    val v1 = t.currentVersion
    t.dropField("s.b")
    assert(t.read().schema("s").dataType.asInstanceOf[StructType].fieldNames
      === Array("a"))
    // time travel still sees it
    assert(t.timeTravel(v1).select("s.b").as[Int].collect().sorted === Array(10, 20))
    // resurrection blocked: old files still store s.b values
    val e = intercept[IllegalArgumentException](t.addField("s.b", IntegerType))
    assert(e.getMessage.contains("dropped field"))
    // a DIFFERENT name is fine
    t.addField("s.b2", IntegerType)
    assert(t.read().select("s.b2").collect().forall(_.isNullAt(0)))
  }

  test("widenField: old int files read as long; narrow struct batches upcast at the writer") {
    val t = fresh()
    t.widenField("s.b", LongType)
    assert(t.read().select("s.b").as[Long].collect().sorted === Array(10L, 20L))
    // a writer still producing the narrow shape upcasts instead of failing
    t.append(Seq((3L, ("z", 30))).toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("a"), col("s._2").as("b")).as("s")))
    assert(t.read().select("s.b").as[Long].collect().sorted === Array(10L, 20L, 30L))
    // narrowing refused
    val e = intercept[IllegalArgumentException](t.widenField("s.b", IntegerType))
    assert(e.getMessage.contains("widening"))
  }

  test("deep paths navigate; bad paths and non-structs fail loudly") {
    val root = Files.createTempDirectory("nested_deep_").toString
    val t = LogTable(spark, root)
    t.append(Seq((1L, (("p", 5), "q"))).toDF("id", "o")
      .select(col("id"), struct(
        struct(col("o._1._1").as("m"), col("o._1._2").as("n")).as("inner"),
        col("o._2").as("tag")).as("o")))
    t.addField("o.inner.extra", LongType)
    t.widenField("o.inner.n", LongType)
    assert(t.read().select("o.inner.n").as[Long].head() === 5L)
    intercept[IllegalArgumentException](t.addField("o.missing.x", LongType))
    intercept[IllegalArgumentException](t.addField("id.x", LongType)) // not a struct
    intercept[IllegalArgumentException](t.dropField("o..tag"))
  }

  test("nested rename stays refused; catalog SQL drives add/widen/drop by dotted path") {
    val wh = Files.createTempDirectory("nested_cat_").toString
    spark.conf.set("spark.sql.catalog.gnev", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnev.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnev.ns")
    spark.sql("CREATE TABLE gnev.ns.t (id BIGINT, s STRUCT<a: STRING, b: INT>)")
    spark.sql("INSERT INTO gnev.ns.t SELECT 1L, named_struct('a', 'x', 'b', 7)")

    spark.sql("ALTER TABLE gnev.ns.t ADD COLUMN s.c DOUBLE")
    spark.sql("ALTER TABLE gnev.ns.t ALTER COLUMN s.b TYPE BIGINT")
    val row = spark.sql("SELECT s.a, s.b, s.c FROM gnev.ns.t").collect().head
    assert(row.getString(0) === "x" && row.getLong(1) === 7L && row.isNullAt(2))

    spark.sql("ALTER TABLE gnev.ns.t DROP COLUMN s.a")
    assert(spark.table("gnev.ns.t").schema("s").dataType
      .asInstanceOf[StructType].fieldNames === Array("b", "c"))

    // nested RENAME through Spark's own ALTER: metadata-only, old
    // files read under the new name via the DSv2 struct rebuild
    spark.sql("ALTER TABLE gnev.ns.t RENAME COLUMN s.b TO z")
    val renamed = spark.sql("SELECT s.z, s.c FROM gnev.ns.t").collect().head
    assert(renamed.getLong(0) === 7L && renamed.isNullAt(1))
  }

  test("GraftSql ALTER routes dotted paths to struct-field evolution") {
    val t = LogTable(spark, Files.createTempDirectory("nested_gsql_").toString)
    t.append(Seq((1L, ("x", 7))).toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("a"), col("s._2").as("b")).as("s")))
    GraftSql.register("gsql_nested", t)
    GraftSql.exec(spark, "ALTER TABLE gsql_nested ADD COLUMN s.c DOUBLE")
    GraftSql.exec(spark, "ALTER TABLE gsql_nested ALTER COLUMN s.b TYPE BIGINT")
    val row = spark.sql("SELECT s.a, s.b, s.c FROM gsql_nested").collect().head
    assert(row.getString(0) === "x" && row.getLong(1) === 7L && row.isNullAt(2))
    GraftSql.exec(spark, "ALTER TABLE gsql_nested DROP COLUMN s.a")
    assert(spark.table("gsql_nested").schema("s").dataType
      .asInstanceOf[StructType].fieldNames === Array("b", "c"))
    GraftSql.exec(spark, "ALTER TABLE gsql_nested RENAME COLUMN s.b TO z")
    assert(spark.sql("SELECT s.z FROM gsql_nested").collect().head.getLong(0) === 7L)
  }

  test("renameField: metadata-only — old files read, old snapshots keep the name, resurrection blocked") {
    val t = fresh()
    val v1 = t.currentVersion
    val filesBefore = t.snapshot().files.map(_.path)
    t.renameField("s.b", "qty")
    assert(t.snapshot().files.map(_.path) === filesBefore, "metadata-only")
    // old files answer under the NEW name
    assert(t.read().select("s.qty").as[Int].collect().sorted === Array(10, 20))
    // whole-struct reads rebuild to the logical shape (a, qty)
    val structs = t.read().orderBy("id").select("s").collect()
      .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getInt(1)))
    assert(structs === Array(("x", 10), ("y", 20)))
    // old snapshots keep the old name — their manifest schema is theirs
    assert(t.timeTravel(v1).select("s.b").as[Int].collect().sorted === Array(10, 20))
    intercept[Exception](t.timeTravel(v1).select("s.qty").collect())

    // new appends carry the new name; generations read together
    t.append(Seq((3L, ("z", 30))).toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("a"), col("s._2").as("qty")).as("s")))
    assert(t.read().select("s.qty").as[Int].collect().sorted === Array(10, 20, 30))
    // a null struct row survives the rebuild as null
    t.append(t.read().limit(0).select(col("id") + 100,
      org.apache.spark.sql.functions.lit(null)
        .cast(t.read().schema("s").dataType))
      .toDF("id", "s").unionByName(
        Seq(Tuple1(4L)).toDF("id").select(col("id"),
          org.apache.spark.sql.functions.lit(null)
            .cast(t.read().schema("s").dataType).as("s"))))
    assert(t.read().filter(col("id") === 4L).select("s").collect().head.isNullAt(0))

    // resurrection blocked: s.b is retired (old files still store it)
    val e = intercept[IllegalArgumentException](t.addField("s.b", IntegerType))
    assert(e.getMessage.contains("dropped"))
    // renaming a sibling onto a historical name refused
    val e2 = intercept[IllegalArgumentException](t.renameField("s.a", "b"))
    assert(e2.getMessage.contains("renamed field") ||
      e2.getMessage.contains("historical"))
    // rename chains: history carries both prior names
    t.renameField("s.qty", "qty2")
    assert(t.read().filter(col("s").isNotNull)
      .select("s.qty2").as[Int].collect().sorted === Array(10, 20, 30))
    assert(t.read().filter(col("id") === 1L).select("s.qty2").as[Int].head() === 10)
  }
}
