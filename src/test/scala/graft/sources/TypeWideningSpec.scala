package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import java.nio.file.Files

/** Type-widening schema evolution (Iceberg type promotion): int→long /
  * float→double as METADATA-ONLY commits — old narrow files stay on
  * disk and read through the parquet reader's widening conversion;
  * writers upcast narrow incoming batches so files converge on the
  * wide type. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): LogTable =
    LogTable(spark, Files.createTempDirectory("widen_spec_").toString)

  test("widenColumn int→long / float→double: old files read, new appends upcast") {
    val t = freshTable()
    t.append((0 until 10).map(i => (i, i * 1.5f)).toDF("id", "x")) // int, float
    val preFiles = t.snapshot().files.map(_.path).toSet

    t.widenColumn("id", LongType)
    t.widenColumn("x", DoubleType)
    // metadata-only: no data file rewritten
    assert(t.snapshot().files.map(_.path).toSet === preFiles)
    assert(t.schema("id").dataType === LongType)
    assert(t.schema("x").dataType === DoubleType)

    // the old int32/float file reads under the widened schema
    assert(t.read().schema("id").dataType === LongType)
    assert(t.read().select("id").as[Long].collect().sorted === (0L until 10L).toArray)
    assert(t.read().select("x").as[Double].collect().min === 0.0)

    // appends in the WIDE type work...
    t.append(Seq((100L, 99.5)).toDF("id", "x"))
    // ...and appends still in the NARROW type upcast at the writer
    t.append(Seq((200, 1.25f)).toDF("id", "x"))
    assert(t.read().count() === 12L)
    assert(t.read().select("id").as[Long].collect().max === 200L)
    // field ids survived the retype (stable identity)
    assert(t.schema.forall(f => LogTable.fieldId(f).isDefined))
  }

  test("widening composes with rename history and merge; narrowing is rejected") {
    val t = freshTable()
    t.append((0 until 6).map(i => (i, i * 10)).toDF("id", "score")) // both int
    t.widenColumn("score", LongType)
    t.renameColumn("score", "points") // rename AFTER widen: coalesce path + widened read
    assert(t.read().select("points").as[Long].collect().sum === 150L)

    // merge with a narrow (int) source into the widened table
    t.widenColumn("id", LongType)
    t.merge(Seq((0, 999), (100, 1)).toDF("id", "points"), "id")
    assert(t.read().filter(col("id") === 0).select("points").as[Long].head() === 999L)
    assert(t.read().count() === 7L)

    // narrowing / unrelated retype stays rejected
    intercept[IllegalArgumentException](t.widenColumn("points", IntegerType))
    intercept[IllegalArgumentException] {
      t.append(Seq(("oops", 1L)).toDF("id", "points"))
    }
  }

  test("DSv2 batch source reads pre-widen files under the widened schema") {
    val t = freshTable()
    t.append((0 until 5).map(i => (i, s"v$i")).toDF("id", "v"))
    t.widenColumn("id", LongType)
    t.append(Seq((1000000000000L, "big")).toDF("id", "v"))
    val got = spark.read.format("graft").load(t.root)
    assert(got.schema("id").dataType === LongType)
    assert(got.select("id").as[Long].collect().sorted ===
      (0L until 5L).toArray :+ 1000000000000L)
  }
}
