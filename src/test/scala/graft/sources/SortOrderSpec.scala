package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Declared write sort orders ([[LogTable.setSortOrder]], Iceberg's
  * write.sort-order): a metadata-only property that makes every
  * subsequent data-file write locally sort its rows, so files are
  * internally ordered (tight parquet row-group stats, intra-file
  * pruning, better compression). Existing files keep their layout
  * until compact retrofits them; recluster's own stronger arrangement
  * is never overridden. */
class SortOrderSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(partitionBy: Seq[String] = Nil): LogTable =
    LogTable(spark, Files.createTempDirectory("sort_spec_").toString,
      partitionBy = partitionBy)

  /** Deterministically scrambled (id, k, v) rows — NOT sorted by v. */
  private def scrambled(n: Int): DataFrame =
    (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", ((i * 7919) % n).toLong)
    }.toDF("id", "k", "v")

  /** Per data file: the file's rows in PHYSICAL order. */
  private def fileRows(t: LogTable, col0: String): Seq[Seq[Long]] =
    t.snapshot().files.map { f =>
      spark.read.parquet(f.path).select(col(col0)).as[Long].collect().toSeq
    }

  private def assertEachFileSorted(t: LogTable, c: String): Unit =
    fileRows(t, c).foreach { rows =>
      assert(rows === rows.sorted, s"file not internally sorted by $c")
    }

  test("setSortOrder round-trips in the manifest and applies to appends") {
    val t = fresh()
    t.setSortOrder(Seq("v"))
    assert(t.snapshot().sortCols === Seq("v"))
    t.append(scrambled(1000).repartition(3))
    assertEachFileSorted(t, "v")
    // reopen: the recorded order still applies
    val t2 = LogTable(spark, t.root)
    assert(t2.snapshot().sortCols === Seq("v"))
    t2.append(scrambled(500).repartition(2))
    assertEachFileSorted(t2, "v")
    // contents unaffected — ordering is physical only
    assert(t2.read().count() === 1500L)
    assert(t2.read().agg(sum($"v")).head().getLong(0) ===
      scrambled(1000).agg(sum($"v")).head().getLong(0) +
        scrambled(500).agg(sum($"v")).head().getLong(0))
  }

  test("unsorted pre-existing files are retrofitted by compact") {
    val t = fresh()
    t.append(scrambled(800).repartition(4))
    // at least one multi-row file is NOT internally sorted yet
    assert(fileRows(t, "v").exists(r => r.size > 1 && r != r.sorted))
    t.setSortOrder(Seq("v"))
    t.compact()
    assertEachFileSorted(t, "v")
    assert(t.read().count() === 800L)
  }

  test("sort order composes with partitioned writes (sort inside each partition file)") {
    val t = fresh(partitionBy = Seq("k"))
    t.setSortOrder(Seq("v"))
    t.append(scrambled(600))
    assertEachFileSorted(t, "v")
    assert(t.snapshot().files.forall(_.partitions.contains("k")))
    assert(t.read().filter($"k" === "a").count() === 300L)
  }

  test("COW rewrites keep the declared order; recluster keeps its own") {
    val t = fresh()
    t.setSortOrder(Seq("v"))
    t.append(scrambled(1000).repartition(2))
    t.delete($"id" % 10 === 0L)
    assertEachFileSorted(t, "v")
    // recluster by id: files are range-partitioned and sorted by id,
    // NOT re-sorted by the declared v
    t.recluster("id", 3)
    fileRows(t, "id").foreach(rows => assert(rows === rows.sorted))
    assert(t.read().count() === 900L)
  }

  test("the declared-order walk is append-transparent and the column is validated") {
    val t = fresh()
    t.append(scrambled(100))
    val cursor = t.currentVersion
    t.setSortOrder(Seq("v"))
    t.append(scrambled(50))
    // set-sort is metadata-only: the appends walk spans it
    assert(t.readAppends(cursor).count() === 50L)
    // unknown column refused loudly
    val e = intercept[IllegalArgumentException] { t.setSortOrder(Seq("nope")) }
    assert(e.getMessage.contains("not a table column"))
    // empty clears
    t.setSortOrder(Nil)
    assert(t.snapshot().sortCols === Nil)
  }

  test("CALL set_sort_order drives the same property through SQL") {
    val wh = Files.createTempDirectory("sort_sql_wh_").toString
    GraftSql.setWarehouse(wh)
    GraftSql.exec(spark, "DROP TABLE IF EXISTS sort_sql_t")
    GraftSql.exec(spark, "CREATE TABLE sort_sql_t (id BIGINT, v BIGINT)")
    GraftSql.exec(spark, "CALL set_sort_order(sort_sql_t, 'v')")
    assert(GraftSql.table("sort_sql_t").snapshot().sortCols === Seq("v"))
    GraftSql.exec(spark,
      "INSERT INTO sort_sql_t SELECT id, (id * 13) % 100 AS v FROM RANGE(100)")
    assertEachFileSorted(GraftSql.table("sort_sql_t"), "v")
    GraftSql.exec(spark, "CALL set_sort_order(sort_sql_t, '')")
    assert(GraftSql.table("sort_sql_t").snapshot().sortCols === Nil)
    GraftSql.exec(spark, "DROP TABLE sort_sql_t")
  }
}
