package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incrementally-maintained aggregate materialized views
  * ([[MaterializedView]]): refresh folds ONLY appended rows into
  * stored per-group state through one atomic merge commit that also
  * carries the refreshed-through base version (exactly-once); full
  * refresh resynchronizes after row-changing base operations in one
  * commit; both converge to the same contents as re-aggregating the
  * base from scratch. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 3 == 0) "a" else "b", i.toDouble))
      .toDF("id", "k", "v")

  private def fresh(): (LogTable, MaterializedView) = {
    val base = LogTable(spark, tmp("mv_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v")),
        MvAgg.Min("lo", col("v")), MvAgg.Max("hi", col("v"))))
    (base, mv)
  }

  private def contents(mv: MaterializedView): Map[String, (Long, Double, Double, Double)] =
    mv.read().collect().map { r =>
      r.getAs[String]("k") -> (r.getAs[Long]("n"), r.getAs[Double]("total"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
    }.toMap

  private def expected(base: LogTable): Map[String, (Long, Double, Double, Double)] =
    base.read().groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"),
        min($"v").as("lo"), max($"v").as("hi"))
      .collect().map { r =>
        r.getAs[String]("k") -> (r.getAs[Long]("n"), r.getAs[Double]("total"),
          r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      }.toMap

  test("incremental refresh over three appends equals the from-scratch aggregate") {
    val (base, mv) = fresh()
    assert(mv.refreshedVersion === 0L)
    base.append(rows(0 until 40))
    assert(mv.refresh() === 1L)
    base.append(rows(40 until 70))
    base.append(rows(70 until 100))
    // one refresh spanning TWO base commits folds both deltas once
    assert(mv.refresh() === 3L)
    assert(mv.refreshedVersion === 3L)
    assert(contents(mv) === expected(base))
  }

  test("refresh is a watermark no-op when nothing new landed, and exactly-once on re-run") {
    val (base, mv) = fresh()
    base.append(rows(0 until 50))
    mv.refresh()
    val v = mv.table.currentVersion
    val before = contents(mv)
    // nothing new: no commit on the view, contents unchanged
    assert(mv.refresh() === 1L)
    assert(mv.table.currentVersion === v)
    assert(contents(mv) === before)
  }

  test("base compaction between refreshes folds nothing (row-preserving maintenance)") {
    val (base, mv) = fresh()
    base.append(rows(0 until 30).repartition(3))
    mv.refresh()
    base.append(rows(30 until 60).repartition(3))
    base.compact()
    mv.refresh()
    assert(contents(mv) === expected(base))
  }

  test("a delta with new groups inserts them; existing groups merge in place") {
    val base = LogTable(spark, tmp("mv_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v"))))
    base.append(Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v"))
    mv.refresh()
    base.append(Seq(("a", 4.0), ("c", 8.0)).toDF("k", "v"))
    mv.refresh()
    val got = mv.read().orderBy($"k").collect().toSeq
    assert(got === Seq(Row("a", 3L, 7.0), Row("c", 1L, 8.0)))
  }

  test("NULL group keys and NULL values fold correctly (null-keyed group is its own group; null values are the merge identity)") {
    val base = LogTable(spark, tmp("mv_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v"))))
    base.append(Seq((Some("a"), Option.empty[Double]), (None, Some(5.0)))
      .toDF("k", "v"))
    mv.refresh()
    // group "a" saw only NULL values: stored total is NULL, not 0
    base.append(Seq((Some("a"), Some(2.0)), (None, Option.empty[Double]))
      .toDF("k", "v"))
    mv.refresh()
    val got = mv.read().collect()
      .map(r => Option(r.getAs[String]("k")) ->
        (r.getAs[Long]("n"), Option(r.get(r.fieldIndex("total"))))).toMap
    assert(got === Map(Some("a") -> (2L, Some(2.0)), None -> (2L, Some(5.0))))
  }

  test("multi-column group keys cannot collide across null/value splits") {
    val base = LogTable(spark, tmp("mv_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_view_"), Seq("k1", "k2"),
      Seq(MvAgg.Count("n")))
    base.append(Seq((Some("a"), Option.empty[String]),
      (Option.empty[String], Some("a"))).toDF("k1", "k2"))
    mv.refresh()
    // ("a", NULL) and (NULL, "a") are DISTINCT groups — a separator
    // join key would have collapsed them
    assert(mv.read().count() === 2L)
    assert(mv.read().agg(sum($"n")).collect().head.getLong(0) === 2L)
  }

  test("fullRefresh resynchronizes after a row-changing base delete, in one commit") {
    val (base, mv) = fresh()
    base.append(rows(0 until 60))
    mv.refresh()
    base.delete($"v" < 20.0)
    // the appended-rows walk refuses across a delete; incremental refresh throws
    intercept[Exception] { mv.refresh() }
    val viewV = mv.table.currentVersion
    mv.fullRefresh()
    assert(mv.table.currentVersion === viewV + 1)
    assert(contents(mv) === expected(base))
    // and incremental refresh resumes from the new watermark
    base.append(rows(100 until 120))
    mv.refresh()
    assert(contents(mv) === expected(base))
  }

  test("fullRefresh deletes groups that vanished from the base") {
    val base = LogTable(spark, tmp("mv_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_view_"), Seq("k"),
      Seq(MvAgg.Count("n")))
    base.append(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    mv.refresh()
    base.delete($"k" === "b")
    mv.fullRefresh()
    assert(mv.read().select($"k").as[String].collect().toSeq === Seq("a"))
  }

  test("refreshOrFull picks incremental when possible, full when the walk refuses") {
    val (base, mv) = fresh()
    base.append(rows(0 until 30))
    mv.refreshOrFull()
    assert(contents(mv) === expected(base))
    base.delete($"v" < 10.0)
    mv.refreshOrFull()
    assert(contents(mv) === expected(base))
  }

  test("view state survives reopen; a drifted definition is refused loudly") {
    val base = LogTable(spark, tmp("mv_base_"))
    val dir = tmp("mv_view_")
    val mv = MaterializedView(spark, base, dir, Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v"))))
    base.append(Seq(("a", 1.0)).toDF("k", "v"))
    mv.refresh()
    // reopen with the same definition: watermark and contents carry over
    val mv2 = MaterializedView(spark, base, dir, Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v"))))
    assert(mv2.refreshedVersion === 1L)
    assert(mv2.read().collect().toSeq === Seq(Row("a", 1L, 1.0)))
    // a different definition against recorded state must refuse
    val e = intercept[IllegalArgumentException] {
      MaterializedView(spark, base, dir, Seq("k"), Seq(MvAgg.Count("cnt")))
    }
    assert(e.getMessage.contains("definition"))
  }

  test("view maintenance (compact) between refreshes neither disturbs contents nor the watermark") {
    val (base, mv) = fresh()
    base.append(rows(0 until 20))
    mv.refresh()
    base.append(rows(20 until 40))
    mv.refresh()
    mv.table.compact()
    assert(mv.refreshedVersion === 2L) // tag walk skips the compact commit
    base.append(rows(40 until 60))
    mv.refresh()
    assert(contents(mv) === expected(base))
  }

  test("definition validation refuses duplicate names, reserved names, empty keys") {
    val base = LogTable(spark, tmp("mv_base_"))
    intercept[IllegalArgumentException] {
      MaterializedView(spark, base, tmp("mv_view_"), Nil, Seq(MvAgg.Count("n")))
    }
    intercept[IllegalArgumentException] {
      MaterializedView(spark, base, tmp("mv_view_"), Seq("k"), Nil)
    }
    intercept[IllegalArgumentException] {
      MaterializedView(spark, base, tmp("mv_view_"), Seq("k"),
        Seq(MvAgg.Count("k")))
    }
    intercept[IllegalArgumentException] {
      MaterializedView(spark, base, tmp("mv_view_"), Seq("k"),
        Seq(MvAgg.Count("mv_key")))
    }
  }

  test("Avg: fused sum+count state — incremental == full == from-scratch, nulls are identity") {
    val base = LogTable(spark, tmp("mv_avg_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_avg_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Avg("avg_v", col("v"))))
    def byK(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Any)] =
      df.collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n"), r.getAs[Any]("avg_v"))).toMap
    // exact long values: partial sums merge exactly, so incremental
    // and full agree bit-for-bit even through several refreshes
    def longRows(ids: Range) =
      ids.map(i => (i.toLong, if (i % 3 == 0) "a" else "b", i.toLong * 10))
        .toDF("id", "k", "v")
    base.append(longRows(0 until 40))
    mv.refresh()
    base.append(longRows(40 until 90))
    mv.refresh()
    val incremental = byK(mv.read())
    val scratch = byK(base.read().groupBy($"k")
      .agg(count(lit(1)).as("n"), avg($"v").as("avg_v")))
    assert(incremental === scratch)
    // a second identically-defined view built by ONE full refresh
    val mv2 = MaterializedView(spark, base, tmp("mv_avg_view2_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Avg("avg_v", col("v"))))
    mv2.fullRefresh()
    assert(byK(mv2.read()) === incremental)
    // a delta whose group sees only NULL values must not disturb the
    // stored ratio; an all-null group presents NULL (SQL avg), not 0/0
    base.append(Seq((900L, "a", null.asInstanceOf[java.lang.Long]),
      (901L, "z", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "k", "v"))
    mv.refresh()
    val after = byK(mv.read())
    assert(after("a")._2 === scratch("a")._2, "null delta changed a stored avg")
    assert(after("z") === ((1L, null)), "all-null group must present NULL avg")
  }

  test("ApproxDistinct: HLL sketch state — incremental == full, exact at small cardinality") {
    val base = LogTable(spark, tmp("mv_hll_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_hll_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.ApproxDistinct("users", col("u"))))
    def rows(ids: Range) = ids
      .map(i => (i.toLong, if (i % 3 == 0) "a" else "b", (i % 37).toLong))
      .toDF("id", "k", "u")
    base.append(rows(0 until 50))
    mv.refresh()
    base.append(rows(50 until 120))
    mv.refresh()
    val got = mv.read().collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("users")).toMap
    // 37 distinct values: well inside the sketch's exact (sparse) range
    val exact = base.read().groupBy($"k").agg(countDistinct($"u").as("d"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("d")).toMap
    assert(got === exact)
    // incremental union == one-shot full rebuild (same sketch algebra)
    val mv2 = MaterializedView(spark, base, tmp("mv_hll_view2_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.ApproxDistinct("users", col("u"))))
    mv2.fullRefresh()
    val full = mv2.read().collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("users")).toMap
    assert(full === got)
  }

  test("SQL surface: CREATE MATERIALIZED VIEW with avg and approx_count_distinct") {
    val wh = tmp("mv_sql_wh_")
    GraftSql.setWarehouse(wh)
    GraftSql.exec(spark, "DROP TABLE IF EXISTS mv_sql_base")
    GraftSql.exec(spark, "CREATE TABLE mv_sql_base (id BIGINT, k STRING, v BIGINT)")
    (0 until 60).map(i => (i.toLong, if (i % 2 == 0) "x" else "y", i.toLong))
      .toDF("id", "k", "v").createOrReplaceTempView("mv_sql_src")
    GraftSql.exec(spark, "INSERT INTO mv_sql_base SELECT * FROM mv_sql_src")
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW mv_sql_v AS
        |SELECT k, count(*) AS n, avg(v) AS avg_v,
        |  approx_count_distinct(v) AS nv
        |FROM mv_sql_base GROUP BY k""".stripMargin)
    GraftSql.exec(spark, "CALL refresh_mv(mv_sql_v)")
    val got = spark.sql("SELECT k, n, avg_v, nv FROM mv_sql_v ORDER BY k").collect()
    assert(got.length === 2)
    val x = got(0)
    assert(x.getAs[String]("k") === "x")
    assert(x.getAs[Long]("n") === 30L)
    assert(x.getAs[Double]("avg_v") === 29.0) // avg of 0,2,...,58
    assert(x.getAs[Long]("nv") === 30L)
    GraftSql.exec(spark, "DROP MATERIALIZED VIEW mv_sql_v")
  }

  test("refreshCdc: retraction-based IVM through deletes/updates/merges, with group death") {
    val base = LogTable(spark, tmp("mv_cdc_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_cdc_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v")),
        MvAgg.Avg("avg_v", col("v"))))
    def longRows(ids: Range) =
      ids.map(i => (i.toLong, s"g${i % 4}", i.toLong * 10)).toDF("id", "k", "v")
    base.append(longRows(0 until 40).repartition(2))
    mv.refresh()

    // row-changing ops: plain refresh refuses, CDC refresh folds the
    // changelog — deletes retract, updates net, merges do both
    base.delete($"id" < 8)
    base.update($"k" === "g1", Map("v" -> ($"v" + 1000L)))
    base.merge(longRows(100 until 104), "id")
    intercept[Exception](mv.refresh())
    mv.refreshCdc()
    def viewRows() = mv.read().orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getAs[Any](3)))
    def scratch() = base.read().groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"), avg($"v").as("avg_v"))
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getAs[Any](3)))
    assert(viewRows() === scratch())
    assert(mv.refreshedVersion === base.currentVersion)
    // exactly-once: re-run no-ops on the watermark
    val vv = mv.table.currentVersion
    assert(mv.refreshCdc() === base.currentVersion)
    assert(mv.table.currentVersion === vv)

    // GROUP DEATH: delete every remaining g2 row — the group must
    // LEAVE the state, not linger as a zero row
    base.delete($"k" === "g2")
    mv.refreshCdc()
    assert(viewRows() === scratch())
    assert(!mv.read().select($"k").as[String].collect().contains("g2"))

    // refreshOrFull prefers the CDC path when eligible (no full re-scan
    // commit shape: the view commit is a merge, not a full replace)
    base.delete($"id" === 30L)
    mv.refreshOrFull()
    assert(viewRows() === scratch())

    // a group born AND fully died within one refresh window must not
    // linger as an all-zero state row
    base.append(Seq((900L, "ghost", 5L), (901L, "ghost", 7L)).toDF("id", "k", "v"))
    base.delete($"k" === "ghost")
    mv.refreshCdc()
    assert(!mv.read().select($"k").as[String].collect().contains("ghost"),
      "born-and-died group must never enter the view")
    assert(viewRows() === scratch())

    // ineligible shapes refuse loudly
    val mvMin = MaterializedView(spark, base, tmp("mv_cdc_min_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Min("lo", col("v"))))
    mvMin.fullRefresh()
    base.delete($"id" === 31L)
    val e = intercept[IllegalArgumentException](mvMin.refreshCdc())
    assert(e.getMessage.contains("retractable"))
    val mvNoCount = MaterializedView(spark, base, tmp("mv_cdc_nc_"), Seq("k"),
      Seq(MvAgg.Sum("total", col("v"))))
    val e2 = intercept[IllegalArgumentException](mvNoCount.refreshCdc())
    assert(e2.getMessage.contains("Count"))
  }

  test("refreshOrFull catches ONLY the maintenance-boundary refusal; the trigger type is pinned") {
    val (base, _) = fresh()
    base.append(rows(0 until 20))
    base.delete($"id" < 5)
    // the appends walk's row-changer refusal IS the dedicated type —
    // refreshOrFull's fallback trigger, nothing broader
    val e = intercept[LogTable.MaintenanceBoundaryException](
      base.readAppends(1L, base.currentVersion).count())
    assert(e.getMessage.contains("changes rows"))
    // a genuine user error inside the CDC fallback must SURFACE, not
    // silently degrade: reserved mv_sign column on the base
    val dirty = LogTable(spark, tmp("mv_dirty_base_"))
    dirty.append(rows(0 until 10).withColumn("mv_sign", lit(1L)))
    val mv2 = MaterializedView(spark, dirty, tmp("mv_dirty_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v"))))
    mv2.refresh()
    dirty.delete($"id" === 3L)
    val e2 = intercept[IllegalArgumentException](mv2.refreshOrFull())
    assert(e2.getMessage.contains("mv_sign"),
      s"reserved-column user error must surface, got: ${e2.getMessage}")
  }

  test("refreshOrFull falls back to a full rebuild when the CDC history a retraction fold needs is expired") {
    val base = LogTable(spark, tmp("mv_exp_base_"))
    val mv = MaterializedView(spark, base, tmp("mv_exp_view_"), Seq("k"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", col("v"))))
    base.append(rows(0 until 30))
    mv.refresh()
    // a row-changing op the appends walk still SEES (its manifest is
    // retained → the boundary refusal fires), but whose CDC replay
    // window starts below the expired floor (v1's manifest is gone, so
    // the (1, 2] diff cannot read its parent side)
    base.delete($"id" < 10) // v2
    base.append(rows(100 until 110)) // v3
    base.append(rows(110 until 115)) // v4
    base.expire(keepLast = 3) // drops v1's manifest; floor = 2 > refreshed 1
    intercept[LogTable.CdcHistoryExpiredException](mv.refreshCdc())
    // …but refreshOrFull honors its documented contract and converges
    // via the full rebuild
    mv.refreshOrFull()
    val got = mv.read().orderBy($"k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n"), r.getAs[Double]("total")))
    val want = base.read().groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .orderBy($"k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n"), r.getAs[Double]("total")))
    assert(got === want)
    assert(mv.refreshedVersion === base.currentVersion)
  }
}
