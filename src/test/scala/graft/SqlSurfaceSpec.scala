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
    // refs: tags and branches with resolved versions
    t.createRef("prod")
    t.createBranch("wip")
    t.registerViews("lt")
    val refs = spark.sql("SELECT name, type, version FROM lt_refs ORDER BY type, name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs === Seq(("wip", "branch", 1L), ("prod", "tag", 3L)))
    t.dropBranch("wip")
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("GraftSql INSERT/UPDATE/DELETE are byte-equal to the API calls") {
    import spark.implicits._
    import graft.sources.GraftSql
    // two tables, same lifecycle: one driven through SQL, one through API
    val sqlT = LogTable(spark, Files.createTempDirectory("gsql_dml_").toString)
    val apiT = LogTable(spark, Files.createTempDirectory("gsql_dml_api_").toString)
    GraftSql.register("gsql_t", sqlT)
    (0 until 100).map(i => (i.toLong, s"u${i % 7}", i * 1.5))
      .toDF("id", "user", "score").createOrReplaceTempView("gsql_src")

    GraftSql.exec(spark, "INSERT INTO gsql_t SELECT * FROM gsql_src WHERE id % 2 = 0")
    GraftSql.exec(spark, "INSERT INTO gsql_t SELECT * FROM gsql_src WHERE id % 2 = 1;")
    apiT.append(spark.table("gsql_src").filter(col("id") % 2 === 0))
    apiT.append(spark.table("gsql_src").filter(col("id") % 2 === 1))

    GraftSql.exec(spark,
      "UPDATE gsql_t SET score = score + 100.0, user = 'bumped' WHERE id % 10 = 3")
    apiT.update(col("id") % 10 === 3,
      Map("score" -> (col("score") + 100.0), "user" -> lit("bumped")))

    GraftSql.exec(spark, "DELETE FROM gsql_t WHERE user = 'u5'")
    apiT.delete(col("user") === "u5")

    assert(collectSorted(sqlT.read()) === collectSorted(apiT.read()))
    assert(sqlT.read().count() > 0)
    // the registered view tracks the mutations without re-registering
    assert(spark.sql("SELECT count(*) FROM gsql_t").head().getLong(0) ===
      apiT.read().count())
    // DML returns a snapshot summary row
    val s = GraftSql.exec(spark, "DELETE FROM gsql_t WHERE id = 0")
    assert(s.columns.toSeq === Seq("version", "operation", "n_files", "total_rows"))
    assert(s.head().getString(1) === "delete")
  }

  test("GraftSql MERGE with full clause surface is byte-equal to the API merge") {
    import spark.implicits._
    import graft.sources.GraftSql
    val sqlT = LogTable(spark, Files.createTempDirectory("gsql_merge_").toString)
    val apiT = LogTable(spark, Files.createTempDirectory("gsql_merge_api_").toString)
    GraftSql.register("gsql_m", sqlT)
    val base = (0 until 60).map(i => (i.toLong, s"t${i % 5}", i * 2.0)).toDF("id", "kind", "v")
    sqlT.append(base); apiT.append(base)
    // source: ids 0..19 matched (updates), 100..104 unmatched (inserts)
    ((0 until 20).map(i => (i.toLong, s"t${i % 5}", 1000.0 + i)) ++
      (100 until 105).map(i => (i.toLong, "fresh", i.toDouble)))
      .toDF("id", "kind", "v").createOrReplaceTempView("gsql_upd")

    GraftSql.exec(spark,
      """MERGE INTO gsql_m t USING gsql_upd s ON t.id = s.id
        |WHEN MATCHED AND t.kind = 't1' THEN DELETE
        |WHEN MATCHED AND s.v > 1005.0 THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.kind = 't4' THEN DELETE""".stripMargin)
    apiT.merge(spark.table("gsql_upd"), "id",
      matchedUpdateWhen = Some(col("src_v") > 1005.0),
      matchedDeleteWhen = Some(col("kind") === "t1"),
      notMatchedBySourceDelete = Some(col("kind") === "t4"))
    assert(collectSorted(sqlT.read()) === collectSorted(apiT.read()))

    // MERGE without an INSERT clause must NOT insert unmatched source rows
    val pre = sqlT.read().count()
    GraftSql.exec(spark,
      """MERGE INTO gsql_m t USING (SELECT CAST(9999 AS BIGINT) AS id, 'x' AS kind, CAST(1.0 AS DOUBLE) AS v) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(sqlT.read().count() === pre)
    assert(sqlT.read().filter(col("id") === 9999L).count() === 0L)
  }

  test("GraftSql time travel: @vN, @ref, @branch, VERSION AS OF, TIMESTAMP AS OF") {
    import spark.implicits._
    import graft.sources.GraftSql
    val t = LogTable(spark, Files.createTempDirectory("gsql_tt_").toString)
    GraftSql.register("gsql_tt", t)
    t.append((0 until 10).map(i => (i.toLong, "a")).toDF("id", "tag"))   // v1
    val afterV1 = System.currentTimeMillis()
    t.append((10 until 30).map(i => (i.toLong, "b")).toDF("id", "tag"))  // v2
    t.createRef("rc1", 1L)
    val b = t.createBranch("audit")
    b.append(Seq((99L, "branch-only")).toDF("id", "tag"))

    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_tt").head().getLong(0) === 30L)
    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_tt@v1").head().getLong(0) === 10L)
    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_tt@rc1").head().getLong(0) === 10L)
    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_tt@audit").head().getLong(0) === 31L)
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM gsql_tt VERSION AS OF 1").head().getLong(0) === 10L)
    assert(GraftSql.exec(spark,
      s"SELECT count(*) FROM gsql_tt TIMESTAMP AS OF $afterV1").head().getLong(0) === 10L)
    // time travel composes inside a bigger query (join current vs @v1)
    val grown = GraftSql.exec(spark,
      """SELECT count(*) FROM gsql_tt cur
        |LEFT ANTI JOIN gsql_tt@v1 old ON cur.id = old.id""".stripMargin)
      .head().getLong(0)
    assert(grown === 20L)
  }

  test("GraftSql CALL procedures route to the maintenance API") {
    import spark.implicits._
    import graft.sources.GraftSql
    val t = LogTable(spark, Files.createTempDirectory("gsql_call_").toString)
    GraftSql.register("gsql_c", t)
    (0 until 3).foreach { i =>
      t.append((i * 10 until (i + 1) * 10).map(j => (j.toLong, s"v$j")).toDF("id", "v").coalesce(1))
    }
    GraftSql.exec(spark, "CALL compact(gsql_c)")
    assert(t.snapshot().operation === "compact")
    assert(t.snapshot().files.size === 1)
    // scoped compaction: CALL compact(t, '<part-col>', '<value>')
    val ts = LogTable(spark, Files.createTempDirectory("gsql_cw_").toString,
      partitionBy = Seq("kind"))
    GraftSql.register("gsql_cw", ts)
    (0 until 3).foreach(i =>
      ts.append(Seq((i.toLong, "a"), (i + 10L, "b")).toDF("id", "kind")))
    val beforeB = ts.snapshot().files
      .filter(_.partitions.get("kind").contains("b")).map(_.path).toSet
    GraftSql.exec(spark, "CALL compact(gsql_cw, 'kind', 'a')")
    assert(ts.snapshot().files.count(_.partitions.get("kind").contains("a")) === 1)
    assert(ts.snapshot().files.filter(_.partitions.get("kind").contains("b"))
      .map(_.path).toSet === beforeB)
    assert(spark.sql("SELECT count(*) FROM gsql_c").head().getLong(0) === 30L)
    // VACUUM dry run vs real sweep over a planted aged orphan
    val orphan = java.nio.file.Paths.get(t.root, "data", "stray.parquet")
    java.nio.file.Files.createFile(orphan)
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    GraftSql.exec(spark, "CALL remove_orphans(gsql_c, 'dry_run')")
    assert(java.nio.file.Files.exists(orphan), "dry run must not delete")
    GraftSql.exec(spark, "CALL remove_orphans(gsql_c)")
    assert(!java.nio.file.Files.exists(orphan), "the real sweep must reclaim")

    GraftSql.exec(spark, "CALL rollback(gsql_c, 2)")
    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_c").head().getLong(0) === 20L)
    GraftSql.exec(spark, "CALL create_ref(gsql_c, 'keeper')")
    assert(t.refVersion("keeper") === t.currentVersion)

    // merge-on-read upsert through SQL: one matched key replaced, one
    // new key inserted — no data file rewritten
    Seq((5L, "UP5"), (25L, "NEW25")).toDF("id", "v")
      .createOrReplaceTempView("gsql_c_src")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    GraftSql.exec(spark, "CALL merge_mor(gsql_c, id, 'SELECT * FROM gsql_c_src')")
    assert(t.snapshot().operation === "mor-merge")
    assert(filesBefore.subsetOf(t.snapshot().files.map(_.path).toSet))
    assert(spark.sql("SELECT count(*) FROM gsql_c").head().getLong(0) === 21L)
    assert(GraftSql.exec(spark, "SELECT v FROM gsql_c WHERE id = 5")
      .head().getString(0) === "UP5")

    // n-D z-order through SQL (column list as one quoted argument)
    val tz = LogTable(spark, Files.createTempDirectory("gsql_z_").toString)
    GraftSql.register("gsql_z", tz)
    tz.append((0 until 100).map(i => (i.toLong % 10, i.toLong / 10, i.toLong))
      .toDF("x", "y", "id"))
    GraftSql.exec(spark, "CALL recluster_z(gsql_z, 'x, y', 2)")
    assert(tz.snapshot().operation === "recluster")
    assert(spark.sql("SELECT count(*) FROM gsql_z").head().getLong(0) === 100L)

    // NDV stats maintenance through SQL
    GraftSql.exec(spark, "CALL analyze(gsql_z)")
    assert(tz.snapshot().operation === "analyze")
    assert(tz.snapshot().ndvs("id") > 90L)
  }

  test("GraftSql CALL evolve_spec changes the layout for future writes only") {
    import spark.implicits._
    import graft.sources.{GraftSql, LogTable => LT, Transform}
    val t = LT(spark, Files.createTempDirectory("gsql_evo_").toString)
    GraftSql.register("gsql_e", t)
    GraftSql.exec(spark,
      "INSERT INTO gsql_e (ts_us, op) VALUES (1704067200000000, 'get'), (1704067200000001, 'put')")
    GraftSql.exec(spark, "CALL evolve_spec(gsql_e, 'day(ts_us), op')")
    // later statements go through the evolved handle: new files carry
    // the new layout keys, old files stay as written
    GraftSql.exec(spark,
      "INSERT INTO gsql_e (ts_us, op) VALUES (1704153600000000, 'get')")
    val re = LT(spark, t.root)
    assert(re.partitionBy === Seq("op"))
    assert(re.hiddenBy === Seq(Transform.day("ts_us")))
    val (old, fresh) = re.snapshot().files.partition(_.partitions.isEmpty)
    assert(old.nonEmpty && fresh.nonEmpty)
    assert(fresh.forall(_.partitions.contains("op")))
    assert(spark.sql("SELECT count(*) FROM gsql_e").head().getLong(0) === 3L)
    // the INSERT was written under a schema where ts_us/op were plain
    // columns — the mixed read still answers exactly
    assert(GraftSql.exec(spark,
        "SELECT op, count(*) AS n FROM gsql_e GROUP BY op ORDER BY op")
      .as[(String, Long)].collect().toSeq === Seq(("get", 2L), ("put", 1L)))
  }

  test("GraftSql ALTER TABLE renames and drops columns through the manifest") {
    import spark.implicits._
    import graft.sources.GraftSql
    val t = LogTable(spark, Files.createTempDirectory("gsql_alter_").toString)
    GraftSql.register("gsql_a", t)
    t.append((0 until 5).map(i => (i.toLong, i * 10L, s"x$i")).toDF("id", "score", "note"))
    GraftSql.exec(spark, "ALTER TABLE gsql_a RENAME COLUMN score TO points")
    // the registered view flips to the evolved schema immediately
    assert(GraftSql.exec(spark, "SELECT sum(points) FROM gsql_a").head().getLong(0) === 100L)
    GraftSql.exec(spark, "ALTER TABLE gsql_a DROP COLUMN note")
    assert(spark.table("gsql_a").columns.toSeq === Seq("id", "points"))
    // ADD COLUMN: metadata-only; old rows read NULL, new appends carry it
    GraftSql.exec(spark, "ALTER TABLE gsql_a ADD COLUMN hm INT")
    assert(spark.table("gsql_a").columns.toSeq === Seq("id", "points", "hm"))
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM gsql_a WHERE hm IS NULL").head().getLong(0) === 5L)
    t.append(Seq((100L, 1000L, 7)).toDF("id", "points", "hm"))
    assert(GraftSql.exec(spark,
      "SELECT sum(hm) FROM gsql_a").head().getLong(0) === 7L)
    // a dropped name cannot come back (old files still hold its values)
    intercept[Exception] {
      GraftSql.exec(spark, "ALTER TABLE gsql_a ADD COLUMN note STRING")
    }
  }

  test("GraftSql rejects unsupported statement shapes loudly") {
    import spark.implicits._
    import graft.sources.GraftSql
    val t = LogTable(spark, Files.createTempDirectory("gsql_rej_").toString)
    GraftSql.register("gsql_r", t)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // unregistered DML target
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "DELETE FROM not_registered WHERE id = 1") }
    // MERGE without a source alias
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "MERGE INTO gsql_r USING x ON gsql_r.id = x.id WHEN MATCHED THEN DELETE") }
    // MERGE ON with different columns
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "MERGE INTO gsql_r t USING gsql_r s ON t.id = s.other WHEN MATCHED THEN DELETE") }
    // INSERT with a SELECT body in MERGE (only * / (cols) VALUES supported)
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "MERGE INTO gsql_r t USING gsql_r s ON t.id = s.id WHEN NOT MATCHED THEN INSERT SELECT 1") }
    // MERGE SET of an unknown column fails before any scan
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "MERGE INTO gsql_r t USING gsql_r s ON t.id = s.id WHEN MATCHED THEN UPDATE SET nope = 1") }
    // MERGE cannot SET the merge key
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        "MERGE INTO gsql_r t USING gsql_r s ON t.id = s.id WHEN MATCHED THEN UPDATE SET id = 1") }
    // unknown CALL
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "CALL vacuum_everything(gsql_r)") }
  }

  test("GraftSql CREATE/DROP TABLE: the whole lifecycle in SQL with zero Scala setup") {
    import graft.sources.GraftSql
    GraftSql.setWarehouse(Files.createTempDirectory("gsql_wh_").toString)
    GraftSql.exec(spark,
      """CREATE TABLE gsql_ddl (id INT, kind STRING, v DOUBLE, ts_us BIGINT)
        |PARTITIONED BY (day(ts_us))""".stripMargin)
    // declared schema is visible BEFORE any data lands
    assert(spark.table("gsql_ddl").columns.toSeq === Seq("id", "kind", "v", "ts_us"))
    assert(spark.sql("SELECT count(*) FROM gsql_ddl").head().getLong(0) === 0L)

    GraftSql.exec(spark,
      """INSERT INTO gsql_ddl SELECT * FROM VALUES
        |  (1, 'a', 1.5D, 86400000000), (2, 'b', 2.5D, 172800000000),
        |  (3, 'a', 3.5D, 172800000001) AS t(id, kind, v, ts_us)""".stripMargin)
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM gsql_ddl WHERE kind = 'a'").head().getLong(0) === 2L)
    // hidden day(ts_us) partitioning took effect on the DDL path
    val t = GraftSql.table("gsql_ddl")
    assert(t.snapshot().files.forall(_.partitions.keys.exists(_.contains("ts_us"))))
    assert(t.snapshot().files.map(_.partitions.values.toSeq).distinct.size === 2)

    // ALTER COLUMN TYPE widens through SQL; pre-widen int files still read
    GraftSql.exec(spark, "ALTER TABLE gsql_ddl ALTER COLUMN id TYPE BIGINT")
    assert(GraftSql.exec(spark, "SELECT sum(id) FROM gsql_ddl").head().getLong(0) === 6L)

    // CREATE IF NOT EXISTS over a live table is a no-op; bare CREATE throws
    GraftSql.exec(spark, "CREATE TABLE IF NOT EXISTS gsql_ddl (x INT)")
    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_ddl").head().getLong(0) === 3L)
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "CREATE TABLE gsql_ddl (x INT)") }

    // DROP TABLE purges: root gone, name free, IF EXISTS tolerant
    val root = t.root
    GraftSql.exec(spark, "DROP TABLE gsql_ddl")
    assert(!Files.exists(java.nio.file.Paths.get(root)))
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "INSERT INTO gsql_ddl SELECT 1") }
    GraftSql.exec(spark, "DROP TABLE IF EXISTS gsql_ddl") // no-op, no throw
  }

  test("GraftSql CREATE MATERIALIZED VIEW: incremental rollup lifecycle in SQL") {
    import graft.sources.GraftSql
    val wh = Files.createTempDirectory("gsql_mv_wh_").toString
    GraftSql.setWarehouse(wh)
    GraftSql.exec(spark, "DROP TABLE IF EXISTS gsql_mv_base")
    GraftSql.exec(spark,
      "CREATE TABLE gsql_mv_base (id BIGINT, kind STRING, v DOUBLE)")
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW gsql_mv AS
        |SELECT kind, count(*) AS n, sum(v) AS total, max(v) AS hi
        |FROM gsql_mv_base GROUP BY kind""".stripMargin)

    GraftSql.exec(spark,
      """INSERT INTO gsql_mv_base SELECT * FROM VALUES
        |  (1, 'a', 1.5D), (2, 'b', 2.5D), (3, 'a', 3.5D) AS t(id, kind, v)""".stripMargin)
    GraftSql.exec(spark, "CALL refresh_mv(gsql_mv)")
    assert(GraftSql.exec(spark,
      "SELECT n, total, hi FROM gsql_mv WHERE kind = 'a'")
      .head().toSeq === Seq(2L, 5.0, 3.5))

    // second batch folds incrementally; the view joins like any table
    GraftSql.exec(spark,
      "INSERT INTO gsql_mv_base SELECT * FROM VALUES (4, 'a', 4.0D) AS t(id, kind, v)")
    GraftSql.exec(spark, "CALL refresh_mv(gsql_mv)")
    assert(GraftSql.exec(spark,
      "SELECT n, total, hi FROM gsql_mv WHERE kind = 'a'")
      .head().toSeq === Seq(3L, 9.0, 4.0))

    // row-changing base op: refresh_mv falls back to a full rebuild
    GraftSql.exec(spark, "DELETE FROM gsql_mv_base WHERE kind = 'b'")
    GraftSql.exec(spark, "CALL refresh_mv(gsql_mv)")
    assert(GraftSql.exec(spark, "SELECT count(*) FROM gsql_mv")
      .head().getLong(0) === 1L)

    // avg rides as fused sum+count state (round 10); a truly
    // unsupported aggregate still refuses loudly
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW gsql_mv2 AS
        |SELECT kind, avg(v) AS m FROM gsql_mv_base GROUP BY kind""".stripMargin)
    GraftSql.exec(spark, "CALL refresh_mv(gsql_mv2)")
    assert(GraftSql.exec(spark,
      "SELECT m FROM gsql_mv2 WHERE kind = 'a'").head().getDouble(0) === 3.0)
    GraftSql.exec(spark, "DROP MATERIALIZED VIEW gsql_mv2")
    val e = intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        """CREATE MATERIALIZED VIEW gsql_mv3 AS
          |SELECT kind, median(v) AS m FROM gsql_mv_base GROUP BY kind""".stripMargin)
    }
    assert(e.getMessage.contains("unsupported select item"))

    // DROP MATERIALIZED VIEW purges state; IF EXISTS tolerant
    val mvRoot = java.nio.file.Paths.get(wh).resolve("gsql_mv")
    assert(Files.exists(mvRoot))
    GraftSql.exec(spark, "DROP MATERIALIZED VIEW gsql_mv")
    assert(!Files.exists(mvRoot))
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "CALL refresh_mv(gsql_mv)") }
    GraftSql.exec(spark, "DROP MATERIALIZED VIEW IF EXISTS gsql_mv")
    GraftSql.exec(spark, "DROP TABLE gsql_mv_base")
  }

  test("GraftSql MERGE column-level SET / INSERT lists are byte-equal to the API") {
    import spark.implicits._
    import graft.sources.GraftSql
    val sqlT = LogTable(spark, Files.createTempDirectory("gsql_mcol_").toString)
    val apiT = LogTable(spark, Files.createTempDirectory("gsql_mcol_api_").toString)
    GraftSql.register("gsql_mc", sqlT)
    val base = (0 until 30).map(i => (i.toLong, s"k${i % 3}", i * 2.0)).toDF("id", "kind", "v")
    sqlT.append(base); apiT.append(base)
    // source carries an EXTRA column: with both clauses column-level it
    // must stay an expression input only (no schema evolution)
    ((0 until 10).map(i => (i.toLong, s"k${i % 3}", 100.0 + i, i * 10.0)) ++
      (50 until 55).map(i => (i.toLong, "new", i.toDouble, 1.0)))
      .toDF("id", "kind", "v", "extra").createOrReplaceTempView("gsql_mc_src")

    GraftSql.exec(spark,
      """MERGE INTO gsql_mc t USING gsql_mc_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v + s.extra, kind = concat(t.kind, '+')
        |WHEN NOT MATCHED THEN INSERT (id, kind) VALUES (s.id, concat('new-', s.kind))""".stripMargin)
    apiT.merge(spark.table("gsql_mc_src"), "id",
      matchedSet = Some(Map(
        "v" -> (col("src_v") + col("src_extra")),
        "kind" -> concat(col("kind"), lit("+")))),
      insertValues = Some(Map(
        "id" -> col("id"),
        "kind" -> concat(lit("new-"), col("kind")))))

    assert(collectSorted(sqlT.read()) === collectSorted(apiT.read()))
    // no schema evolution: 'extra' never became a table column, and the
    // unlisted insert column 'v' landed as a typed null
    assert(sqlT.read().columns.toSeq === Seq("id", "kind", "v"))
    assert(sqlT.read().filter(col("id") === 50L).select("v").head().isNullAt(0))
    assert(sqlT.read().filter(col("id") === 0L).select("v").head().getDouble(0) === 100.0)
    assert(sqlT.read().filter(col("kind") === "k0+").count() > 0)
  }

  test("time-travel tokens inside string literals are data, not table references") {
    import spark.implicits._
    import graft.sources.GraftSql
    val t = LogTable(spark, Files.createTempDirectory("gsql_lit_").toString)
    GraftSql.register("gsql_lit", t)
    t.append(Seq((1L, "gsql_lit@v1"), (2L, "plain")).toDF("id", "note")) // v1
    t.append(Seq((3L, "gsql_lit@v1")).toDF("id", "note"))                // v2

    // the literal must survive byte-identical or the filter matches nothing
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM gsql_lit WHERE note = 'gsql_lit@v1'")
      .head().getLong(0) === 2L)
    // a real table token and a literal twin in the SAME statement:
    // the reference rewrites, the literal does not
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM gsql_lit@v1 WHERE note = 'gsql_lit@v1'")
      .head().getLong(0) === 1L)
    // SQL '' escaping inside literals does not confuse the scanner
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM gsql_lit WHERE note = 'it''s gsql_lit@v1'")
      .head().getLong(0) === 0L)
  }

  test("SELECT COUNT(*) answers from manifest arithmetic — zero data I/O") {
    import spark.implicits._
    import graft.sources.GraftSql
    val t = LogTable(spark, Files.createTempDirectory("gsql_cnt_").toString)
    GraftSql.register("gsql_cnt", t)
    t.append((0 until 123).map(i => (i.toLong, s"v$i")).toDF("id", "v"))

    // fast path matches the scan answer, plain and aliased
    assert(GraftSql.exec(spark, "SELECT COUNT(*) FROM gsql_cnt").head().getLong(0) === 123L)
    val aliased = GraftSql.exec(spark, "SELECT count(*) AS n FROM gsql_cnt")
    assert(aliased.columns.toSeq === Seq("n") && aliased.head().getLong(0) === 123L)

    // the proof it never opens a data file: move the data pool away
    val data = java.nio.file.Paths.get(t.root).resolve("data")
    val hidden = java.nio.file.Paths.get(t.root).resolve("data_x")
    Files.move(data, hidden)
    try assert(GraftSql.exec(spark, "SELECT COUNT(*) FROM gsql_cnt")
      .head().getLong(0) === 123L)
    finally Files.move(hidden, data)

    // exact under merge-on-read deletes (manifest arithmetic subtracts)
    t.deleteMor(col("id") < 23)
    assert(GraftSql.exec(spark, "SELECT COUNT(*) FROM gsql_cnt").head().getLong(0) === 100L)
    // any other shape falls through to the real scan (ids 50..122 live)
    assert(GraftSql.exec(spark,
      "SELECT COUNT(*) FROM gsql_cnt WHERE id >= 50").head().getLong(0) === 73L)
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

  test("native expressions resolve as SQL functions (GraftExtensions)") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT parse_duration('1m30.5s') AS us")
      .head().getLong(0) === 90500000L)
    assert(spark.sql("SELECT parse_duration('junk') AS us").head().isNullAt(0))
    assert(spark.sql("SELECT long_dot(array(3L, -4L), array(3L, -4L)) AS d")
      .head().getLong(0) === 25L)
    // SQL calls build the SAME expressions as the Column API — results
    // are bit-identical by construction
    val sql = spark.sql(
      "SELECT simhash64(array('a','b','c'), 0) AS h, " +
        "minhash_sig(array('a','b','c'), 8) AS m, " +
        "word_shingles(array('a','b','c'), 2) AS s").head()
    import org.apache.spark.sql.functions.{array, lit}
    val api = spark.range(1).select(
      graft.functions.SimHash64.simhash64(array(lit("a"), lit("b"), lit("c")), 0).as("h"),
      graft.functions.MinHashSig.minhashSig(array(lit("a"), lit("b"), lit("c")), 8).as("m"),
      graft.functions.WordShingles.wordShingles(array(lit("a"), lit("b"), lit("c")), 2).as("s"))
      .head()
    assert(sql.getLong(0) === api.getLong(0))
    assert(sql.getSeq[Long](1) === api.getSeq[Long](1))
    assert(sql.getSeq[Long](2) === api.getSeq[Long](2))
    // a non-literal seed refuses loudly instead of mis-binding
    intercept[Exception] {
      spark.sql("SELECT simhash64(array('a'), CAST(rand()*10 AS INT))").collect()
    }
    // the build-time extensions class wires the same set without error
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("table-function rewrites respect identifier boundaries") {
    import graft.sources.GraftSql
    // a user routine whose name merely ENDS in a rewrite suffix
    // (forest_view ⊃ rest_view, my_iceberg_scan ⊃ iceberg_scan) must
    // NOT be rewritten — the buggy form would hijack the arguments as
    // a catalog URI and fire an HTTP GET at parse time. The correct
    // behavior is Spark's own unresolved-routine error.
    for (stmt <- Seq(
        "SELECT * FROM forest_view('a', 'b', 'c')",
        "SELECT * FROM my_iceberg_scan('/nope')",
        "SELECT * FROM xiceberg_snapshots('/nope')")) {
      val e = intercept[Exception] { GraftSql.exec(spark, stmt) }
      val msg = e.toString
      assert(msg.contains("UNRESOLV") || msg.contains("TABLE_OR_VIEW") ||
        msg.contains("Could not resolve") || msg.contains("not found"),
        s"expected Spark resolution error for untouched statement, got: $msg")
    }
    // the real function spelled at the start of the statement still
    // rewrites (the lookbehind must not require a preceding char)
    val e2 = intercept[Exception] {
      GraftSql.exec(spark, "SELECT * FROM iceberg_snapshots('/graft_no_such_table')")
    }
    assert(!e2.toString.contains("UNRESOLVED_ROUTINE"),
      s"iceberg_snapshots should still rewrite, got: ${e2.toString.take(200)}")
  }
}
