package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{And, EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNull, LessThan, Not}

import java.nio.file.{Files, Paths}

/** Iceberg-style METADATA DELETE: a condition that strictly selects
  * whole files (by identity partition values) applies as a
  * manifest-only commit — no data file read or written. The dangerous
  * direction is a wrong strict-TRUE (silently deleting surviving
  * rows), so every undecidable verdict must refuse to the COW path. */
class MetadataDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def dataFilesOnDisk(root: String): Int =
    java.nio.file.Files.list(Paths.get(root).resolve("data")).count().toInt

  private def freshPartitioned(): (LogTable, String) = {
    val root = Files.createTempDirectory("md_del_").toString
    val t = LogTable(spark, root, partitionBy = Seq("kind"))
    t.append(Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "kind"))
    (t, root)
  }

  test("partition-equality delete drops whole files with zero data I/O") {
    val (t, root) = freshPartitioned()
    val before = t.snapshot()
    val nOnDisk = dataFilesOnDisk(root)

    assert(t.deleteMetadataOnly(Seq(EqualTo("kind", "a"))))

    val after = t.snapshot()
    assert(after.version === before.version + 1)
    assert(after.operation === "delete")
    // manifest-only: files after ⊂ files before; nothing new written
    val beforePaths = before.files.map(_.path).toSet
    assert(after.files.forall(f => beforePaths.contains(f.path)))
    assert(dataFilesOnDisk(root) === nOnDisk, "metadata delete wrote or removed data files")
    assert(after.summary("added-data-files") === "0")
    // rows exact
    assert(t.read().select("id").as[Long].collect().sorted === Array(3L, 4L, 5L))
    // history intact: the dropped partition still time-travels
    assert(t.timeTravel(before.version).count() === 5L)
  }

  test("In / range / IsNull decide strictly on partition values") {
    val (t, _) = freshPartitioned()
    assert(t.deleteMetadataOnly(Seq(In("kind", Array[Any]("a", "c")))))
    assert(t.read().select("kind").distinct().as[String].collect() === Array("b"))
    // range on a numeric partition column
    val t2 = LogTable(spark, Files.createTempDirectory("md_del2_").toString,
      partitionBy = Seq("day"))
    t2.append(Seq((1L, 10L), (2L, 11L), (3L, 12L)).toDF("id", "day"))
    assert(t2.deleteMetadataOnly(Seq(LessThan("day", 12L))))
    assert(t2.read().select("id").as[Long].collect() === Array(3L))
    // IsNull strictly fails on non-null partitions: provable no-op
    val v = t2.currentVersion
    assert(t2.deleteMetadataOnly(Seq(IsNull("day"))))
    assert(t2.currentVersion === v, "a provably-zero-row delete must not commit")
  }

  test("undecidable verdicts refuse: non-partition columns fall back to COW") {
    val (t, _) = freshPartitioned()
    val before = t.currentVersion
    // id is not a partition column: no strict verdict possible
    assert(!t.deleteMetadataOnly(Seq(EqualTo("id", 1L))))
    // conjunction with an undecidable arm is undecidable (the
    // partition arm alone must NOT drop the whole partition)
    assert(!t.deleteMetadataOnly(Seq(And(EqualTo("kind", "a"), EqualTo("id", 1L)))))
    assert(!t.deleteMetadataOnly(Seq(EqualTo("kind", "a"), GreaterThanOrEqual("id", 0L))))
    assert(t.currentVersion === before)
    assert(t.read().count() === 5L)
  }

  test("dropPartitions: readWhere-shaped metadata drop; stale-spec guard refuses loudly") {
    val (t, root) = freshPartitioned()
    val nOnDisk = dataFilesOnDisk(root)
    t.dropPartitions(p => p("kind") == "b")
    assert(t.read().select("kind").distinct().as[String].collect().sorted === Array("a", "c"))
    assert(dataFilesOnDisk(root) === nOnDisk)

    // a table with pre-evolution files refuses (pred can't see them)
    val root2 = Files.createTempDirectory("md_del3_").toString
    val t2 = LogTable(spark, root2)
    t2.append(Seq((1L, "x")).toDF("id", "kind"))
    t2.evolveSpec(partitionBy = Seq("kind"))
    LogTable(spark, root2).append(Seq((2L, "y")).toDF("id", "kind"))
    val e = intercept[IllegalArgumentException] {
      LogTable(spark, root2).dropPartitions(p => p("kind") == "x")
    }
    assert(e.getMessage.contains("predate the current partition spec"))
  }

  test("day-boundary retention on a HIDDEN day partition is metadata-only; mid-day is not") {
    val day = 86400000000L
    val root = Files.createTempDirectory("md_del_day_").toString
    val t = LogTable(spark, root, hiddenBy = Seq(Transform.day("ts_us")))
    t.append((0 until 3).flatMap(d =>
      Seq((d * day + 1L, s"d$d"), (d * day + day / 2, s"d$d"))).toDF("ts_us", "op"))
    val nOnDisk = dataFilesOnDisk(root)

    // the canonical retention statement: drop everything before day 1
    assert(t.deleteMetadataOnly(Seq(LessThan("ts_us", day))))
    assert(t.read().count() === 4L)
    assert(dataFilesOnDisk(root) === nOnDisk)
    assert(t.snapshot().summary("added-data-files") === "0")

    // a cut that splits a day has a boundary file: refuse to COW
    assert(!t.deleteMetadataOnly(Seq(LessThan("ts_us", day + 5L))))
    assert(t.read().count() === 4L)

    // >= at a boundary decides too (tail retention)
    assert(t.deleteMetadataOnly(Seq(GreaterThanOrEqual("ts_us", 2 * day))))
    assert(t.read().select("op").distinct().as[String].collect() === Array("d1"))
  }

  test("year-boundary retention on a HIDDEN year partition is metadata-only (exact calendar intervals)") {
    val day = 86400000000L
    def us(date: String): Long =
      java.time.LocalDate.parse(date).toEpochDay * day
    val root = Files.createTempDirectory("md_del_year_").toString
    val t = LogTable(spark, root, hiddenBy = Seq(Transform.year("ts_us")))
    t.append(Seq("2021-03-01", "2021-11-30", "2022-06-15", "2023-01-01",
      "2023-12-31").zipWithIndex.map { case (d, i) => (us(d) + i, s"r$i") }
      .toDF("ts_us", "op"))
    val nOnDisk = dataFilesOnDisk(root)

    // the long-retention statement: drop everything before 2022 —
    // monoBounds' calendar interval decides strictly at the boundary
    assert(t.deleteMetadataOnly(Seq(LessThan("ts_us", us("2022-01-01")))))
    assert(t.read().count() === 3L)
    assert(dataFilesOnDisk(root) === nOnDisk)
    assert(t.snapshot().summary("added-data-files") === "0")

    // a cut inside a year has a boundary file: refuse to COW
    assert(!t.deleteMetadataOnly(Seq(LessThan("ts_us", us("2022-07-01")))))
    assert(t.read().count() === 3L)

    // leap years: Feb 29 belongs to its month's exact interval — a
    // MONTH layout decides a month-boundary cut strictly
    val rootM = Files.createTempDirectory("md_del_month_").toString
    val tm = LogTable(spark, rootM, hiddenBy = Seq(Transform.month("ts_us")))
    tm.append(Seq(us("2024-02-29") + 42L, us("2024-03-01"))
      .zipWithIndex.map { case (v, i) => (v, s"m$i") }.toDF("ts_us", "op"))
    assert(tm.deleteMetadataOnly(Seq(LessThan("ts_us", us("2024-03-01")))))
    assert(tm.read().count() === 1L)
  }

  test("the ladder is automatic: Scala delete(), deleteMor() and GraftSql all go metadata-first") {
    // count Spark JOBS per operation — a metadata delete plans and
    // commits without a single job; any row-level path must scan
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def jobsDuring(body: => Unit): Int = {
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
      jobs.set(0)
      body
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark)
      jobs.get()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (t, root) = freshPartitioned()
      val nOnDisk = dataFilesOnDisk(root)
      assert(jobsDuring(t.delete(col("kind") === "a")) === 0,
        "delete() on a partition predicate must run zero jobs")
      assert(t.read().count() === 3L)
      assert(dataFilesOnDisk(root) === nOnDisk)
      assert(t.snapshot().summary("added-data-files") === "0")

      // deleteMor on a whole partition: file drop beats marking — no
      // delete file written, no marking scan run
      assert(jobsDuring(t.deleteMor(col("kind") === "b")) === 0,
        "deleteMor() on a partition predicate must run zero jobs")
      assert(t.read().select("kind").distinct().as[String].collect() === Array("c"))
      assert(t.snapshot().deletes.isEmpty, "no position-delete file for a strict drop")

      // a row-level predicate really does scan — the counter works
      assert(jobsDuring(t.delete(col("id") === 5L)) > 0)

      // GraftSql DELETE (the non-catalog SQL surface) rides the same rung
      val (t2, root2) = freshPartitioned()
      GraftSql.register("md_sql_t", t2)
      assert(jobsDuring(GraftSql.exec(spark, "DELETE FROM md_sql_t WHERE kind = 'a'")) === 0,
        "GraftSql DELETE must ladder to metadata")
      assert(t2.read().count() === 3L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("catalog SQL DELETE takes the metadata path for partition predicates") {
    val wh = Files.createTempDirectory("md_del_cat_").toString
    spark.conf.set("spark.sql.catalog.gmd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmd.ns")
    spark.sql("CREATE TABLE gmd.ns.t (id BIGINT, kind STRING) PARTITIONED BY (kind)")
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("id", "kind")
      .createOrReplaceTempView("md_src")
    spark.sql("INSERT INTO gmd.ns.t SELECT * FROM md_src")

    val root = s"$wh/ns/t"
    val t = LogTable(spark, root)
    val nOnDisk = dataFilesOnDisk(root)
    val before = t.currentVersion

    spark.sql("DELETE FROM gmd.ns.t WHERE kind = 'a'")
    assert(spark.sql("SELECT id FROM gmd.ns.t ORDER BY id").as[Long].collect()
      === Array(3L, 4L))
    val after = LogTable(spark, root)
    assert(after.currentVersion === before + 1)
    assert(dataFilesOnDisk(root) === nOnDisk,
      "partition-scoped SQL DELETE must not rewrite data files")
    assert(after.snapshot().summary("added-data-files") === "0")

    // a row-level predicate still works — through the rewrite path
    spark.sql("DELETE FROM gmd.ns.t WHERE id = 3")
    assert(spark.sql("SELECT id FROM gmd.ns.t").as[Long].collect() === Array(4L))
  }

  test("strictMatch: NOT over a null partition is undecidable, never strict-true") {
    val nullDir = "__HIVE_DEFAULT_PARTITION__"
    val nullFile = DataFile("f0", 2, 10, partitions = Map("kind" -> nullDir))
    val aFile = DataFile("f1", 2, 10, partitions = Map("kind" -> "a"))
    val bFile = DataFile("f2", 2, 10, partitions = Map("kind" -> "b"))
    // SQL three-valued logic: a NULL row fails BOTH `kind = 'a'` and
    // `NOT (kind = 'a')` — the affirmative inversion must not fire
    assert(GraftPrune.strictMatch(nullFile, Nil, Not(EqualTo("kind", "a"))) === None)
    // null-free files still decide NOT both ways
    assert(GraftPrune.strictMatch(bFile, Nil, Not(EqualTo("kind", "a"))) === Some(true))
    assert(GraftPrune.strictMatch(aFile, Nil, Not(EqualTo("kind", "a"))) === Some(false))
    // NOT IN takes the same rule through In
    assert(GraftPrune.strictMatch(nullFile, Nil,
      Not(In("kind", Array[Any]("a", "b")))) === None)
    assert(GraftPrune.strictMatch(bFile, Nil,
      Not(In("kind", Array[Any]("a", "c")))) === Some(true))
  }

  test("DELETE WHERE kind <> 'a' on a table with a null partition keeps NULL rows") {
    val root = Files.createTempDirectory("md_del_null_").toString
    val t = LogTable(spark, root, partitionBy = Seq("kind"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "kind"))
    // strict refusal first: the all-null file has no two-valued verdict
    assert(!t.deleteMetadataOnly(Seq(Not(EqualTo("kind", "a")))))
    // the full delete surface falls back to COW — NULL <> 'a' is NULL,
    // not TRUE, so the null row must survive
    t.delete(col("kind") =!= "a")
    assert(t.read().select("id").as[Long].collect().sorted === Array(1L, 3L))

    // without nulls the NOT still strictly decides and rides metadata
    val root2 = Files.createTempDirectory("md_del_null2_").toString
    val t2 = LogTable(spark, root2, partitionBy = Seq("kind"))
    t2.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "kind"))
    assert(t2.deleteMetadataOnly(Seq(Not(EqualTo("kind", "a")))))
    assert(t2.read().select("kind").as[String].collect() === Array("a"))
  }

  test("strict string ranges use UTF-8 code-point order, not UTF-16") {
    val emoji = "\uD83D\uDE00" // U+1F600, a supplementary character
    val f = DataFile("f", 1, 10, partitions = Map("kind" -> emoji))
    // Java String order (UTF-16 code units) says emoji < U+FFFD; Spark
    // compares UTF8String bytes (code points), which says the opposite —
    // a strict verdict must side with the engine or a metadata delete
    // affirms the wrong files
    assert("\uD83D\uDE00" < "\uFFFD", "sanity: JVM order disagrees")
    assert(GraftPrune.strictMatch(f, Nil, GreaterThan("kind", "\uFFFD")) === Some(true))
    assert(GraftPrune.strictMatch(f, Nil, LessThan("kind", "\uFFFD")) === Some(false))
  }
}
