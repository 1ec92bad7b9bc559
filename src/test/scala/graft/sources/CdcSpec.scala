package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** CDC changelog reads ([[LogTable.readCdc]], Delta CDF / Iceberg
  * changelog parity): appends surface as inserts, COW and MoR
  * row-level operations as exact delete/insert pairs diffed over only
  * the files whose visibility changed, maintenance contributes
  * nothing, and the changelog replays to the table's live state. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): LogTable =
    LogTable(spark, Files.createTempDirectory("cdc_spec_").toString)

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong)).toDF("id", "k", "v")

  private def changes(df: DataFrame): Map[(String, Long), Set[Long]] =
    df.collect().map(r => (r.getAs[String]("_change_type"),
      r.getAs[Long]("_commit_version")) -> r.getAs[Long]("id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("appends emit their rows as inserts, stamped with their commit version") {
    val t = fresh()
    t.append(rows(0 until 10))
    t.append(rows(10 until 15))
    val got = changes(t.readCdc(0L))
    assert(got === Map(
      ("insert", 1L) -> (0L until 10L).toSet,
      ("insert", 2L) -> (10L until 15L).toSet))
    // a narrower window sees only its commits
    assert(changes(t.readCdc(1L)) === Map(("insert", 2L) -> (10L until 15L).toSet))
    assert(t.readCdc(2L).count() === 0L)
  }

  test("COW delete and update emit exact delete / delete+insert pairs") {
    val t = fresh()
    t.append(rows(0 until 20).repartition(2))
    t.delete($"id" < 5)
    val afterDelete = changes(t.readCdc(1L, 2L))
    assert(afterDelete === Map(("delete", 2L) -> (0L until 5L).toSet))

    t.update($"k" === "a", Map("v" -> ($"v" + 100L)))
    val upd = t.readCdc(2L, 3L)
    val updIns = upd.filter($"_change_type" === "insert")
    val updDel = upd.filter($"_change_type" === "delete")
    // surviving 'a' rows: ids 6,8,...,18
    val aIds = (6L until 20L by 2).toSet
    assert(updDel.select($"id").as[Long].collect().toSet === aIds)
    assert(updIns.select($"id").as[Long].collect().toSet === aIds)
    // old rows carry the old value, new rows the updated one
    assert(updDel.select($"v").as[Long].collect().toSet === aIds)
    assert(updIns.select($"v").as[Long].collect().toSet === aIds.map(_ + 100L))
  }

  test("MoR position deletes and their compaction fold are net-neutral after the marks") {
    val t = fresh()
    t.append(rows(0 until 30).repartition(3))
    t.deleteMor($"id" >= 25)
    assert(changes(t.readCdc(1L, 2L)) ===
      Map(("delete", 2L) -> (25L until 30L).toSet))
    // folding the marks into clean files changes NO row's visibility
    t.compact()
    assert(t.readCdc(2L, 3L).count() === 0L)
  }

  test("equality tombstones and upserts diff correctly (table-wide scope)") {
    val t = fresh()
    t.append(rows(0 until 10))
    t.deleteEq(Seq(1L, 3L).toDF("id"))
    assert(changes(t.readCdc(1L, 2L)) === Map(("delete", 2L) -> Set(1L, 3L)))
    // upsertEq: matched key's old row deleted, new rows inserted
    t.upsertEq(Seq((2L, "z", 999L), (50L, "z", 500L)).toDF("id", "k", "v"), "id")
    val up = changes(t.readCdc(2L, 3L))
    assert(up(("delete", 3L)) === Set(2L))
    assert(up(("insert", 3L)) === Set(2L, 50L))
  }

  test("merge emits net changes; maintenance and metadata commits emit nothing") {
    val t = fresh()
    t.append(rows(0 until 10).repartition(2))
    t.setSortOrder(Seq("id"))                       // metadata: silent
    t.merge(Seq((0L, "m", 0L), (100L, "m", 1L)).toDF("id", "k", "v"), "id")
    t.compact()                                     // row-preserving: silent
    val got = changes(t.readCdc(1L))
    assert(got(("delete", 3L)) === Set(0L))         // old row 0 replaced
    assert(got(("insert", 3L)) === Set(0L, 100L))   // new row 0 + insert 100
    assert(got.keys.map(_._2).toSet === Set(3L))    // v2 and v4 contributed nothing
  }

  test("the changelog replays to the live table (inserts minus deletes = current rows)") {
    val t = fresh()
    t.append(rows(0 until 40).repartition(2))
    t.delete($"id" % 7 === 0L)
    t.deleteMor($"id" % 11 === 1L)
    t.update($"k" === "b", Map("v" -> ($"v" * 2L)))
    t.append(rows(100 until 110))
    val cdc = t.readCdc(0L)
    val replayed = cdc.filter($"_change_type" === "insert")
      .select($"id", $"k", $"v")
      .exceptAll(cdc.filter($"_change_type" === "delete").select($"id", $"k", $"v"))
    val live = t.read().select($"id", $"k", $"v")
    assert(replayed.exceptAll(live).count() === 0L)
    assert(live.exceptAll(replayed).count() === 0L)
  }

  test("cdcApply replicates a keyed table downstream — deletes and updates included — and replay is idempotent") {
    import graft.streaming.Streams
    val src = fresh()
    val dst = fresh()
    src.append(rows(0 until 30).repartition(2))
    var cursor = Streams.cdcApply(src, dst, "id", 0L, src.currentVersion)
    def sortedRows(t: LogTable) =
      t.read().select($"id", $"k", $"v").orderBy($"id").collect().toSeq
    assert(sortedRows(dst) === sortedRows(src))

    // a maintenance-heavy batch of row-level changes
    src.delete($"id" % 5 === 0L)
    src.update($"k" === "b", Map("v" -> ($"v" + 1000L)))
    src.compact()
    src.append(rows(100 until 105))
    val next = src.currentVersion
    Streams.cdcApply(src, dst, "id", cursor, next)
    assert(sortedRows(dst) === sortedRows(src))

    // replaying the SAME range converges to the same state
    Streams.cdcApply(src, dst, "id", cursor, next)
    assert(sortedRows(dst) === sortedRows(src))
    cursor = next

    // a key updated across MULTIPLE commits in one range nets to its final state
    src.update($"id" === 2L, Map("v" -> lit(7L)))
    src.update($"id" === 2L, Map("v" -> lit(9L)))
    Streams.cdcApply(src, dst, "id", cursor, src.currentVersion)
    assert(dst.read().filter($"id" === 2L).select($"v").as[Long].head() === 9L)
    assert(sortedRows(dst) === sortedRows(src))
  }

  test("table_changes() exposes the changelog to SQL") {
    val wh = Files.createTempDirectory("cdc_sql_wh_").toString
    GraftSql.setWarehouse(wh)
    GraftSql.exec(spark, "DROP TABLE IF EXISTS cdc_sql_t")
    GraftSql.exec(spark, "CREATE TABLE cdc_sql_t (id BIGINT, v BIGINT)")
    GraftSql.exec(spark,
      "INSERT INTO cdc_sql_t SELECT id, id * 2 AS v FROM RANGE(10)")
    GraftSql.exec(spark, "DELETE FROM cdc_sql_t WHERE id < 3")
    val got = GraftSql.exec(spark,
      """SELECT _change_type, count(*) AS n
        |FROM table_changes(cdc_sql_t, 0)
        |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("insert" -> 10L, "delete" -> 3L))
    // bounded window: (v2, v3] holds only the delete commit's rows
    // (v1 = CREATE's declared schema, v2 = the insert, v3 = the delete)
    assert(GraftSql.exec(spark,
      "SELECT count(*) FROM table_changes(cdc_sql_t, 2, 3)")
      .head().getLong(0) === 3L)
    GraftSql.exec(spark, "DROP TABLE cdc_sql_t")
  }

  test("schema evolution conforms old commits to the target schema") {
    val t = fresh()
    t.append(Seq((1L, "a")).toDF("id", "k"))
    t.append(Seq((2L, "b", 5L)).toDF("id", "k", "extra")) // widens schema
    val cdc = t.readCdc(0L).orderBy($"_commit_version")
    assert(cdc.columns.toSeq ===
      Seq("id", "k", "extra", "_change_type", "_commit_version"))
    val r = cdc.collect()
    assert(r(0).isNullAt(r(0).fieldIndex("extra"))) // v1 row: typed null
    assert(r(1).getAs[Long]("extra") === 5L)
  }

  test("expired history: defaults clamp to the retained floor, explicit starts fail with the remedy") {
    val t = fresh()
    t.append(rows(0 until 5))   // v1
    t.append(rows(5 until 10))  // v2
    t.append(rows(10 until 15)) // v3
    t.expire(keepLast = 2)      // drops v1's manifest
    assert(t.versions === Seq(2L, 3L))

    // readCdc below the floor: a clear remedy, not a raw missing-file read
    val e = intercept[IllegalStateException](t.readCdc(0L))
    assert(e.getMessage.contains("expired"))
    assert(e.getMessage.contains("startingVersion"))
    // from the floor it still replays
    assert(changes(t.readCdc(2L)) === Map(("insert", 3L) -> (10L until 15L).toSet))

    // batch CDC source: the DEFAULT window is the retained history —
    // before the clamp this threw a missing-manifest IO error
    val df = spark.read.format("graft").option("readChanges", "true").load(t.root)
    assert(changes(df) === Map(("insert", 3L) -> (10L until 15L).toSet))
    // a pushed `_commit_version` bound keeps slicing post-expire
    assert(changes(df.filter($"_commit_version" > 2L)) ===
      Map(("insert", 3L) -> (10L until 15L).toSet))
    assert(df.filter($"_commit_version" > 3L).count() === 0L)

    // an explicit start below the floor fails loudly at planning
    val e2 = intercept[Throwable](spark.read.format("graft")
      .option("readChanges", "true").option("startingVersion", "0")
      .load(t.root).collect())
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + " | " + msgs(x.getCause)
    assert(msgs(e2).contains("expired"))
  }

  test("pushed _commit_version bounds narrow the planned window on an unexpired table") {
    val t = fresh()
    t.append(rows(0 until 5))   // v1
    t.append(rows(5 until 10))  // v2
    t.append(rows(10 until 15)) // v3
    val df = spark.read.format("graft").option("readChanges", "true").load(t.root)
    assert(changes(df.filter($"_commit_version" === 2L)) ===
      Map(("insert", 2L) -> (5L until 10L).toSet))
    assert(changes(df.filter($"_commit_version" >= 3L)) ===
      Map(("insert", 3L) -> (10L until 15L).toSet))
    assert(changes(df.filter($"_commit_version" < 2L)) ===
      Map(("insert", 1L) -> (0L until 5L).toSet))
  }

  test("write.cdc.enabled: change files carry partition columns physically; expire GCs them") {
    val root = Files.createTempDirectory("cdc_cf_").toString
    val t = LogTable(spark, root, partitionBy = Seq("k"))
    t.append(rows(0 until 12))                                   // v1
    t.setProperties(Map(LogTable.CdcEnabledProp -> "true"))      // v2
    t.update($"id" === 2L, Map("v" -> lit(777L)))                // v3: COW update
    val v3 = t.snapshot(3L)
    assert(v3.cdc.nonEmpty, "COW update must stage change files")
    assert(v3.cdc.map(_.change).toSet === Set("delete", "insert"))
    assert(v3.cdc.map(_.rows).sum === 2L)

    // batch DSv2 changelog: the update window replays from the change
    // files, including the PARTITION column (stored physically there —
    // data files get it from the hive-dir constant channel instead)
    val win = spark.read.format("graft").option("readChanges", "true")
      .option("startingVersion", "2").load(root)
      .select($"id", $"k", $"v", $"_change_type")
      .as[(Long, String, Long, String)].collect().toSeq.sorted
    assert(win === Seq((2L, "a", 2L, "delete"), (2L, "a", 777L, "insert")))
    // and readCdc agrees (same change files)
    assert(t.readCdc(2L).select($"id", $"k", $"v", $"_change_type")
      .as[(Long, String, Long, String)].collect().toSeq.sorted === win)

    // expire drops v1..v3 → their change files are GC'd from disk
    val cdcPaths = v3.cdc.map(_.path)
    cdcPaths.foreach(p => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))))
    t.append(rows(100 until 103))                                // v4
    t.expire(keepLast = 1)
    cdcPaths.foreach(p => assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(p)), s"expired change file survived: $p"))
  }

  test("write.cdc.enabled: merge change files cover delete/update/insert and NMBS clauses") {
    val t = fresh()
    t.append(rows(0 until 6).repartition(2))                      // v1
    t.setProperties(Map(LogTable.CdcEnabledProp -> "true"))       // v2
    // update 0, delete 1, insert 100; NMBS deletes every other row
    t.merge(Seq((0L, "z", 50L), (1L, "x", 0L), (100L, "n", 1L)).toDF("id", "k", "v"),
      "id",
      matchedDeleteWhen = Some($"src_k" === "x"),
      notMatchedBySourceDelete = Some($"v" >= 4L))                // v3
    val got = changes(t.readCdc(2L))
    assert(got === Map(
      ("delete", 3L) -> Set(0L, 1L, 4L, 5L),
      ("insert", 3L) -> Set(0L, 100L)))
    // the changelog replays to the live state
    val live = t.read().select($"id").as[Long].collect().toSet
    assert(live === Set(0L, 2L, 3L, 100L))
  }

  test("write.cdc.enabled: catalog SQL UPDATE/DELETE stage net change files via the row-level seam") {
    val wh = Files.createTempDirectory("cdc_cat_").toString
    spark.conf.set("spark.sql.catalog.gcdc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdc.ns")
    spark.sql("CREATE TABLE gcdc.ns.t (id BIGINT, k STRING, v BIGINT)")
    (0 until 8).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("id", "k", "v").createOrReplaceTempView("cdc_cat_src")
    spark.sql("INSERT INTO gcdc.ns.t SELECT * FROM cdc_cat_src")
    val t = LogTable(spark, s"$wh/ns/t")
    t.setProperties(Map(LogTable.CdcEnabledProp -> "true"))
    val v0 = t.currentVersion                                   // pre-DML
    spark.sql("UPDATE gcdc.ns.t SET v = v + 100 WHERE id = 3")  // v0+1
    spark.sql("DELETE FROM gcdc.ns.t WHERE id = 0 OR id = 2")   // v0+2 (row-level: id is not a partition)
    val vu = v0 + 1; val vd = v0 + 2

    val su = t.snapshot(vu)
    assert(su.cdc.nonEmpty, s"catalog UPDATE must stage change files (op=${su.operation})")
    assert(changes(t.readCdc(v0, vu)) === Map(
      ("delete", vu) -> Set(3L), ("insert", vu) -> Set(3L)))
    assert(t.readCdc(v0, vu).filter($"_change_type" === "insert")
      .select($"v").as[Long].head() === 103L)
    assert(changes(t.readCdc(vu, vd)) === Map(("delete", vd) -> Set(0L, 2L)))

    // the streaming source replays the same change files
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChanges", "true").option("startingVersion", v0.toString)
      .load(s"$wh/ns/t")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_cat_cp_").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("id", "_change_type", "_commit_version")
          .as[(Long, String, Long)].collect().foreach(rows.add)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rows.asScala.toSeq.sorted === Seq(
      (0L, "delete", vd), (2L, "delete", vd),
      (3L, "delete", vu), (3L, "insert", vu)))
  }

  test("write.cdc.enabled: eq-delete and eq-upsert replay through change files (the last refusal class)") {
    val t = fresh()
    t.append(rows(0 until 10).repartition(2))                     // v1
    t.setProperties(Map(LogTable.CdcEnabledProp -> "true"))       // v2
    t.deleteEq(Seq(1L, 3L).toDF("id"))                            // v3
    t.upsertEq(Seq((2L, "z", 999L), (50L, "z", 500L)).toDF("id", "k", "v"),
      "id")                                                       // v4
    assert(t.snapshot(3L).cdc.map(_.change).toSet === Set("delete"))
    assert(t.snapshot(3L).cdc.map(_.rows).sum === 2L)
    assert(t.snapshot(4L).cdc.map(_.change).toSet === Set("delete", "insert"))

    // batch: identical to the diff-based answers on a CDC-less table
    assert(changes(t.readCdc(2L, 3L)) === Map(("delete", 3L) -> Set(1L, 3L)))
    val up = changes(t.readCdc(3L, 4L))
    assert(up(("delete", 4L)) === Set(2L))
    assert(up(("insert", 4L)) === Set(2L, 50L))
    assert(t.readCdc(3L, 4L).filter($"_change_type" === "insert" && $"id" === 2L)
      .select($"v").as[Long].head() === 999L)

    // streaming: the eq commits REPLAY now instead of refusing
    val rowsQ = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream.format("graft")
      .option("readChanges", "true").option("startingVersion", "2")
      .load(t.root)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_eq_cp_").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("id", "_change_type", "_commit_version")
          .as[(Long, String, Long)].collect().foreach(rowsQ.add)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rowsQ.asScala.toSeq.sorted === Seq(
      (1L, "delete", 3L), (2L, "delete", 4L), (2L, "insert", 4L),
      (3L, "delete", 3L), (50L, "insert", 4L)))

    // an already-tombstoned key never re-announces: deleting id=1 again
    // finds no visible pre-image → empty change set
    t.deleteEq(Seq(1L).toDF("id"))                                // v5
    assert(t.readCdc(4L, 5L).count() === 0L)
  }
}
