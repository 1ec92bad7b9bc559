package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Equality deletes (Iceberg v2's second delete form —
  * [[LogTable.deleteEq]] / [[LogTable.upsertEq]]): tombstone rows BY
  * KEY with zero table I/O — the CDC shape. Reads anti-join the key
  * files under the data-sequence guard (rows appended after a delete
  * survive it), compact folds the marks, metadata-only aggregates
  * refuse rather than guess while marks are outstanding. */
class EqDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): LogTable =
    LogTable(spark, Files.createTempDirectory("eq_spec_").toString)

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("deleteEq tombstones by key with ZERO table I/O; the sequence guard protects later appends") {
    val t = freshTable()
    t.append(df(0 until 100))
    val preFiles = t.snapshot().files.map(_.path).toSet

    // hide the data pool: the delete must not open a single data file
    val keys = Seq(3L, 7L, 120L).toDF("id") // 120 matches nothing — fine
    val data = Paths.get(t.root).resolve("data")
    val hidden = Paths.get(t.root).resolve("data_hidden")
    Files.move(data, hidden, StandardCopyOption.ATOMIC_MOVE)
    val s = try t.deleteEq(keys)
    finally Files.move(hidden, data, StandardCopyOption.ATOMIC_MOVE)
    assert(s.operation === "eq-delete")
    assert(s.files.map(_.path).toSet === preFiles, "no data file touched")
    assert(s.eqDeletes.size === 1 && s.eqDeletes.head.rows === 3L)

    assert(t.read().count() === 98L)
    assert(t.read().filter(col("id").isin(3L, 7L)).count() === 0L)

    // rows appended AFTER the delete carry a larger data sequence —
    // the old tombstone does not touch them
    t.append(Seq((3L, "reborn")).toDF("id", "s"))
    assert(t.read().filter(col("id") === 3L).select("s").head().getString(0)
      === "reborn")
    assert(t.read().count() === 99L)

    // metadata aggregates refuse rather than guess; the scan answers
    intercept[IllegalStateException](t.countMeta())
    assert(t.minMaxMeta("id") === None)

    // compact folds the tombstones and GCs the delete file
    val post = t.compact()
    assert(post.eqDeletes.isEmpty)
    assert(t.read().count() === 99L)
    assert(t.countMeta() === 99L)
    assert(t.read().filter(col("id") === 3L).select("s").head().getString(0)
      === "reborn")
  }

  test("upsertEq: tombstone + append in one atomic commit equals the COW merge") {
    val t = freshTable()
    t.append(df(0 until 100).repartition(4))
    val preFiles = t.snapshot().files.map(_.path).toSet

    val src = (50 until 150).map(i => (i.toLong, s"NEW$i")).toDF("id", "s")
    val s = t.upsertEq(src, "id")
    assert(s.operation === "eq-upsert")
    assert(preFiles.subsetOf(s.files.map(_.path).toSet), "no file rewritten")
    assert(s.eqDeletes.size === 1 && s.eqDeletes.head.rows === 100L)

    val cow = freshTable()
    cow.append(df(0 until 100))
    cow.merge(src, "id")
    assert(t.read().orderBy("id").collect().map(_.toSeq).toSeq ===
      cow.read().orderBy("id").collect().map(_.toSeq).toSeq)
    assert(t.read().select("id").distinct().count() === 150L)

    // a second upsert layers on top; the latest write wins
    t.upsertEq(Seq((60L, "X60"), (200L, "X200")).toDF("id", "s"), "id")
    assert(t.read().filter(col("id") === 60L).select("s").head().getString(0)
      === "X60")
    assert(t.read().count() === 151L)

    // duplicate source keys refused loudly
    val e = intercept[IllegalArgumentException](t.upsertEq(src.union(src), "id"))
    assert(e.getMessage.contains("duplicate keys"))

    // compact folds both layers; the result is unchanged
    t.compact()
    assert(t.snapshot().eqDeletes.isEmpty)
    assert(t.read().count() === 151L)
    assert(t.read().filter(col("id") === 60L).select("s").head().getString(0)
      === "X60")
  }

  test("multi-column keys, and composition with position deletes and COW paths") {
    val t = freshTable()
    t.append((0 until 40).map(i => (i.toLong, (i % 4).toLong, s"v$i"))
      .toDF("id", "grp", "s"))

    // multi-column equality delete: (grp, s) tuples
    t.deleteEq(Seq((0L, "v0"), (1L, "v5")).toDF("grp", "s"))
    assert(t.read().count() === 38L)

    // position deletes compose with outstanding equality deletes
    t.deleteMor(col("id") === 10L)
    assert(t.read().count() === 37L)

    // COW update sees the post-delete rows and never resurrects:
    // rewritten files take a NEW sequence, so older eq tombstones
    // no longer apply to them (their marks were folded by the rewrite)
    t.update(col("id") === 11L, Map("s" -> org.apache.spark.sql.functions.lit("UPD")))
    assert(t.read().count() === 37L)
    assert(t.read().filter(col("s") === "UPD").count() === 1L)
    assert(t.read().filter(col("s").isin("v0", "v5")).count() === 0L)

    // time travel before the deletes still sees everything
    assert(t.timeTravel(1L).count() === 40L)
  }

  test("the DSv2 batch source applies equality deletes executor-side, sequence guard intact") {
    val t = freshTable()
    t.append(df(0 until 10))
    t.deleteEq(Seq(1L).toDF("id"))
    // the scan loads the key tombstones per partition and filters —
    // note count(*) prunes the key column away, so the reader must
    // widen its physical schema to evaluate the key
    assert(spark.read.format("graft").load(t.root).count() === 9L)
    assert(spark.read.format("graft").load(t.root)
      .orderBy("id").collect().map(_.toSeq).toSeq ===
      t.read().orderBy("id").collect().map(_.toSeq).toSeq)
    // rows appended AFTER the tombstone survive it (planning-time
    // sequence guard)
    t.append(Seq((1L, "reborn")).toDF("id", "s"))
    assert(spark.read.format("graft").load(t.root)
      .where(col("id") === 1L).select("s").head().getString(0) === "reborn")
    assert(spark.read.format("graft").load(t.root).count() === 10L)
    // the SQL COUNT fast path falls back to the real scan — correct
    GraftSql.register("eq_sql_t", t)
    assert(GraftSql.exec(spark, "SELECT count(*) FROM eq_sql_t")
      .head().getLong(0) === 10L)
    // SQL CALL routes: equality upsert through the statement surface
    Seq((5L, "UP5")).toDF("id", "s").createOrReplaceTempView("eq_sql_src")
    GraftSql.exec(spark, "CALL upsert_eq(eq_sql_t, id, 'SELECT * FROM eq_sql_src')")
    assert(t.snapshot().operation === "eq-upsert")
    assert(GraftSql.exec(spark, "SELECT s FROM eq_sql_t WHERE id = 5")
      .head().getString(0) === "UP5")
    // the debt gauge shows the equality tombstones and their burden
    val gauge = GraftSql.exec(spark,
      "SELECT kind, marks, n_ref_files FROM eq_sql_t_deletes WHERE kind = 'equality'")
      .collect()
    assert(gauge.nonEmpty && gauge.forall(_.getLong(2) > 0L))
    // after compact everything folds; the metadata fast path returns
    t.compact()
    assert(t.snapshot().eqDeletes.isEmpty)
    assert(spark.read.format("graft").load(t.root).count() === 10L)
  }

  test("sequence numbers are table-global across branch lineages") {
    // A branch re-bases its manifest lineage at v1 while carrying
    // main-stamped files and tombstones. Version-local stamping would
    // (a) give branch appends seqs BELOW a carried tombstone — the
    // tombstone silently eats the new rows — and (b) stamp a
    // branch-issued deleteEq below most carried files, so it applies
    // to almost nothing. Global monotonic stamping fixes both.
    val t = freshTable()
    t.append(df(0 until 4))                  // seq 1
    t.append(Seq((10L, "b")).toDF("id", "s")) // seq 2
    t.append(Seq((20L, "c")).toDF("id", "s")) // seq 3
    t.deleteEq(Seq(10L).toDF("id"))          // tombstone at seq 4

    // (a) append on the branch: rows with the tombstoned key must
    // SURVIVE — they are newer than the carried tombstone
    val b = t.createBranch("wap")
    b.append(Seq((10L, "reborn")).toDF("id", "s"))
    assert(b.read().filter(col("id") === 10L).count() === 1L,
      "branch-appended row eaten by a carried main tombstone")
    assert(b.read().count() === 6L) // ids 0..3, reborn 10, 20

    // (b) deleteEq issued ON the branch must outrank EVERY carried
    // file, including the newest (seq 3) one
    val s = b.deleteEq(Seq(20L).toDF("id"))
    assert(s.eqDeletes.exists(_.seq > 4L), "branch tombstone GC'd or under-stamped")
    assert(b.read().filter(col("id") === 20L).count() === 0L,
      "branch tombstone skipped a carried data file")

    // publish: main adopts the branch seqs and stays monotonic
    t.fastForward("wap")
    assert(t.read().filter(col("id") === 10L).head().getString(1) === "reborn")
    assert(t.read().filter(col("id") === 20L).count() === 0L)
    t.append(Seq((30L, "d")).toDF("id", "s"))
    assert(t.read().filter(col("id") === 30L).count() === 1L,
      "post-publish append under-stamped vs published tombstones")
    // main on an unbranched lineage still equals the old version stamp
    assert(t.snapshot().files.map(_.seq).max > s.eqDeletes.map(_.seq).max)
  }

  test("expire reclaims equality-delete files of dropped snapshots") {
    val t = freshTable()
    t.append(df(0 until 5).coalesce(1))
    t.append(df(5 until 10).coalesce(1))
    t.deleteEq(Seq(2L).toDF("id"))
    val delPath = t.snapshot().eqDeletes.head.path
    val post = t.compact(smallBytes = 1L << 20) // real rewrite: folds + GCs
    assert(post.eqDeletes.isEmpty)
    assert(Files.exists(Paths.get(delPath)), "old snapshot still pins it")
    t.expire(keepLast = 1)
    assert(!Files.exists(Paths.get(delPath)), "expire reclaims the key file")
    assert(t.read().count() === 9L)
  }

  test("equality deletes keyed on a PARTITION column apply in the DSv2 path") {
    // hive-layout files do not store partition columns — the key
    // projection must bind the file's partition VALUE, or every row
    // of the partition silently escapes its tombstone (regression:
    // the DSv2 reader read null keys here while the API read, which
    // projects partition literals before the anti-join, was correct)
    val root = Files.createTempDirectory("eq_part_").toString
    val t = LogTable(spark, root, partitionBy = Seq("kind"))
    t.append((0 until 10).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "kind"))
    t.deleteEq(Seq("a").toDF("kind"))
    assert(t.read().count() === 5L)
    val dsv2 = spark.read.format("graft").load(root)
    assert(dsv2.count() === 5L)
    assert(dsv2.select("kind").distinct().collect().map(_.getString(0)).toSeq === Seq("b"))
    // mixed keys: one partition-column key + one data-column key
    t.deleteEq(Seq((1L, "b")).toDF("id", "kind"))
    assert(spark.read.format("graft").load(root).count() === 4L)
  }

  test("a bulk deleteEq shards its tombstone files; CDC-sized batches stay one file") {
    val t = freshTable()
    t.append(df(0 until 2000))
    // bulk: with the shard span lowered, 1200 keys must split across
    // multiple tombstone files written in parallel (no coalesce(1)
    // funnel), and the delete stays exact across every shard
    spark.conf.set("graft.eq.shard.keys", "500")
    try {
      val s = t.deleteEq((0 until 1200).map(_.toLong).toDF("id"))
      val eqs = s.eqDeletes
      assert(eqs.size > 1, s"expected sharded tombstones, got ${eqs.size}")
      assert(eqs.map(_.rows).sum === 1200L, "every key lands in exactly one shard")
      assert(eqs.map(_.seq).distinct.size === 1 && eqs.head.seq > 0L,
        "all shards share one commit's seq stamp")
      assert(t.read().count() === 800L)
      // a later append with recycled keys survives (seq guard per shard)
      t.append(df(0 until 10))
      assert(t.read().count() === 810L)
    } finally spark.conf.unset("graft.eq.shard.keys")
  }
}
