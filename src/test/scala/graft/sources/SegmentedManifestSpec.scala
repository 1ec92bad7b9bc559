package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** Two-level manifests: above the segment cap a snapshot's file list
  * lives in immutable shared `seg-*.json` pool files referenced BY
  * NAME, so a commit re-lists unchanged segments instead of
  * re-serializing the whole table — O(changed files), not O(table).
  * These tests pin the sharing algebra (reuse, rewrite-on-change,
  * dissolve-small), branch O(1) forking, and segment GC. */
class SegmentedManifestSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def withCap[T](n: Int)(body: => T): T = {
    spark.conf.set("graft.manifest.segment.files", n.toString)
    try body finally spark.conf.unset("graft.manifest.segment.files")
  }

  private def freshTable(): (Path, LogTable) = {
    val root = Files.createTempDirectory("graft-seg-").resolve("t")
    (root, LogTable(spark, root.toString))
  }

  /** (segment names, inline file count) of a committed manifest. */
  private def manifestShape(root: Path, version: Long): (Seq[String], Int) = {
    val p = root.resolve("_graft_log").resolve(f"v$version%05d.manifest.json")
    val n = mapper.readTree(Files.readString(p))
    val segs = Option(n.get("segments"))
      .map(_.elements().asScala.map(e =>
        if (e.isObject) e.get("name").asText() else e.asText()).toSeq)
      .getOrElse(Nil)
    (segs, n.get("files").size())
  }

  private def segFiles(root: Path): Set[String] = {
    val d = root.resolve("_graft_log")
    Files.list(d).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("seg-")).toSet
  }

  private def append(t: LogTable, ids: Range): Unit =
    // one data file per id (repartition by unique key) to control
    // exact manifest file counts
    ids.foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))

  test("tables at or under the cap stay inline; crossing it segments the list") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 4)
      assert(manifestShape(root, t.currentVersion) === ((Nil, 4)))
      append(t, 5 to 5) // 5 files > cap
      val (segs, inline) = manifestShape(root, t.currentVersion)
      assert(segs.nonEmpty && inline === 0, "above cap everything segments")
      assert(t.read().count() === 5L)
    }
  }

  test("an append reuses every frozen segment by name and only packs the tail") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 9) // 9 files: segments of 4+4+1 (last under cap/8=1? minKeep=1 keeps all)
      val (segsBefore, _) = manifestShape(root, t.currentVersion)
      assert(segsBefore.size >= 2)
      append(t, 10 to 10)
      val (segsAfter, inline) = manifestShape(root, t.currentVersion)
      assert(inline === 0)
      // every full (size-4) segment from the previous version is
      // re-listed verbatim; only the tail repacked
      val full = segsBefore.take(2)
      assert(full.forall(segsAfter.contains),
        s"frozen segments must be reused: $full vs $segsAfter")
      assert(t.read().count() === 10L)
    }
  }

  test("a COW delete rewrites only the segment holding the hit; others reuse") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 4) // four single-row files, inline
      // one 4-file append crosses the cap: segments pack [first four | new four]
      t.append((5 to 104).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartition(4))
      val (before, _) = manifestShape(root, t.currentVersion)
      assert(before.size === 2)
      import org.apache.spark.sql.functions.col
      t.delete(col("id") === 1L) // hits a file in the FIRST segment only
      val (after, _) = manifestShape(root, t.currentVersion)
      // the untouched segment survives by name; the hit one repacks
      assert(after.intersect(before).size === 1)
      assert(t.read().count() === 103L)
    }
  }

  test("time travel and readers resolve segmented manifests transparently") {
    withCap(4) {
      val (_, t) = freshTable()
      append(t, 1 to 6)
      val v6 = t.currentVersion
      append(t, 7 to 9)
      assert(t.timeTravel(v6).count() === 6L)
      assert(t.read().count() === 9L)
      assert(t.snapshot().totalRows === 9L)
    }
  }

  test("branch creation re-lists main's segments: O(1), zero new pool files") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 8)
      val poolBefore = segFiles(root)
      val b = t.createBranch("wap")
      assert(segFiles(root) === poolBefore, "branching must write no segments")
      assert(b.read().count() === 8L)
      // a branch append writes ITS segments into the shared pool and
      // fast-forward re-lists them on main without re-serializing —
      // a 2-file batch, so the new segment is at minKeep and freezes
      // (a single-file tail would rightly dissolve at publish)
      b.append((9 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartition(2))
      val branchHead = segFiles(root) -- poolBefore
      t.fastForward("wap")
      assert(t.read().count() === 10L)
      val (mainSegs, _) = manifestShape(root, t.currentVersion)
      assert(branchHead.subsetOf(mainSegs.toSet ++ poolBefore),
        "publish must reuse branch-written segments, not re-pack them")
    }
  }

  test("expire reclaims segments referenced only by dropped snapshots") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 8)
      import org.apache.spark.sql.functions.col
      t.delete(col("id") <= 4L) // drops segment 1's files, rewrites
      val liveSegs = manifestShape(root, t.currentVersion)._1.toSet
      assert(segFiles(root).size > liveSegs.size,
        "history still references the pre-delete segment")
      t.expire(keepLast = 1)
      assert(segFiles(root) === liveSegs,
        "only the kept snapshot's segments may remain")
      assert(t.read().count() === 4L)
    }
  }

  test("removeOrphans sweeps stray pool files from crashed commits, age-guarded") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 5)
      val stray = root.resolve("_graft_log").resolve("seg-deadbeef.json")
      Files.writeString(stray, """{"files":[]}""")
      t.removeOrphans(olderThanMs = 0L) // nothing old enough
      assert(Files.exists(stray))
      t.removeOrphans(olderThanMs = System.currentTimeMillis() + 60000)
      assert(!Files.exists(stray), "unreferenced aged segment must go")
      assert(manifestShape(root, t.currentVersion)._1
        .forall(segFiles(root).contains), "live segments stay")
      assert(t.read().count() === 5L)
    }
  }

  test("full lifecycle stays correct under aggressive segmentation (cap=2)") {
    withCap(2) {
      val (_, t) = freshTable()
      append(t, 1 to 6)
      // MoR position delete: files unchanged → every segment reused,
      // the commit is pure metadata
      import org.apache.spark.sql.functions.col
      t.deleteMor(col("id") === 3L)
      assert(t.read().select("id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 4L, 5L, 6L))
      // equality upsert: tombstone + new files in one commit
      t.upsertEq(Seq((5L, "V5"), (7L, "v7")).toDF("id", "v"), "id")
      assert(t.read().count() === 6L)
      assert(t.read().where("id = 5").select("v").as[String].head() === "V5")
      // compact folds the marks; segments repack around the rewrite
      t.compact()
      assert(t.read().count() === 6L)
      assert(t.snapshot().deletes.isEmpty && t.snapshot().eqDeletes.isEmpty)
      // history + time travel still resolve across the whole lineage
      assert(t.history().count() >= 9L)
      assert(t.timeTravel(6L).count() === 6L)
    }
  }

  test("commit metadata is O(changed), not O(table): the pointer stays small vs the pool") {
    withCap(8) {
      val (root, t) = freshTable()
      for (b <- 0 until 8)
        t.append((1 to 8).map(i => ((b * 8 + i).toLong, s"v$i"))
          .toDF("id", "v").repartition(8))
      val (segs, inline) = manifestShape(root, t.currentVersion)
      assert(inline === 0 && segs.size >= 8)
      val logDir = root.resolve("_graft_log")
      val pointer = Files.size(
        logDir.resolve(f"v${t.currentVersion}%05d.manifest.json"))
      val pool = segs.map(n => Files.size(logDir.resolve(n))).sum
      // the manifest re-lists segments by name: its size must be a
      // small fraction of the entries it references (an inline render
      // would be ≈ the pool size, rewritten EVERY commit)
      assert(pointer < pool / 4,
        s"pointer $pointer B should be << pool $pool B")
      assert(t.read().count() === 64L)
    }
  }

  test("rollback to a segmented snapshot reuses its segments verbatim") {
    withCap(4) {
      val (root, t) = freshTable()
      append(t, 1 to 8)
      val v = t.currentVersion
      val (target, _) = manifestShape(root, v)
      import org.apache.spark.sql.functions.col
      t.delete(col("id") > 4L)
      t.rollback(v)
      val (now, _) = manifestShape(root, t.currentVersion)
      assert(now.toSet === target.toSet, "rollback re-lists, never re-packs")
      assert(t.read().count() === 8L)
    }
  }
}
