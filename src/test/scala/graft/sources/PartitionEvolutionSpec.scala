package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Partition-spec evolution ([[LogTable.evolveSpec]] — Iceberg's
  * signature layout feature): change identity columns / hidden
  * transforms for FUTURE files without rewriting any existing file.
  * Old files keep their layout and are conservatively scanned, never
  * mis-pruned; maintenance rewrites migrate them into the new
  * layout. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(day: Int, kinds: Seq[String]): org.apache.spark.sql.DataFrame =
    kinds.zipWithIndex.map { case (k, i) =>
      (day * 86400000000L + i, k, i.toLong)
    }.toDF("ts_us", "kind", "v")

  test("evolve unpartitioned → (kind, day(ts_us)): metadata-only, mixed layouts read exactly") {
    val root = tmp("pevo")
    val t0 = LogTable(spark, root)
    t0.append(rows(0, Seq("a", "b", "a", "b")))
    val preFiles = t0.snapshot().files.map(_.path).toSet

    val t1 = t0.evolveSpec(partitionBy = Seq("kind"),
      hiddenBy = Seq(Transform.day("ts_us")))
    // metadata-only: same files, new recorded spec
    assert(t1.snapshot().files.map(_.path).toSet === preFiles)
    assert(t1.snapshot().operation === "evolve-spec")

    // new appends land in the new layout (directory keys in the manifest)
    t1.append(rows(1, Seq("a", "b")))
    t1.append(rows(2, Seq("a", "b")))
    val newFiles = t1.snapshot().files.filterNot(f => preFiles.contains(f.path))
    assert(newFiles.nonEmpty &&
      newFiles.forall(f => f.partitions.contains("kind") &&
        f.partitions.contains(Transform.day("ts_us").colName)))
    // old files keep their (empty) layout
    assert(t1.snapshot().files.filter(f => preFiles.contains(f.path))
      .forall(_.partitions.isEmpty))

    // the MIXED-LAYOUT read is exact (old: kind from data; new: kind
    // from directory)
    assert(t1.read().count() === 8L)
    assert(t1.read().groupBy("kind").count().orderBy("kind")
      .as[(String, Long)].collect().toSeq === Seq(("a", 4L), ("b", 4L)))

    // a spec-less reopen adopts the evolved spec
    val re = LogTable(spark, root)
    assert(re.partitionBy === Seq("kind"))
    assert(re.hiddenBy === Seq(Transform.day("ts_us")))

    // DSv2 reads the mixed layout identically
    assert(spark.read.format("graft").load(root)
      .orderBy("ts_us", "kind").collect().map(_.toSeq).toSeq ===
      t1.read().orderBy("ts_us", "kind").collect().map(_.toSeq).toSeq)
    // ... and a filter over the evolved axis stays exact (old files
    // conservatively scanned, new files pruned)
    assert(spark.read.format("graft").load(root)
      .where($"kind" === "a").count() === 4L)
  }

  test("pruning after evolution: old files conservatively scanned, new files skipped") {
    val root = tmp("pevo-prune")
    val t0 = LogTable(spark, root)
    t0.append(rows(0, Seq("a", "b")))
    val t1 = t0.evolveSpec(hiddenBy = Seq(Transform.day("ts_us")))
    (1 to 3).foreach(d => t1.append(rows(d, Seq("a", "b"))))

    // range prune on day 3: the 3 new files narrow to 1, the old
    // (keyless) file is scanned — kept files = old + day-3
    val lo = 3 * 86400000000L
    val kept = t1.filesInRange("ts_us", lo, lo + 86400000000L - 1)
    val preFile = t1.snapshot().files.filter(_.partitions.isEmpty)
    assert(preFile.nonEmpty)
    assert(kept.size < t1.snapshot().files.size)
    // result exact despite the conservative scan
    assert(t1.readRange("ts_us", lo, lo + 86400000000L - 1).count() === 2L)
  }

  test("readWhere fails loudly on pre-evolution files; compact migrates the layout") {
    val root = tmp("pevo-rw")
    val t0 = LogTable(spark, root)
    t0.append(rows(0, Seq("a", "b")))
    val t1 = t0.evolveSpec(partitionBy = Seq("kind"))
    t1.append(rows(1, Seq("a", "b")))
    val e = intercept[IllegalArgumentException] {
      t1.readWhere(_.get("kind").contains("a")).count()
    }
    assert(e.getMessage.contains("predate the current partition spec"))
    // force-migrate: every file rewritten under the current spec
    t1.compact(smallBytes = Long.MaxValue)
    assert(t1.snapshot().files.forall(_.partitions.contains("kind")))
    assert(t1.readWhere(_.get("kind").contains("a")).count() === 2L)
  }

  test("a stale spec-ful handle fails loudly instead of reverting the evolution") {
    val root = tmp("pevo-stale")
    val tA = LogTable(spark, root, partitionBy = Seq("kind"))
    tA.append(rows(0, Seq("a", "b")))
    tA.evolveSpec(partitionBy = Nil, hiddenBy = Seq(Transform.day("ts_us")))
    val e = intercept[IllegalArgumentException] {
      tA.append(rows(1, Seq("a")))
    }
    assert(e.getMessage.contains("spec evolved"))
    // the fresh handle (or a reopen) writes fine
    LogTable(spark, root).append(rows(1, Seq("a")))
    assert(LogTable(spark, root).read().count() === 3L)
  }

  test("streaming appends cross an evolve-spec boundary (row-preserving op)") {
    val root = tmp("pevo-stream")
    val t0 = LogTable(spark, root)
    t0.append(rows(0, Seq("a")))
    val v1 = t0.currentVersion
    val t1 = t0.evolveSpec(partitionBy = Seq("kind"))
    t1.append(rows(1, Seq("b")))
    // the changelog skips the metadata-only commit and carries exactly
    // the appended rows on both sides of it
    assert(t1.readAppends(v1).count() === 1L)
    assert(t1.readAppends(0L).count() === 2L)
  }

  test("validation: unknown columns and non-Long transform sources are rejected") {
    val root = tmp("pevo-val")
    val t = LogTable(spark, root)
    t.append(rows(0, Seq("a")))
    intercept[IllegalArgumentException] {
      t.evolveSpec(partitionBy = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      t.evolveSpec(hiddenBy = Seq(Transform.day("kind"))) // string source
    }
  }

  test("re-parameterizing a live transform is refused: bucket(8) → bucket(16) would mis-prune") {
    val root = tmp("pevo-rebucket")
    val t = LogTable(spark, root, hiddenBy = Seq(Transform.bucket(8, "v")))
    t.append(rows(0, Seq("a", "b", "c", "d")))
    // the directory key `_p_v_bucket` does not record n; files derived
    // mod 8 would be pruned with mod-16 arithmetic → loud refusal
    val e = intercept[IllegalArgumentException] {
      t.evolveSpec(hiddenBy = Seq(Transform.bucket(16, "v")))
    }
    assert(e.getMessage.contains("_p_v_bucket"))
    // same (source, kind) with a different truncate width: also refused
    val t2 = LogTable(spark, tmp("pevo-retrunc"),
      hiddenBy = Seq(Transform.truncate(10L, "v")))
    t2.append(rows(0, Seq("a", "b")))
    intercept[IllegalArgumentException] {
      t2.evolveSpec(hiddenBy = Seq(Transform.truncate(100L, "v")))
    }
    // the IDENTICAL transform is not a re-parameterization: adding an
    // axis while keeping bucket(8) verbatim is allowed
    val kept = t.evolveSpec(partitionBy = Seq("kind"),
      hiddenBy = Seq(Transform.bucket(8, "v")))
    assert(kept.hiddenBy === Seq(Transform.bucket(8, "v")))
    assert(kept.read().count() === 4L)
  }

  test("rebucketing after a force-migrate rewrite is allowed and prunes correctly") {
    val root = tmp("pevo-migrate")
    val t = LogTable(spark, root, hiddenBy = Seq(Transform.bucket(8, "v")))
    t.append(rows(0, Seq("a", "b", "c", "d")))
    // step 1: evolve the axis OUT (metadata-only; old keys remain on files)
    val t1 = t.evolveSpec()
    intercept[IllegalArgumentException] { // keys still live → still refused
      t1.evolveSpec(hiddenBy = Seq(Transform.bucket(16, "v")))
    }
    // step 2: force-migrate rewrites every file under the (empty) spec
    t1.compact(smallBytes = Long.MaxValue)
    assert(t1.snapshot().files.forall(!_.partitions.contains("_p_v_bucket")))
    // step 3: re-evolve to the new bucket count — now sound
    val t2 = t1.evolveSpec(hiddenBy = Seq(Transform.bucket(16, "v")))
    t2.append(rows(1, Seq("e", "f")))
    assert(t2.read().count() === 6L)
    // point lookup over the mixed layout stays exact: pre-migration
    // rows (now unkeyed) scan, post-evolution rows prune mod 16
    assert(t2.read().where(col("v") === 0L).count() === 2L)
  }
}
