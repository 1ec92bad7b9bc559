package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Paths}

/** Shallow clone ([[LogTable.cloneTo]]): a zero-copy table whose first
  * snapshot borrows the source's files by absolute path. The clone
  * diverges independently, never mutates the source, and its retention
  * can never reclaim borrowed files (expire's own-root guard). */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("clone reads the source snapshot zero-copy; both sides diverge independently") {
    val src = LogTable(spark, tmp("clone_src_"), partitionBy = Seq("k"))
    src.append(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k"))
    val v1 = src.currentVersion
    src.append(Seq((4L, "c")).toDF("id", "k"))

    val clone = src.cloneTo(tmp("clone_dst_"), v1)
    // zero data copied: the clone's manifest references the SOURCE files
    assert(clone.snapshot().files.map(_.path).toSet ===
      src.snapshot(v1).files.map(_.path).toSet)
    assert(clone.read().select("id").as[Long].collect().sorted === Array(1L, 2L, 3L))
    // spec + schema carried: partition pruning works on the clone
    assert(clone.readWhere(p => p("k") == "a").count() === 2L)

    // divergence: clone writes land under the clone's root only
    clone.append(Seq((10L, "z")).toDF("id", "k"))
    assert(clone.read().count() === 4L)
    assert(src.read().count() === 4L) // source: 3 + its own (4L, "c")
    assert(src.read().filter(col("id") === 10L).count() === 0L)
    // source writes stay invisible to the clone
    src.append(Seq((20L, "w")).toDF("id", "k"))
    assert(clone.read().filter(col("id") === 20L).count() === 0L)
  }

  test("a clone's COW delete and expire never touch borrowed source files") {
    val src = LogTable(spark, tmp("clone_src2_"))
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(1))
    val srcFiles = src.snapshot().files.map(_.path)

    val clone = src.cloneTo(tmp("clone_dst2_"))
    // COW delete on the clone rewrites into the CLONE's data dir and
    // drops the borrowed reference — the source file stays on disk
    clone.delete(col("id") === 1L)
    assert(clone.read().select("id").as[Long].collect() === Array(2L))
    srcFiles.foreach(p => assert(Files.exists(Paths.get(p)),
      s"clone delete touched source file $p"))
    assert(src.read().count() === 2L)

    // clone retention: expire drops the borrowed-file manifest — the
    // own-root guard keeps the SOURCE file alive
    clone.expire(keepLast = 1)
    srcFiles.foreach(p => assert(Files.exists(Paths.get(p)),
      s"clone expire reclaimed borrowed source file $p"))
    // the clone's own rewrite file is subject to ITS retention as usual
    assert(clone.read().select("id").as[Long].collect() === Array(2L))
    // and the source still reads
    assert(src.read().count() === 2L)
  }

  test("clone refuses a non-empty destination; compact migrates to owned files") {
    val src = LogTable(spark, tmp("clone_src3_"))
    src.append(Seq((1L, "a")).toDF("id", "k"))
    src.append(Seq((2L, "b")).toDF("id", "k"))
    val dstRoot = tmp("clone_dst3_")
    val clone = src.cloneTo(dstRoot)
    intercept[IllegalArgumentException](src.cloneTo(dstRoot))

    // force-migrate: after compact the clone owns every file and no
    // longer depends on the source
    clone.compact(smallBytes = Long.MaxValue)
    val root = Paths.get(dstRoot).toAbsolutePath
    assert(clone.snapshot().files.forall(f =>
      Paths.get(f.path).toAbsolutePath.startsWith(root)),
      "post-compact clone must own all its files")
    assert(clone.read().count() === 2L)
  }

  test("CALL clone(t, path) on the SQL surface") {
    val src = LogTable(spark, tmp("clone_sql_src_"))
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    GraftSql.register("clone_sql_t", src)
    val dst = tmp("clone_sql_dst_") + "/c"
    GraftSql.exec(spark, s"CALL clone(clone_sql_t, '$dst')")
    val clone = LogTable(spark, dst)
    assert(clone.read().select("id").as[Long].collect().sorted === Array(1L, 2L))
    assert(clone.snapshot().operation === "clone")
  }

  test("clone carries MoR and equality delete context; DSv2 reads the clone") {
    val src = LogTable(spark, tmp("clone_mor_src_"))
    src.append((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(2))
    src.deleteMor(col("id") >= 8)        // position marks
    src.deleteEq(Seq(Tuple1(0L)).toDF("id")) // equality tombstone

    val clone = src.cloneTo(tmp("clone_mor_dst_"))
    // the clone sees exactly the source's visible rows: marks and
    // tombstones ride the clone manifest (absolute delete-file paths)
    assert(clone.read().select("id").as[Long].collect().sorted ===
      (1L until 8L).toArray)
    // ... and through the DSv2 batch scan
    assert(spark.read.format("graft").load(clone.root)
      .select("id").as[Long].collect().sorted === (1L until 8L).toArray)

    // the clone's own upsert diverges; source context untouched
    clone.upsertEq(Seq((1L, "z")).toDF("id", "v"), "id")
    assert(clone.read().filter(col("id") === 1L).select("v").as[String].head() === "z")
    assert(src.read().filter(col("id") === 1L).select("v").as[String].head() === "r1")

    // clone-of-clone composes
    val c2 = clone.cloneTo(tmp("clone_mor_dst2_"))
    assert(c2.read().count() === clone.read().count())
  }
}
