package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** The zero-rename commit protocol: data files land at final names
  * under data/ (or deletes/) in the write job itself, the sidecar is
  * the committed list, and nothing Spark wrote is ever moved. */
class DirectCommitSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): Path =
    Files.createTempDirectory("graft-direct-")

  private def walkFiles(dir: Path): Seq[Path] = {
    val w = Files.walk(dir)
    try w.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
    finally w.close()
  }

  test("raw protocol: tasks write final files under the target; sidecar lists them; stage holds no data") {
    DirectCommitProtocol.install(spark)
    val target = freshDir()
    val stage = freshDir().resolve("job")
    (1 to 100).toDF("n").repartition(4)
      .write.option(DirectCommitProtocol.TargetKey, target.toString)
      .parquet(stage.toString)
    val sidecar = stage.resolve(DirectCommitProtocol.Sidecar)
    assert(Files.exists(sidecar), "job commit must leave the sidecar")
    val entries = Files.readAllLines(sidecar).asScala.filter(_.nonEmpty)
      .map(l => l.split("\t", 2))
    assert(entries.nonEmpty)
    entries.foreach { case Array(dir, p) =>
      assert(dir.isEmpty, "unpartitioned write has no partition dir")
      assert(Files.exists(Paths.get(p)), s"committed file missing: $p")
      assert(Paths.get(p).startsWith(target), "file must be under the target")
    }
    // the stage dir received ZERO data files — only job scaffolding
    assert(!walkFiles(stage).exists(_.getFileName.toString.endsWith(".parquet")))
    // and the written set reads back whole
    assert(spark.read.parquet(
      entries.map(_.apply(1)).toSeq: _*).count() === 100L)
  }

  test("partitioned write: sidecar dirs carry the k=v layout and files land inside it") {
    DirectCommitProtocol.install(spark)
    val target = freshDir()
    val stage = freshDir().resolve("job")
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("n", "k")
      .write.partitionBy("k")
      .option(DirectCommitProtocol.TargetKey, target.toString)
      .parquet(stage.toString)
    val entries = Files.readAllLines(stage.resolve(DirectCommitProtocol.Sidecar))
      .asScala.filter(_.nonEmpty).map(_.split("\t", 2))
    assert(entries.map(_.head).toSet === Set("k=a", "k=b"))
    entries.foreach { case Array(dir, p) =>
      assert(Paths.get(p).getParent === target.resolve(dir))
    }
  }

  test("without the target option the protocol delegates: vanilla output, no sidecar") {
    DirectCommitProtocol.install(spark)
    val out = freshDir().resolve("plain")
    (1 to 10).toDF("n").write.parquet(out.toString)
    assert(!Files.exists(out.resolve(DirectCommitProtocol.Sidecar)))
    assert(spark.read.parquet(out.toString).count() === 10L)
  }

  test("table append commits via the sidecar: no leftover stage dirs, no .crc junk, reads whole") {
    val root = freshDir().resolve("t")
    val t = LogTable(spark, root.toString, partitionBy = Seq("k"))
    t.append(Seq((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "a"))
      .toDF("id", "v", "k"))
    val listed = Files.list(root).iterator().asScala.map(_.getFileName.toString).toSeq
    assert(!listed.exists(_.startsWith("stage-")), s"stage dirs must be cleaned: $listed")
    val dataFiles = walkFiles(root.resolve("data"))
    assert(dataFiles.nonEmpty)
    assert(!dataFiles.exists(_.getFileName.toString.endsWith(".crc")),
      "checksum siblings must not pollute the data pool")
    assert(dataFiles.forall(_.getFileName.toString.endsWith(".parquet")))
    // manifest paths are exactly the on-disk final paths
    assert(t.snapshot().files.map(_.path).toSet === dataFiles.map(_.toString).toSet)
    assert(t.read().count() === 3L)
    assert(t.readWhere(p => p.get("k").contains("a")).count() === 2L)
  }

  test("equality tombstones direct-commit into deletes/ and still guard by sequence") {
    val root = freshDir().resolve("t")
    val t = LogTable(spark, root.toString)
    t.append(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v"))
    t.deleteEq(Seq(2L).toDF("id"))
    assert(t.read().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val delFiles = walkFiles(root.resolve("deletes"))
    assert(delFiles.nonEmpty)
    assert(!delFiles.exists(_.getFileName.toString.endsWith(".crc")))
    // rows appended AFTER the tombstone are untouched (sequence guard)
    t.append(Seq((2L, "y2")).toDF("id", "v"))
    assert(t.read().select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("empty append commits no files and the table stays readable") {
    val root = freshDir().resolve("t")
    val t = LogTable(spark, root.toString)
    t.append(Seq((1L, "x")).toDF("id", "v"))
    val before = t.snapshot().files.size
    t.append(Seq.empty[(Long, String)].toDF("id", "v").where("id > 0"))
    // an empty write may legitimately commit zero files or one 0-row
    // schema file depending on Spark's empty-task behavior — either
    // way the read is unchanged
    assert(t.read().count() === 1L)
    assert(t.snapshot().files.size >= before)
  }
}
