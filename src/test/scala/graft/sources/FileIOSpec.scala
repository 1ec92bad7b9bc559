package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Paths}

/** The storage seam ([[GraftFileIO]]): LogTable's manifest/commit
  * layer runs entirely through {read, publishAtomic, list, delete} —
  * locally as hard-link publishes, and against the in-memory
  * conditional-put fake WITHOUT A SINGLE MANIFEST FILE ON DISK, which
  * is exactly the shape an object-store backend takes (manifests via
  * conditional PUT, bulk parquet via Hadoop's own FileSystem seam). */
class FileIOSpec extends SparkSpec {
  import spark.implicits._

  /** The two OFF-DISK stores the contract suite parameterizes over:
    * the in-memory CAS model and the S3-semantics object-store
    * emulation (flat keys, prefix listing, conditional PUT). Local is
    * the store every other suite exercises. */
  private def stores: Seq[(String, () => GraftFileIO)] = Seq(
    "in-memory" -> (() => new GraftFileIO.InMemory),
    "object-store" -> (() => new GraftFileIO.ObjectStoreEmu(
      Files.createTempDirectory("graft_bucket_"))))

  for ((storeName, mkIo) <- stores)
  test(s"a full table lifecycle with manifests ONLY in the $storeName store") {
    val io = mkIo()
    val root = Files.createTempDirectory("graft_io_").toString
    val t = LogTable(spark, root, io = io)

    t.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "s"))
    t.append((10 until 20).map(i => (i.toLong, s"b$i")).toDF("id", "s"))
    assert(t.read().count() === 20L)
    assert(t.currentVersion === 2L)

    // THE SEAM PROOF: no manifest directory ever touched the disk —
    // every commit, read and listing went through the fake store
    assert(!Files.exists(Paths.get(root).resolve("_graft_log")),
      "manifest layer leaked onto the filesystem past the seam")

    // refs + time travel
    t.createRef("prod")
    assert(t.refVersion("prod") === 2L)
    assert(t.timeTravel(1L).count() === 10L)
    intercept[IllegalStateException](t.createRef("prod"))

    // the WAP loop: branch lineage lives in the same store
    val b = t.createBranch("audit")
    b.append(Seq((20L, "staged")).toDF("id", "s"))
    assert(b.read().count() === 21L)
    assert(t.read().count() === 20L)
    t.fastForward("audit")
    assert(t.read().count() === 21L)

    // COW delete + rollback, all manifest traffic through the fake
    t.delete(col("id") < 5L)
    assert(t.read().count() === 16L)
    t.rollback(t.currentVersion - 1)
    assert(t.read().count() === 21L)

    // a second handle over the SAME store sees the same table…
    assert(LogTable(spark, root, io = io).read().count() === 21L)
    // …while a handle with the LOCAL io sees nothing (the disk holds
    // only data files; table state is wholly in the store)
    assert(LogTable(spark, root).currentVersion === 0L)

    // expire drops old manifests from the store and reclaims dead
    // data files from the data plane (disk). The branch lineage still
    // pins the pre-compact files — drop it first (its pin is itself
    // seam-resident state, consulted through the fake)
    t.dropRef("prod")
    t.dropBranch("audit")
    val preData = dataFiles(root).size
    t.compact()
    t.expire(keepLast = 1)
    assert(t.read().count() === 21L)
    assert(t.versions.size === 1)
    assert(dataFiles(root).size < preData)
  }

  for ((storeName, mkIo) <- stores)
  test(s"publishAtomic is compare-and-swap on the $storeName store: racing committers all land, none clobbered") {
    val io = mkIo()
    val root = Files.createTempDirectory("graft_io_race_").toString
    LogTable(spark, root, io = io)
      .append(Seq((0L, "base")).toDF("id", "s"))
    val threads = (1 to 6).map { i =>
      new Thread(() =>
        LogTable(spark, root, io = io)
          .append(Seq((i.toLong, s"w$i")).toDF("id", "s")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val t = LogTable(spark, root, io = io)
    assert(t.currentVersion === 7L, "every CAS loser must retry and land")
    assert(t.read().count() === 7L)
    assert(t.read().select("s").as[String].collect().toSet ===
      (1 to 6).map(i => s"w$i").toSet + "base")
  }

  test("object-store emulation enforces S3 semantics: flat namespace, prefix listing, PUT never replaces") {
    val io = new GraftFileIO.ObjectStoreEmu(
      Files.createTempDirectory("graft_bucket_sem_"))
    val base = Paths.get("/graft/t1/_log")
    // no mkdirs ever — "directories" are key prefixes only
    assert(io.list(base).isEmpty && io.listDirs(base).isEmpty)
    assert(io.publishAtomic(base.resolve("v1"), "a"))
    assert(!io.publishAtomic(base.resolve("v1"), "b"),
      "conditional PUT must refuse to replace an existing object")
    assert(io.readString(base.resolve("v1")) === "a",
      "the losing PUT must not have clobbered the winner")
    assert(io.publishAtomic(base.resolve("seg/x"), "s"))
    assert(io.list(base) === Seq("v1"), "delimiter listing: files only")
    assert(io.listDirs(base) === Seq("seg"), "prefixes surface as dirs")
    io.deleteTree(base)
    assert(io.list(base).isEmpty && io.listDirs(base).isEmpty)
    intercept[java.nio.file.NoSuchFileException](
      io.readString(base.resolve("v1")))
  }

  private def dataFiles(root: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(root).resolve("data")
    if (!Files.isDirectory(d)) return Nil
    val w = Files.walk(d)
    try w.iterator().asScala.filter(p =>
      p.getFileName.toString.endsWith(".parquet")).toSeq
    finally w.close()
  }
}
