package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Path, Paths}

/** Crash-safety of the commit protocol under an UNRELIABLE store,
  * injected through the [[GraftFileIO]] seam: spurious CAS rejections
  * must be retried through, a store outage mid-commit must leave the
  * table state byte-identical (orphaned staging reclaimed by the
  * age-guarded sweep, never by the failing writer), and a transaction
  * that dies at publish must leave main untouched. These are the
  * object-store failure modes the protocol was designed around — a
  * wrong answer here corrupts a table, so they get their own suite. */
class FaultInjectionSpec extends SparkSpec {
  import spark.implicits._

  /** Seam wrapper with injectable faults (single-threaded tests). */
  private final class FlakyIO(inner: GraftFileIO) extends GraftFileIO {
    @volatile var rejectPublishes = 0 // CAS says "you lost" spuriously
    @volatile var failPublishes = 0   // store outage: publish throws
    @volatile var failReads = 0       // transient read outage
    @volatile var onReject: () => Unit = () => () // runs at each rejection
    override def readString(path: Path): String = {
      if (failReads > 0) { failReads -= 1
        throw new java.io.IOException("injected read outage") }
      inner.readString(path)
    }
    override def publishAtomic(path: Path, content: String): Boolean = {
      if (rejectPublishes > 0) { rejectPublishes -= 1; onReject(); false }
      else if (failPublishes > 0) { failPublishes -= 1
        throw new java.io.IOException("injected store outage") }
      else inner.publishAtomic(path, content)
    }
    override def exists(path: Path): Boolean = inner.exists(path)
    override def list(dir: Path): Seq[String] = inner.list(dir)
    override def listDirs(dir: Path): Seq[String] = inner.listDirs(dir)
    override def delete(path: Path): Unit = inner.delete(path)
    override def deleteTree(dir: Path): Unit = inner.deleteTree(dir)
    override def mkdirs(dir: Path): Unit = inner.mkdirs(dir)
  }

  private def dataFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(root).resolve("data")
    if (!Files.isDirectory(d)) return Set.empty
    val w = Files.walk(d)
    try w.iterator().asScala.filter(p =>
      p.getFileName.toString.endsWith(".parquet")).map(_.toString).toSet
    finally w.close()
  }

  test("spurious CAS rejections: the commit loop retries through and lands exactly once") {
    val io = new FlakyIO(GraftFileIO.Local)
    val root = Files.createTempDirectory("fault_cas_").toString
    val t = LogTable(spark, root, io = io)
    t.append(Seq((1L, "a")).toDF("id", "s"))

    io.rejectPublishes = 3
    val s = t.append(Seq((2L, "b")).toDF("id", "s"))
    assert(io.rejectPublishes === 0, "the loop must have eaten every rejection")
    assert(s.version === 2L)
    assert(t.currentVersion === 2L, "exactly one commit landed")
    assert(t.read().select("id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("store outage at publish: loud failure, state byte-identical, orphans age-reclaimed") {
    val io = new FlakyIO(GraftFileIO.Local)
    val root = Files.createTempDirectory("fault_outage_").toString
    val t = LogTable(spark, root, io = io)
    t.append(Seq((1L, "a")).toDF("id", "s"))
    val manifestBefore = io.readString(
      Paths.get(root).resolve("_graft_log").resolve("v00001.manifest.json"))
    val filesBefore = dataFiles(root)

    io.failPublishes = 1
    intercept[java.io.IOException](t.append(Seq((2L, "b")).toDF("id", "s")))

    // table state: untouched, still serving the old snapshot
    assert(t.currentVersion === 1L)
    assert(t.read().select("id").as[Long].collect() === Array(1L))
    assert(io.readString(Paths.get(root).resolve("_graft_log")
      .resolve("v00001.manifest.json")) === manifestBefore)
    // the crashed writer's parquet is orphaned on disk (it must NOT be
    // deleted by the failing writer — a racing reader of a concurrent
    // winner could be mid-scan) and the age-guarded sweep reclaims it
    assert(dataFiles(root) !== filesBefore, "the outage stranded staged parquet")
    // dry run first (the operator's habit): same reclaim list, no deletion
    val wouldReclaim = t.removeOrphans(
      olderThanMs = System.currentTimeMillis() + 1000L, dryRun = true)
    assert(wouldReclaim.nonEmpty)
    assert(dataFiles(root) !== filesBefore, "dry run must not delete")
    val reclaimed = t.removeOrphans(olderThanMs = System.currentTimeMillis() + 1000L)
    assert(reclaimed.toSet === wouldReclaim.toSet,
      "the real sweep must reclaim exactly what the dry run reported")
    assert(dataFiles(root) === filesBefore)

    // the table keeps working, exactly
    t.append(Seq((3L, "c")).toDF("id", "s"))
    assert(t.read().select("id").as[Long].collect().sorted === Array(1L, 3L))
  }

  test("a transaction dying at publish leaves main untouched and staging dropped") {
    val io = new FlakyIO(GraftFileIO.Local)
    val root = Files.createTempDirectory("fault_txn_").toString
    val t = LogTable(spark, root, io = io)
    t.append(Seq((1L, "a")).toDF("id", "s"))

    intercept[java.io.IOException] {
      t.transaction { tx =>
        tx.append(Seq((2L, "b")).toDF("id", "s"))
        tx.delete(col("id") === 1L)
        io.failPublishes = 1 // the outage hits the PUBLISH commit
      }
    }
    assert(t.currentVersion === 1L)
    assert(t.read().select("id").as[Long].collect() === Array(1L))
    assert(t.branches.isEmpty, "the staging branch must not survive the crash")
    // and a clean re-run of the same transaction succeeds
    t.transaction { tx =>
      tx.append(Seq((2L, "b")).toDF("id", "s"))
      tx.delete(col("id") === 1L)
    }
    assert(t.read().select("id").as[Long].collect() === Array(2L))
  }

  test("a transient read outage fails the operation loudly, never corrupts") {
    val io = new FlakyIO(GraftFileIO.Local)
    val root = Files.createTempDirectory("fault_read_").toString
    val t = LogTable(spark, root, io = io)
    t.append(Seq((1L, "a")).toDF("id", "s"))

    io.failReads = 1
    intercept[java.io.IOException](t.append(Seq((2L, "b")).toDF("id", "s")))
    io.failReads = 0
    assert(t.currentVersion === 1L)
    t.append(Seq((2L, "b")).toDF("id", "s"))
    assert(t.read().count() === 2L)
  }

  test("eq-upsert CDC pre-images RESTAGE when a concurrent append races the commit (no silent CDC divergence)") {
    val io = new FlakyIO(GraftFileIO.Local)
    val root = Files.createTempDirectory("fault_eqcdc_").toString
    val t = LogTable(spark, root, io = io)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))          // v1
    t.setProperties(Map(LogTable.CdcEnabledProp -> "true"))      // v2
    val from = t.currentVersion

    // a second committer on the same root: its append lands BETWEEN
    // this upsert's pre-image scan and its manifest publish (injected
    // as the CAS-loss callback) — and the appended row's key is one
    // the upsert's tombstone also masks. Stale change files would
    // omit its 'delete' pre-image.
    val other = LogTable(spark, root)
    io.onReject = () => { other.append(Seq((3L, "c_old")).toDF("id", "s")); () }
    io.rejectPublishes = 1
    t.upsertEq(Seq((2L, "b2"), (3L, "c_new")).toDF("id", "s"), "id")
    assert(io.rejectPublishes === 0, "the injected CAS loss must have fired")

    // table state: both committers' effects, upsert wins on keys 2 & 3
    assert(t.read().orderBy($"id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b2"), (3L, "c_new")))

    // CDC: the upsert commit's change files were RESTAGED against the
    // post-race snapshot, so the concurrently appended (3, "c_old")
    // row appears BOTH as that append's insert AND as the upsert's
    // delete pre-image — no silently vanished row in the changelog
    val win = t.readCdc(from, t.currentVersion)
    val byType = win.groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dels = win.filter($"_change_type" === "delete")
      .select($"id", $"s").as[(Long, String)].collect().toSet
    assert(dels === Set((2L, "b"), (3L, "c_old")),
      s"delete pre-images must cover the raced append's masked row, got $dels")
    assert(byType("insert") === 3L,
      "inserts: the raced append's row + the upsert's two post-images")
  }
}
