package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** One data file of a [[LogTable]] snapshot (manifest entry). */
final case class DataFile(path: String, rows: Long, bytes: Long)

/** One committed snapshot: the COMPLETE list of data files visible at
  * `version`, plus commit metadata. */
final case class Snapshot(version: Long, parent: Long, operation: String,
    timestampMs: Long, files: Seq[DataFile]) {
  def totalRows: Long = files.map(_.rows).sum
  def totalBytes: Long = files.map(_.bytes).sum
}

/** A manifest-versioned parquet table — the Spark-native re-expression
  * of the reference's buffered-ingest → parquet-flush → atomic
  * multi-file Iceberg commit pipeline (reference README.md:191-212
  * "How It Works": writers flush parquet files, a leader commits them
  * atomically to an Iceberg table; init-setup.py:84-130 sets up that
  * catalog).
  *
  * Design (SURVEY.md §3): the table's visible state is defined ONLY by
  * a versioned manifest `_graft_log/v{NNNNN}.manifest.json` listing
  * every data file of that snapshot. A commit writes the new manifest
  * to a temp name and atomically renames it into place; readers load
  * `spark.read.parquet(files: _*)` from one manifest and NEVER list
  * the data directory. This yields, exactly as Iceberg's
  * snapshot+manifest design does:
  *
  *  - atomic multi-file appends (readers see all files of a commit or
  *    none — no dir-listing races with in-flight writers);
  *  - snapshot isolation + time travel (old manifests stay readable);
  *  - optimistic concurrency (rename collision → reload state, retry
  *    with the next version number — the loser never clobbers the
  *    winner because rename-without-replace is atomic on the FS);
  *  - safe compaction (a replacing commit; concurrent readers of the
  *    old snapshot keep their file list until `expire` reclaims it).
  *
  * Scale notes: the manifest holds per-file (rows, bytes) stats so
  * planning (stats, bin-packing) never touches data; reads hand Spark
  * a concrete file list, so partition pruning / pushdown behave as any
  * parquet scan; appends are O(new files); compaction is first-fit
  * bin-packing over manifest metadata and rewrites ONLY small files,
  * never a global sort. On a real object store the atomic rename
  * becomes the catalog's compare-and-swap — isolated behind commit().
  */
final class LogTable private (val spark: SparkSession, val root: String) {
  import LogTable._

  private val rootPath = Paths.get(root)
  private val dataDir = rootPath.resolve("data")
  private val logDir = rootPath.resolve(ManifestDir)

  // ---------------------------------------------------------------- reads

  /** All committed versions, ascending (empty table → Seq(0)). */
  def versions: Seq[Long] =
    listManifests(logDir).map(_._1)

  /** Latest committed version (0 = empty table, no commits yet). */
  def currentVersion: Long = versions.lastOption.getOrElse(0L)

  /** Load one snapshot's manifest. */
  def snapshot(version: Long = currentVersion): Snapshot = {
    if (version == 0L) Snapshot(0L, 0L, "empty", 0L, Nil)
    else readManifest(manifestPath(logDir, version))
  }

  /** Manifest-scoped scan of the CURRENT snapshot. */
  def read(): DataFrame = timeTravel(currentVersion)

  /** Manifest-scoped scan of any committed snapshot — time travel. */
  def timeTravel(version: Long): DataFrame = {
    val snap = snapshot(version)
    if (snap.files.isEmpty) emptyLike()
    else spark.read.parquet(snap.files.map(_.path): _*)
  }

  /** Per-snapshot stats from manifest metadata ONLY (no data I/O). */
  def stats(version: Long = currentVersion): Snapshot = snapshot(version)

  /** Empty DataFrame with the table's schema (from any data file, or
    * truly empty when no commit exists yet). */
  private def emptyLike(): DataFrame = {
    val any = listManifests(logDir).reverseIterator
      .map(m => readManifest(m._2)).find(_.files.nonEmpty)
    any match {
      case Some(s) => spark.read.parquet(s.files.head.path).limit(0)
      case None => spark.emptyDataFrame
    }
  }

  // --------------------------------------------------------------- writes

  /** Atomically append `df` as one multi-file commit: write the data
    * files first (invisible to readers), then commit {old ∪ new}. */
  def append(df: DataFrame): Snapshot = {
    val newFiles = writeDataFiles(df)
    if (newFiles.isEmpty) snapshot()
    else commit("append")(prev => prev.files ++ newFiles)
  }

  /** Bin-pack data files smaller than `smallBytes` into ~`targetBytes`
    * output files and commit the replacing snapshot. Packing runs on
    * manifest stats only; only small files are rewritten. */
  def compact(smallBytes: Long = 32L << 20, targetBytes: Long = 128L << 20): Snapshot = {
    val snap = snapshot()
    val (small, big) = snap.files.partition(_.bytes < smallBytes)
    if (small.size < 2) return snap
    // First-fit bin-packing over manifest byte counts.
    val bins = scala.collection.mutable.ListBuffer[scala.collection.mutable.ListBuffer[DataFile]]()
    small.sortBy(-_.bytes).foreach { f =>
      bins.find(b => b.map(_.bytes).sum + f.bytes <= targetBytes) match {
        case Some(b) => b += f
        case None => bins += scala.collection.mutable.ListBuffer(f)
      }
    }
    val rewritten = bins.toSeq.flatMap { bin =>
      writeDataFiles(spark.read.parquet(bin.map(_.path).toSeq: _*).coalesce(1))
    }
    commit("compact") { prev =>
      // Tolerate commits that landed since we read `snap`: replace only
      // the small files we actually rewrote, keep everything else.
      val replaced = small.map(_.path).toSet
      prev.files.filterNot(f => replaced.contains(f.path)) ++ rewritten
    }
  }

  /** Drop all but the newest `keepLast` snapshots and delete data files
    * referenced ONLY by the dropped ones. */
  def expire(keepLast: Int = 1): Snapshot = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val all = listManifests(logDir)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    if (drop.nonEmpty) {
      val live = keep.flatMap(m => readManifest(m._2).files.map(_.path)).toSet
      val dead = drop.flatMap(m => readManifest(m._2).files.map(_.path))
        .distinct.filterNot(live.contains)
      dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
      drop.foreach(m => Files.deleteIfExists(m._2))
    }
    snapshot()
  }

  // ------------------------------------------------------------ internals

  /** Write `df` into the data dir under fresh UUID names; returns the
    * new files with footer-exact row counts. Data files are invisible
    * until a manifest referencing them is committed. */
  private def writeDataFiles(df: DataFrame): Seq[DataFile] = {
    val stage = rootPath.resolve(s"stage-${UUID.randomUUID()}")
    df.write.parquet(stage.toString)
    val parts = Files.list(stage).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val moved = parts.map { p =>
      val dest = dataDir.resolve(s"${UUID.randomUUID()}.parquet")
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      DataFile(dest.toString, parquetRowCount(dest), Files.size(dest))
    }
    // best-effort cleanup of the staging dir (_SUCCESS, .crc files)
    Files.walk(stage).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    moved
  }

  /** Optimistic-concurrency commit: build the next snapshot's file list
    * from the CURRENT one, write the manifest to a temp name, and
    * atomically rename to v{next}. Rename collision = another writer
    * won that version → re-read state and retry on top of it. */
  private def commit(operation: String)(nextFiles: Snapshot => Seq[DataFile]): Snapshot = {
    var attempts = 0
    while (attempts < MaxCommitRetries) {
      attempts += 1
      val prev = snapshot()
      val next = Snapshot(prev.version + 1, prev.version, operation,
        System.currentTimeMillis(), nextFiles(prev))
      val tmp = logDir.resolve(s"tmp-${UUID.randomUUID()}.manifest.json")
      Files.writeString(tmp, renderManifest(next))
      try {
        // ATOMIC_MOVE without REPLACE_EXISTING: fails (atomically) if a
        // concurrent committer already claimed this version number.
        Files.move(tmp, manifestPath(logDir, next.version), StandardCopyOption.ATOMIC_MOVE)
        return next
      } catch {
        case _: FileAlreadyExistsException => Files.deleteIfExists(tmp) // lost the race; retry
      }
    }
    throw new IllegalStateException(s"commit failed after $MaxCommitRetries retries at $root")
  }

  private def parquetRowCount(p: Path): Long = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), new Configuration())
    val reader = ParquetFileReader.open(in)
    try reader.getRecordCount finally reader.close()
  }
}

object LogTable {
  private val ManifestDir = "_graft_log"
  private val MaxCommitRetries = 20
  private val mapper = new ObjectMapper()

  /** Open (creating directories if needed) the table rooted at `root`. */
  def apply(spark: SparkSession, root: String): LogTable = {
    Files.createDirectories(Paths.get(root).resolve("data"))
    Files.createDirectories(Paths.get(root).resolve(ManifestDir))
    new LogTable(spark, root)
  }

  private def manifestPath(logDir: Path, version: Long): Path =
    logDir.resolve(f"v$version%05d.manifest.json")

  private val ManifestRe = """v(\d+)\.manifest\.json""".r

  /** (version, path) for every committed manifest, ascending. */
  private def listManifests(logDir: Path): Seq[(Long, Path)] = {
    if (!Files.isDirectory(logDir)) return Nil
    Files.list(logDir).iterator().asScala.flatMap { p =>
      p.getFileName.toString match {
        case ManifestRe(v) => Some((v.toLong, p))
        case _ => None
      }
    }.toSeq.sortBy(_._1)
  }

  private def renderManifest(s: Snapshot): String = {
    val node: ObjectNode = mapper.createObjectNode()
    node.put("version", s.version)
    node.put("parent", s.parent)
    node.put("operation", s.operation)
    node.put("timestampMs", s.timestampMs)
    val arr: ArrayNode = node.putArray("files")
    s.files.foreach { f =>
      val fn = arr.addObject()
      fn.put("path", f.path); fn.put("rows", f.rows); fn.put("bytes", f.bytes)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  private def readManifest(p: Path): Snapshot = {
    val n: JsonNode = mapper.readTree(Files.readString(p))
    val files = n.get("files").elements().asScala.map { f =>
      DataFile(f.get("path").asText(), f.get("rows").asLong(), f.get("bytes").asLong())
    }.toSeq
    Snapshot(n.get("version").asLong(), n.get("parent").asLong(),
      n.get("operation").asText(), n.get("timestampMs").asLong(), files)
  }
}
