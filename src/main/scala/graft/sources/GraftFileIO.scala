package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Storage seam under [[LogTable]]'s MANIFEST/COMMIT layer — the part
  * of the table that is object-store-sensitive. The reference's whole
  * mechanism runs against an object store (reference README.md "How It
  * Works": writers flush parquet to the store, a leader commits the
  * batch atomically to the catalog); what makes that portable is that
  * the COMMIT PROTOCOL needs exactly one primitive — an atomic
  * create-or-fail publish of an immutable manifest — plus plain
  * read/list/delete around it:
  *
  *   - [[GraftFileIO.Local]] implements publish as write-temp +
  *     hard-link (link(2) is create-or-fail; rename(2) would silently
  *     replace a concurrent winner);
  *   - an object-store implementation maps it to a conditional PUT
  *     (`If-None-Match: *`) or a catalog compare-and-swap — nothing
  *     else in the commit loop changes;
  *   - [[GraftFileIO.InMemory]] is the conditional-put model itself (a
  *     CAS on a map), proving the seam: a full table lifecycle runs
  *     with ZERO manifest files on disk.
  *
  * BULK DATA deliberately stays outside the seam: data/delete parquet
  * files are written and read by Spark itself through Hadoop's
  * FileSystem abstraction, which already is the object-store seam for
  * the data plane (s3a/gcs/abfs). This trait covers the control plane
  * Spark does not manage: manifests, refs, branch lineages. */
private[sources] trait GraftFileIO {
  /** Contents of `path`; throws if absent. */
  def readString(path: Path): String
  /** ATOMIC CREATE-OR-FAIL publish: `content` becomes fully visible at
    * `path` iff nothing exists there; `false` = a concurrent publisher
    * won (caller re-reads state and retries). The commit primitive. */
  def publishAtomic(path: Path, content: String): Boolean
  def exists(path: Path): Boolean
  /** Names of the regular entries directly under `dir` (Nil when the
    * directory does not exist). */
  def list(dir: Path): Seq[String]
  /** Names of the subdirectories directly under `dir`. */
  def listDirs(dir: Path): Seq[String]
  /** Delete-if-exists. */
  def delete(path: Path): Unit
  def deleteTree(dir: Path): Unit
  def mkdirs(dir: Path): Unit
}

private[sources] object GraftFileIO {

  /** Local-filesystem implementation — hard-link publish (the exact
    * semantics LogTable has always had). */
  object Local extends GraftFileIO {
    override def readString(path: Path): String = Files.readString(path)
    override def publishAtomic(path: Path, content: String): Boolean = {
      val tmp = path.resolveSibling(s"tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, content)
      try {
        Files.createLink(path, tmp)
        Files.deleteIfExists(tmp)
        true
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); false
      }
    }
    override def exists(path: Path): Boolean = Files.exists(path)
    override def list(dir: Path): Seq[String] = {
      if (!Files.isDirectory(dir)) return Nil
      val s = Files.list(dir)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.getFileName.toString).toSeq
      finally s.close()
    }
    override def listDirs(dir: Path): Seq[String] = {
      if (!Files.isDirectory(dir)) return Nil
      val s = Files.list(dir)
      try s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq
      finally s.close()
    }
    override def delete(path: Path): Unit = Files.deleteIfExists(path)
    override def deleteTree(dir: Path): Unit = {
      if (!Files.exists(dir)) return
      val walk = Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    override def mkdirs(dir: Path): Unit = { Files.createDirectories(dir); () }
  }

  /** LOCAL EMULATION of an S3-SEMANTICS object store — the production
    * half of the seam (the reference runs its whole data plane on
    * MinIO, reference docker-compose.yaml), shaped exactly like the
    * four S3 calls a real client would make, so a drop-in swaps only
    * the transport:
    *
    *   readString    → GetObject
    *   publishAtomic → PutObject with `If-None-Match: *`
    *                   (HTTP 412 Precondition Failed → false — the
    *                   conditional-PUT commit primitive S3 has served
    *                   since 2024 and MinIO for years)
    *   list/listDirs → ListObjectsV2 prefix scan (with and without
    *                   the '/' delimiter)
    *   delete(Tree)  → DeleteObject(s) by key/prefix
    *
    * The emulation enforces OBJECT-STORE semantics, not POSIX: the
    * namespace is FLAT — every logical path maps to one object whose
    * key is the full path ('/' percent-encoded into the object name),
    * there are no directories (mkdirs is a no-op; "directories" exist
    * only as key prefixes, exactly as S3 implies them), and listing
    * is a prefix scan. Conditional PUT is emulated by create-or-fail
    * hard link, which has the same atomicity contract (the request
    * either creates the object or fails because one exists — never
    * replaces). `bucket` is the emulated bucket's backing directory;
    * one instance = one bucket. Bulk parquet stays on Hadoop's
    * FileSystem seam (s3a in production), as with every store. */
  final class ObjectStoreEmu(bucket: Path) extends GraftFileIO {
    Files.createDirectories(bucket)
    private def key(p: Path): String = p.toAbsolutePath.normalize.toString
    private def enc(k: String): String =
      java.net.URLEncoder.encode(k, "UTF-8")
    private def dec(n: String): String =
      java.net.URLDecoder.decode(n, "UTF-8")
    private def obj(p: Path): Path = bucket.resolve(enc(key(p)))
    /** Every committed object key (the bucket LIST): encoded names
      * start with the encoding of '/', so in-flight temp files are
      * structurally excluded. */
    private def keys(): Seq[String] = {
      val s = Files.list(bucket)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("%2F")).map(dec).toSeq
      finally s.close()
    }

    override def readString(path: Path): String = {
      val o = obj(path)
      if (!Files.exists(o))
        throw new java.nio.file.NoSuchFileException(path.toString)
      Files.readString(o)
    }
    override def publishAtomic(path: Path, content: String): Boolean = {
      val tmp = bucket.resolve(s"tmp-${UUID.randomUUID()}")
      Files.writeString(tmp, content)
      try {
        Files.createLink(obj(path), tmp)
        Files.deleteIfExists(tmp)
        true
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); false
      }
    }
    override def exists(path: Path): Boolean = Files.exists(obj(path))
    override def list(dir: Path): Seq[String] = {
      val prefix = key(dir) + "/"
      keys().collect {
        case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains("/") =>
          k.stripPrefix(prefix)
      }
    }
    override def listDirs(dir: Path): Seq[String] = {
      val prefix = key(dir) + "/"
      keys().collect {
        case k if k.startsWith(prefix) && k.stripPrefix(prefix).contains("/") =>
          k.stripPrefix(prefix).takeWhile(_ != '/')
      }.distinct
    }
    override def delete(path: Path): Unit = {
      Files.deleteIfExists(obj(path)); ()
    }
    override def deleteTree(dir: Path): Unit = {
      val prefix = key(dir) + "/"
      keys().filter(_.startsWith(prefix))
        .foreach(k => Files.deleteIfExists(bucket.resolve(enc(k))))
      Files.deleteIfExists(obj(dir)); ()
    }
    override def mkdirs(dir: Path): Unit = ()
  }

  /** In-memory implementation — a CAS map, i.e. the conditional-put
    * model of an object store, with directories implied by key
    * prefixes (exactly as object stores imply them). One instance =
    * one isolated "store"; share it across handles of the same
    * table. */
  final class InMemory extends GraftFileIO {
    private val store =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    private def key(p: Path): String = p.toAbsolutePath.normalize.toString

    override def readString(path: Path): String = {
      val v = store.get(key(path))
      if (v == null)
        throw new java.nio.file.NoSuchFileException(path.toString)
      v
    }
    override def publishAtomic(path: Path, content: String): Boolean =
      store.putIfAbsent(key(path), content) == null
    override def exists(path: Path): Boolean = store.containsKey(key(path))
    override def list(dir: Path): Seq[String] = {
      val prefix = key(dir) + "/"
      store.keySet.asScala.toSeq.collect {
        case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains("/") =>
          k.stripPrefix(prefix)
      }
    }
    override def listDirs(dir: Path): Seq[String] = {
      val prefix = key(dir) + "/"
      store.keySet.asScala.toSeq.collect {
        case k if k.startsWith(prefix) && k.stripPrefix(prefix).contains("/") =>
          k.stripPrefix(prefix).takeWhile(_ != '/')
      }.distinct
    }
    override def delete(path: Path): Unit = { store.remove(key(path)); () }
    override def deleteTree(dir: Path): Unit = {
      val prefix = key(dir) + "/"
      store.keySet.asScala.filter(_.startsWith(prefix))
        .foreach(store.remove)
      store.remove(key(dir)); ()
    }
    override def mkdirs(dir: Path): Unit = ()
  }
}
