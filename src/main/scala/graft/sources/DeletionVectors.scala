package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, col, lit, not, regexp_replace}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PERSISTED DELETION VECTORS — the compact position-delete encoding
  * (Iceberg v3 deletion vectors / Delta DVs, in spirit): one small
  * binary blob per delete COMMIT holding, per referenced data file,
  * its sorted deleted row indexes. Compared to the parquet
  * `(file_path, pos)` row encoding this removes the per-row columnar
  * framing (a DV of a few thousand positions is one buffer read, no
  * footer/row-group machinery) and — the real win — lets the READ
  * side drop the anti-JOIN entirely: positions load into sorted
  * arrays and each scanned row pays one binary search inside
  * whole-stage codegen ([[DvDeleted]]), no shuffle, no per-batch
  * hash-table build.
  *
  * Wire format (`*.dv`, version tag in the magic):
  * {{{
  *   int32  magic 'G''D''V''1'
  *   int32  nFiles
  *   repeat nFiles times:
  *     int32  pathLen, UTF-8 path bytes   (the manifest's data-file path)
  *     int64  nPos
  *     int64 × nPos ascending positions
  * }}}
  * Plain big-endian java.io framing: the blobs are control-plane-small
  * (8 B/position) and write-once; successive delete commits marking
  * the same data file stay DISJOINT by the delete-aware-marking
  * invariant, so multi-blob merge is concat + sort.
  *
  * Manifest integration is free: a DV registers as an ordinary
  * [[DeleteFile]] (path, bytes, per-file counts) — expire / orphan
  * GC / metadata tables / commit guards all key on path and counts
  * and never open the blob. Readers dispatch on the `.dv` suffix;
  * parquet-encoded position deletes from older commits keep their
  * anti-join path, and the two forms coexist in one snapshot.
  */
private[sources] object DeletionVectors {

  private val Magic = 0x47445631 // 'G' 'D' 'V' '1'

  def isVector(path: String): Boolean = path.endsWith(".dv")

  /** Serialize one delete commit's marks (positions need not arrive
    * sorted; they are sorted here, once, at write). */
  def write(path: Path, marks: collection.Map[String, Array[Long]]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(path)))
    try {
      out.writeInt(Magic)
      out.writeInt(marks.size)
      marks.toSeq.sortBy(_._1).foreach { case (p, ps) =>
        val pb = p.getBytes(StandardCharsets.UTF_8)
        out.writeInt(pb.length)
        out.write(pb)
        val sorted = ps.sorted
        out.writeLong(sorted.length.toLong)
        sorted.foreach(out.writeLong)
      }
    } finally out.close()
  }

  /** Decode one blob: data-file path → ascending positions. */
  def read(path: String): Map[String, Array[Long]] = {
    val in = new DataInputStream(new BufferedInputStream(
      Files.newInputStream(Paths.get(path))))
    try {
      require(in.readInt() == Magic, s"$path is not a graft deletion vector")
      val n = in.readInt()
      (0 until n).map { _ =>
        val pb = new Array[Byte](in.readInt())
        in.readFully(pb)
        val cnt = in.readLong()
        val ps = new Array[Long](cnt.toInt)
        var i = 0
        while (i < ps.length) { ps(i) = in.readLong(); i += 1 }
        new String(pb, StandardCharsets.UTF_8) -> ps
      }.toMap
    } finally in.close()
  }

  /** One data file's positions from one blob — the executor-side read
    * ([[GraftReaderFactory]] partitions ship (dv path, data path));
    * non-matching sections skip without materializing. */
  def readFor(dvPath: String, dataPath: String): Array[Long] = {
    val in = new DataInputStream(new BufferedInputStream(
      Files.newInputStream(Paths.get(dvPath))))
    try {
      require(in.readInt() == Magic, s"$dvPath is not a graft deletion vector")
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val pb = new Array[Byte](in.readInt())
        in.readFully(pb)
        val cnt = in.readLong()
        if (new String(pb, StandardCharsets.UTF_8) == dataPath) {
          val ps = new Array[Long](cnt.toInt)
          var j = 0
          while (j < ps.length) { ps(j) = in.readLong(); j += 1 }
          return ps
        }
        var skip = cnt * 8L
        while (skip > 0) skip -= in.skip(skip)
        i += 1
      }
      Array.emptyLongArray
    } finally in.close()
  }

  /** Load + merge several blobs (positions across commits are disjoint
    * per file — concat + sort is the exact union). */
  def readAll(paths: Seq[String]): java.util.HashMap[String, Array[Long]] = {
    val acc = new java.util.HashMap[String, Array[Long]]()
    paths.foreach(p => read(p).foreach { case (f, ps) =>
      val prev = acc.get(f)
      acc.put(f, if (prev == null) ps else (prev ++ ps).sorted)
    })
    acc
  }

  /** Filter `df`'s DV-marked rows away in-plan: the df must carry
    * [[LogTable.FileCol]] (scan-URI rendering) and [[LogTable.PosCol]];
    * the vectors ride the serialized plan to executors and each row
    * pays one codegen'd binary search — no join, no shuffle. */
  def filterDeleted(df: DataFrame,
      vectors: java.util.HashMap[String, Array[Long]]): DataFrame = {
    // FileCol carries the scan's URI rendering ("file:///abs/…"); the
    // manifest records plain paths — same normalization as the
    // equality-delete seq map join
    val norm = regexp_replace(col(LogTable.FileCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    val deleted = GraftBridge.column(DvDeleted(vectors,
      GraftBridge.expression(norm),
      GraftBridge.expression(col(LogTable.PosCol))))
    // null-parity with left_anti: a null (file, pos) key matches no
    // delete and the row SURVIVES
    df.filter(not(coalesce(deleted, lit(false))))
  }

  /** Complement of [[filterDeleted]]: KEEP exactly the DV-marked rows.
    * The CDC fast path's "what did this commit delete" read — same
    * codegen'd binary search, same normalization, inverted verdict
    * (null keys match no delete and are dropped). */
  def keepDeleted(df: DataFrame,
      vectors: java.util.HashMap[String, Array[Long]]): DataFrame = {
    val norm = regexp_replace(col(LogTable.FileCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    val deleted = GraftBridge.column(DvDeleted(vectors,
      GraftBridge.expression(norm),
      GraftBridge.expression(col(LogTable.PosCol))))
    df.filter(coalesce(deleted, lit(false)))
  }
}

/** `(path, pos) ∈ vectors` — one plan-resident binary search per row,
  * inside whole-stage codegen. The vector map is a plan reference
  * (serialized once per task, like any literal); budget-gated by the
  * caller exactly as the broadcast anti-join it replaces. */
private[sources] final case class DvDeleted(
    vectors: java.util.HashMap[String, Array[Long]],
    left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dv_deleted expects (STRING, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_deleted"

  override protected def nullSafeEval(p: Any, q: Any): Any = {
    val arr = vectors.get(p.asInstanceOf[UTF8String].toString)
    arr != null &&
      java.util.Arrays.binarySearch(arr, q.asInstanceOf[Long]) >= 0
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dvs", vectors, "java.util.HashMap")
    val arr = ctx.freshName("dvArr")
    nullSafeCodeGen(ctx, ev, (p, q) =>
      s"""
         |long[] $arr = (long[]) $mapRef.get($p.toString());
         |${ev.value} = $arr != null &&
         |  java.util.Arrays.binarySearch($arr, $q) >= 0;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
