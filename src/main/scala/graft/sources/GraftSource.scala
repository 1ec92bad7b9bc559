package graft.sources

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Coalesce, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import java.util
import scala.jdk.CollectionConverters._

/** DataSource-v2 provider for [[LogTable]] — `format("graft")`.
  *
  * The READ half of the reference's continuous pipeline as a
  * FIRST-CLASS Spark source (reference README.md:191-212: commits land
  * every flush interval and the table is consumed continuously):
  *
  *   - `spark.readStream.format("graft").load(root)` — a
  *     [[MicroBatchStream]] whose OFFSET IS THE MANIFEST VERSION. Each
  *     micro-batch is exactly the rows appended in `(start, end]`
  *     versions, planned straight off manifest metadata (one
  *     InputPartition per appended data file, zero data I/O to plan).
  *     Offsets live in Spark's own offset log, so checkpoint restart,
  *     triggers (incl. AvailableNow), watermarks, and downstream
  *     stateful ops all compose. Same maintenance contract as
  *     [[LogTable.readAppends]]: row-preserving rewrites (compact /
  *     recluster) contribute nothing, row-changing operations
  *     (delete / update / merge) fail the stream loudly at the
  *     maintenance boundary.
  *   - `spark.read.format("graft").load(root)` — a batch scan of the
  *     current snapshot; `option("versionAsOf", v)` /
  *     `option("timestampAsOf", epochMs)` time travel. MERGE-ON-READ
  *     snapshots read correctly: each partition carries its
  *     referencing position-delete files (manifest metadata) and the
  *     executor skips the marked row indexes ([[GraftMorReaders]]).
  *
  * The executor-side reader is Spark's OWN vectorized parquet reader
  * (`ParquetFileFormat.buildReaderWithPartitionValues`, built once on
  * the driver), so scan performance is identical to a native parquet
  * scan; a per-file [[UnsafeProjection]] layers the LogTable schema
  * semantics on top: hive-partition values materialize from manifest
  * metadata (they are directory layout, not file data) and renamed
  * fields coalesce their historical physical names — byte-for-byte the
  * DataFrame path's behavior.
  *
  * Streaming options: `startingVersion` = `<n>` (default 0 = the whole
  * table as the first batch) or `latest` (only commits after stream
  * start).
  *
  * The WRITE half is symmetric:
  *
  *   - `df.write.format("graft").mode(...).save(root)` — all four
  *     SaveModes; Overwrite is an atomic metadata-only file-list swap
  *     ([[LogTable.overwrite]]), never a COW scan. A fresh table takes
  *     its layout from `.partitionBy(...)` (identity hive columns)
  *     and/or `option("hiddenBy", "day(ts_us), bucket(16, id)")`
  *     (hidden transforms, GraftSql's partition-spec grammar); an
  *     existing table's manifest-recorded spec drives layout and a
  *     conflicting declared spec fails loudly.
  *   - `ds.writeStream.format("graft").start(root)` — an EXACTLY-ONCE
  *     streaming sink: each micro-batch appends under the tag
  *     `graft-sink-<batchId>`, so a replayed epoch (crash between
  *     sink commit and offset-log advance) is absorbed by the tag
  *     check instead of duplicating rows. OutputMode Append appends;
  *     Complete atomically overwrites with the batch's full result.
  *
  * Both halves route through LogTable's own commit machinery, so CHECK
  * constraints, schema validation/evolution, hidden layout derivation
  * and manifest stats hold for DataFrame-API writers too. */
final class GraftTableProvider extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "graft"

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft source needs the table root: .load(<path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val snap = GraftSourceUtil.snapshotFor(
      LogTable(SparkSession.active, rootOf(options)), options)
    // empty = no commits yet: write paths (fresh-table creation) need
    // the provider to resolve; READS of a schema-less table fail
    // loudly at scan creation (GraftTable.newScanBuilder)
    if (snap.schemaJson.isEmpty) new StructType()
    else {
      val base = LogTable.parseSchema(snap.schemaJson)
      // CDC reads surface the change tags as real columns
      if (options.getBoolean("readChanges", false))
        GraftCdcUtil.schemaWith(base)
      else base
    }
  }

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table =
    new GraftTable(properties.get("path"), schema)

  /** Open the write-target table: explicit layout options (+
    * `.partitionBy`) for fresh tables, the manifest-recorded spec
    * otherwise (LogTable.apply adopts it and rejects conflicts). */
  private def tableFor(spark: SparkSession, root: String,
      parameters: Map[String, String], partCols: Seq[String]): LogTable = {
    val params = CaseInsensitiveMap(parameters)
    val (optCols, optTrans) = params.get("hiddenBy")
      .orElse(params.get("partitioning"))
      .map(GraftSql.parsePartitionSpecs)
      .getOrElse((Nil, Nil))
    LogTable(spark, root,
      partitionBy = (partCols ++ optCols).distinct, hiddenBy = optTrans)
  }

  override def createRelation(sqlCtx: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode, parameters: Map[String, String],
      data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode._
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft write needs the table root: .save(<path>)"))
    val t = tableFor(sqlCtx.sparkSession, root, parameters,
      GraftBridge.partitioningColumns(parameters))
    val exists = t.currentVersion > 0L
    mode match {
      case ErrorIfExists if exists => throw new IllegalStateException(
        s"graft table at $root already exists (SaveMode.ErrorIfExists)")
      case Ignore if exists => ()
      case Overwrite => t.overwrite(data.toDF())
      case _ => t.append(data.toDF())
    }
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = sqlCtx
      override def schema: StructType = data.schema
    }
  }

  override def createSink(sqlCtx: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft sink needs the table root: .start(<path>)"))
    val complete =
      outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()
    require(complete ||
        outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft sink supports Append and Complete output modes, got $outputMode")
    // CDC mode: `option("upsertKey", <col>)` turns each micro-batch
    // into an EQUALITY UPSERT (tombstone + append, O(batch)) instead
    // of a plain append — a keyed changelog stream maintains the
    // latest-row-per-key table at ingest rate, exactly-once under the
    // same batch-id tags
    val upsertKey = CaseInsensitiveMap(parameters).get("upsertKey")
    require(upsertKey.isEmpty || !complete,
      "upsertKey composes with Append mode (Complete already replaces " +
        "the whole table per batch)")
    val spark = sqlCtx.sparkSession
    val table = tableFor(spark, root, parameters, partitionColumns)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def name(): String = s"graft.`$root`"
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit = {
        // pin the micro-batch on its own planned RDD (ForeachBatchSink's
        // trick) so the append below is a plain batch write
        val batch = GraftBridge.materializeBatch(data)
        val tag = s"graft-sink-$batchId"
        if (complete) table.overwrite(batch, tag = tag)
        else upsertKey match {
          case Some(k) => table.upsertEq(batch, k, tag = tag)
          case None => table.append(batch, tag = tag)
        }
        ()
      }
    }
  }
}

private[sources] object GraftSourceUtil {
  /** The `_file` METADATA COLUMN (Iceberg's name for the same thing):
    * the manifest path of the row's data file. Resolvable in any
    * query (`SELECT _file, * FROM t`) and the GROUP IDENTITY of the
    * row-level-operation seam — runtime group filtering narrows a
    * catalog UPDATE/MERGE/DELETE to the files that actually hold
    * matching rows by IN-filtering on it. A real data column of the
    * same name shadows it (Spark hides the metadata column; the
    * reader prefers the physical field). */
  val FileColName = "_file"

  /** The lineage a scan reads: the branch's (option "branch" — set by
    * branch handles) or main's. */
  def tableFor(t: LogTable, options: CaseInsensitiveStringMap): LogTable =
    if (t.isBranchHandle) t
    else Option(options.get("branch")).map(t.branch).getOrElse(t)

  /** Resolve the batch-read snapshot: branch > versionAsOf >
    * timestampAsOf > current. */
  def snapshotFor(t0: LogTable, options: CaseInsensitiveStringMap): Snapshot = {
    val t = tableFor(t0, options)
    val v = options.get("versionAsOf")
    val ts = options.get("timestampAsOf")
    if (v != null) t.snapshot(v.toLong)
    else if (ts != null) {
      val vs = t.versions.filter(x => t.snapshot(x).timestampMs <= ts.toLong)
      require(vs.nonEmpty, s"no snapshot committed at or before $ts")
      t.snapshot(vs.max)
    } else t.snapshot()
  }

  /** Physical scan schema: every logical field plus nullable twins
    * under its historical names (a pre-rename file stores the field's
    * values under an old name; each file supplies at most one). */
  def physicalSchema(logical: StructType): StructType =
    GraftBridge.asNullable(StructType(logical.flatMap { f =>
      // nested rename history widens the struct to its physical twin
      // (historical sibling fields; see LogTable.physicalType)
      val pdt = LogTable.physicalType(f.dataType)
      f.copy(dataType = pdt) +: LogTable.prevNames(f).map(p =>
        StructField(p, pdt, nullable = true))
    }))

  /** Rebuild a physically-read struct value back to its LOGICAL shape
    * after nested renames (the catalyst twin of
    * [[LogTable.renameFixCol]]): per renamed field, coalesce the
    * historical names from the physical twin struct; recurse; null
    * structs stay null. Identity for types without history. */
  def renameFixExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
      logical: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.catalyst.expressions.Expression = logical match {
    case st: StructType if LogTable.hasNestedRenames(st) =>
      import org.apache.spark.sql.catalyst.expressions.{Coalesce,
        CreateNamedStruct, Expression, GetStructField, If, IsNull, Literal}
      val ps = e.dataType.asInstanceOf[StructType]
      val entries = st.fields.toSeq.flatMap { f =>
        val names = f.name +: LogTable.prevNames(f)
        val gets: Seq[Expression] = names.map { n =>
          val i = ps.indexWhere(_.name.equalsIgnoreCase(n))
          GetStructField(e, i, Some(ps(i).name))
        }
        val picked = if (gets.size == 1) gets.head else Coalesce(gets)
        Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(f.name),
            org.apache.spark.sql.types.StringType),
          renameFixExpr(picked, f.dataType))
      }
      val rebuilt = CreateNamedStruct(entries)
      If(IsNull(e), Literal.create(null, rebuilt.dataType), rebuilt)
    case _ => e
  }

  /** Spark's own parquet reader for the physical schema — built ON THE
    * DRIVER (it broadcasts the Hadoop conf) and shipped to executors
    * inside the reader factory. `filters` reach parquet's row-group
    * statistics pruning (a column missing from a given file — a hive
    * partition column or a pre-rename physical name — simply drops out
    * of that file's predicate, never mis-filters). */
  def buildReadFunc(spark: SparkSession, phys: StructType,
      filters: Seq[Filter] = Nil): PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      GraftBridge.classicSession(spark),
      dataSchema = phys,
      partitionSchema = new StructType(),
      requiredSchema = phys,
      filters = filters,
      // rows, not ColumnarBatch: the PartitionReader contract here is
      // row-at-a-time (the vectorized reader still runs underneath and
      // hands rows off its column batches)
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = GraftBridge.hadoopConf(spark))

  /** The COLUMNAR plan for a snapshot's scan, or None when the row
    * path is required. Columnar hands Spark's vectorized parquet
    * batches through UNTOUCHED (partition values materialize as the
    * reader's own constant column vectors; the per-file "projection"
    * is an O(columns) vector reorder, not per-row work) — native
    * parquet scan speed through `format("graft")`. Requirements, each
    * checked here driver-side:
    *   - no rename history on the selected fields OR on any
    *     equality-delete key column (coalescing historical names is a
    *     per-row expression);
    *   - every equality-delete key column resolves in the manifest
    *     schema (pruned-away keys join the read schema as EXTRA
    *     vectors — read for matching, never output);
    *   - a UNIFORM layout: every file carries partition values for
    *     the same subset of the selected fields (mixed pre-/post-
    *     evolution layouts fall back to rows);
    *   - the parquet vectorized reader supports the schema
    *     (ParquetFileFormat.supportBatch).
    * Files under POSITION or EQUALITY deletes stay columnar: their
    * batches filter through the file's mark set — untouched batches
    * pass through zero-copy, marked batches rebuild survivors
    * ([[GraftReaderFactory.createColumnarReader]]). `readRaw` is the
    * UNFILTERED twin of `read` for position-deleted files — position
    * semantics are "row index within the file", so row-group pruning
    * under a pushed filter would shift positions and delete the
    * WRONG rows (equality matching is position-free and keeps the
    * filtered reader). */
  def columnarPlan(spark: SparkSession, logical: StructType,
      snap: Snapshot, filters: Seq[Filter]): Option[ColumnarPlan] = {
    if (logical.exists(f => LogTable.prevNames(f).nonEmpty ||
        LogTable.hasNestedRenames(f.dataType))) return None
    // equality-delete key columns must be readable and rename-free
    val eqCols = snap.eqDeletes.flatMap(_.cols).distinct
    val eqFields =
      if (eqCols.isEmpty) Nil
      else {
        if (snap.schemaJson.isEmpty) return None
        val full = LogTable.parseSchema(snap.schemaJson)
        val fs = eqCols.map(c =>
          full.fields.find(_.name.equalsIgnoreCase(c)))
        if (fs.exists(_.isEmpty)) return None
        if (fs.flatten.exists(f => LogTable.prevNames(f).nonEmpty)) return None
        fs.flatten
      }
    val layouts = snap.files.map(f =>
      logical.fieldNames.filter(n =>
        f.partitions.keys.exists(_.equalsIgnoreCase(n))).toSet).distinct
    if (layouts.size > 1) return None
    val partNames = layouts.headOption.getOrElse(Set.empty)
    val (partF, dataF) =
      logical.fields.partition(f => partNames.contains(f.name))
    // pruned-away key columns join the data read schema as extra
    // vectors (a key that is a partition column of the layout binds
    // from the partition value instead — never read from the file,
    // which does not store it)
    val extra = eqFields
      .filterNot(f => logical.fieldNames.exists(_.equalsIgnoreCase(f.name)))
      .filterNot(f => snap.files.forall(_.partitions.keys.exists(
        _.equalsIgnoreCase(f.name))))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    val dataS = StructType(dataF ++ extra)
    val partS = StructType(partF)
    val classic = GraftBridge.classicSession(spark)
    val fmt = new ParquetFileFormat()
    if (!fmt.supportBatch(classic, StructType(dataS.fields ++ partF))) return None
    // batch columns arrive as dataSchema ++ partitionSchema; map each
    // LOGICAL position to its vector index once, on the driver
    val reorder = logical.fields.map { f =>
      val di = dataS.fieldNames.indexOf(f.name)
      if (di >= 0) di else dataS.length + partS.fieldNames.indexOf(f.name)
    }
    def build(fs: Seq[Filter]) = fmt.buildReaderWithPartitionValues(
      classic,
      dataSchema = dataS,
      partitionSchema = partS,
      requiredSchema = dataS,
      filters = fs,
      options = Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "true"),
      hadoopConf = GraftBridge.hadoopConf(spark))
    Some(ColumnarPlan(partS, StructType(dataS.fields ++ partS.fields),
      reorder, build(filters),
      readRaw = if (snap.deletes.isEmpty) null else build(Nil)))
  }
}

/** Driver-planned columnar scan recipe ([[GraftSourceUtil
  * .columnarPlan]]): partition-column schema (for per-file constant
  * vectors), the FULL batch-row schema (data ++ extra eq-key ++
  * partition vectors — what delete-mark projections bind against),
  * the vector reorder to logical column order, the filtered batch
  * reader for clean files, and the unfiltered twin for
  * position-deleted files (null when the snapshot has none). */
private[sources] final case class ColumnarPlan(partS: StructType,
    batchS: StructType,
    reorder: Array[Int],
    read: PartitionedFile => Iterator[InternalRow],
    readRaw: PartitionedFile => Iterator[InternalRow])

/** `writable = true` (catalog-loaded tables, whose schema is always
  * manifest-known) additionally advertises batch-write capabilities,
  * so SQL `INSERT INTO` / `INSERT OVERWRITE` / CTAS plan through
  * Spark's own write operators and land in [[LogTable]]'s commit
  * machinery via the V1Write bridge. Path-based tables stay
  * read-only here — their writes route through the provider's
  * CreatableRelationProvider, which also handles fresh-table creation
  * and all four SaveModes.
  *
  * `pinnedVersion` (catalog time travel — `VERSION AS OF` /
  * `TIMESTAMP AS OF` resolve to it) pins every scan of this handle to
  * one snapshot: batch-read only, writes refused (writing "into the
  * past" is Iceberg's rollback, a different operation), and the
  * handle's schema is the SNAPSHOT's schema — a query over a
  * pre-evolution version sees that version's columns. */
private[sources] final class GraftTable(root: String, schema0: StructType,
    writable: Boolean = false, pinnedVersion: Option[Long] = None,
    branchName: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** Manifest TBLPROPERTIES surfaced through the DSv2 Table seam —
    * `SHOW TBLPROPERTIES cat.ns.t` and DESCRIBE EXTENDED read the
    * same map the Scala API and ALTER TABLE SET TBLPROPERTIES write. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    LogTable(org.apache.spark.sql.SparkSession.active, root)
      .properties.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** `_file` — resolvable in queries and the group identity of the
    * row-level seam below. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name: String = GraftSourceUtil.FileColName
      override def dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment: String = "manifest path of the row's data file"
    })

  /** Catalog SQL `UPDATE` / `MERGE INTO` / arbitrary-predicate
    * `DELETE` through Spark's OWN row-level planner (the last SQL seam
    * where this catalog previously diverged from Iceberg's Spark
    * integration): Spark rewrites the command into a group-based
    * ReplaceData over this table — scan the affected groups (with
    * static manifest pruning from the command condition, then runtime
    * group filtering down to files holding ACTUAL matches), apply the
    * command to their rows, and [[GraftRowLevelOperation]]'s write
    * commits the group swap through LogTable's machinery. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot modify $name — it is a time-travel handle pinned to a snapshot")
    require(branchName.isEmpty,
      s"row-level DML on branch handle $name is not supported — publish " +
        "the branch (CALL fast_forward) or use the Scala branch API")
    () => new GraftRowLevelOperation(root, schema0, info.command)
  }

  /** SQL `DELETE FROM t WHERE cond` through Spark's own planner: the
    * translated condition routes into [[LogTable.delete]]'s COW
    * machinery (only files holding matching rows rewritten, delete-
    * aware, CHECK-preserving). Conditions the v1 Filter algebra can't
    * express refuse here — Spark reports the unsupported delete
    * instead of this table guessing (complex predicates go through
    * LogTable.delete / GraftSql, which take arbitrary Columns). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinnedVersion.isEmpty && branchName.isEmpty &&
      GraftFilters.conjunction(filters.toSeq).nonEmpty
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val t = LogTable(SparkSession.active, root)
    // Iceberg's delete ladder: a condition that strictly selects whole
    // files (partition-scoped retention, the common shape) applies as
    // a manifest-only commit — zero data I/O; anything with a boundary
    // file falls through to the COW rewrite.
    if (!t.deleteMetadataOnly(filters.toSeq)) {
      val cond = GraftFilters.conjunction(filters.toSeq).getOrElse(
        throw new UnsupportedOperationException(
          s"cannot translate delete condition ${filters.mkString(" AND ")}"))
      t.delete(cond)
    }
    ()
  }
  /** SQL `TRUNCATE TABLE`: a COW delete-everything — the old snapshot
    * stays time-travelable, exactly as INSERT OVERWRITE's swap does. */
  override def truncateTable(): Boolean = {
    require(pinnedVersion.isEmpty, s"cannot truncate time-travel handle $name")
    require(branchName.isEmpty,
      s"cannot truncate branch handle $name — drop the branch instead")
    LogTable(SparkSession.active, root)
      .delete(org.apache.spark.sql.functions.lit(true))
    true
  }
  override def name(): String = (pinnedVersion, branchName) match {
    case (Some(v), _) => s"graft.`$root`@v$v"
    case (_, Some(b)) => s"graft.`$root`@branch-$b"
    case _ => s"graft.`$root`"
  }
  override def schema(): StructType = schema0
  /** The recorded partition spec, surfaced through Spark's own
    * metadata commands (`DESCRIBE TABLE` shows the layout a user's
    * filters should target). */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val t = LogTable(SparkSession.active, root)
    (t.partitionBy.map(Expressions.identity) ++ t.hiddenBy.map { tr =>
      tr.kind match {
        case "day" => Expressions.days(tr.source)
        case "hour" => Expressions.hours(tr.source)
        case "year" => Expressions.years(tr.source)
        case "month" => Expressions.months(tr.source)
        // mbucket IS the bucket a DSv2 consumer understands (the
        // murmur3 function the catalog serves under that name); the
        // legacy xxhash64 kind describes itself as xxbucket so the
        // two can never be confused as co-partitioned
        case "mbucket" => Expressions.bucket(tr.n.toInt, tr.source)
        case "bucket" => Expressions.apply("xxbucket",
          Expressions.literal(tr.n.toInt), Expressions.column(tr.source))
        case "truncate" => Expressions.apply("truncate",
          Expressions.literal(tr.n), Expressions.column(tr.source))
      }
    }).toArray
  }
  override def capabilities(): util.Set[TableCapability] =
    if (pinnedVersion.nonEmpty)
      util.EnumSet.of(TableCapability.BATCH_READ)
    else if (branchName.nonEmpty)
      // a branch handle reads its head and takes INSERT INTO (the
      // WAP write surface); maintenance/DML stay on main or the
      // Scala branch API
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)
    else if (writable)
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE)
    else
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot write to $name — it is a time-travel handle pinned to a " +
        "snapshot (to restore an old snapshot, CALL rollback)")
    new GraftWriteBuilder(root, branchName)
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(schema0.nonEmpty,
      s"LogTable at $root has no manifest-recorded schema — nothing has " +
        "been committed there yet (wrong path? pre-schema legacy table?)")
    val opts = (pinnedVersion, branchName) match {
      case (Some(v), _) =>
        val m = new util.HashMap[String, String](options)
        m.put("versionAsOf", v.toString)
        new CaseInsensitiveStringMap(m)
      case (None, Some(b)) =>
        val m = new util.HashMap[String, String](options)
        m.put("branch", b)
        new CaseInsensitiveStringMap(m)
      case _ => options
    }
    new GraftScanBuilder(root, schema0, opts)
  }
}

/** Column pruning + filter pushdown + metadata-aggregate pushdown for
  * the graft scan.
  *
  * `pruneColumns` narrows BOTH the logical output row and the physical
  * parquet read schema (a 2-column projection over a 40-column table
  * reads 2 columns, not 40 — at 100 TB this is the difference between
  * a column scan and a table scan). `pushFilters` keeps every filter
  * as a residual (file/row-group skipping is never exact), but uses
  * the conjunction for MANIFEST-LEVEL file skipping ([[GraftPrune]]:
  * column min/max stats, hive partition values, hidden-transform
  * derivation — the same arithmetic as LogTable.readRange/readPoint)
  * and hands it to Spark's parquet reader for row-group pruning.
  *
  * `pushAggregation` answers whole-table `COUNT(*)` / `MIN` / `MAX`
  * from MANIFEST ARITHMETIC alone ([[LogTable.countMeta]] semantics
  * through Spark's own pushdown seam): `SELECT COUNT(*) FROM t` — the
  * reference catalog's first query (reference README.md:128) — plans
  * as a one-row metadata scan, zero data files opened, at any scale.
  * Pushdown is all-or-nothing and EXACT-OR-REFUSE: count subtracts
  * live MoR delete marks; min/max answer only when every data file
  * carries footer stats for the column and no position delete is
  * outstanding ([[LogTable.minMaxMeta]]'s contract). Anything else —
  * filters, GROUP BY, other aggregates, non-INT64 columns — degrades
  * to the normal scan, never to a wrong answer. */
private[sources] final class GraftScanBuilder(root: String,
    fullSchema: StructType, options: CaseInsensitiveStringMap,
    rowLevel: Option[GraftRowLevelOperation] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  // map required names back to the table's own StructFields: the field
  // id / prev-name metadata MUST survive pruning or renamed columns
  // would lose their historical physical names in the scan
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var metaAgg: Option[(StructType, Array[Long])] = None
  private var limit: Option[Int] = None

  /** LIMIT pushdown, at FILE granularity: `SELECT ... LIMIT n` on a
    * 100 TB table should plan a handful of files, not the table — the
    * manifest's per-file row counts say when n rows are covered.
    * Partially pushed (Spark keeps its own Limit on top), and applied
    * only when no residual filter could thin the planned rows below
    * n ([[GraftBatch.planInputPartitions]] re-checks). */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  // both limit and top-n are FILE-level prunes — Spark's own operator
  // still applies the exact row bound (the diamond override is
  // required because both parent traits default this)
  override def isPartiallyPushed(): Boolean = true

  private var topN: Option[(String, Boolean, Boolean, Int)] = None

  /** TOP-N pushdown — the reference's HEADLINE query shape ("recent-N
    * by time desc", reference README.md:141-148) — again at FILE
    * granularity: `ORDER BY c [DESC] LIMIT n` keeps only the files
    * whose [min,max] range can reach the provable n-th value.
    * Accepted for a single LONG sort column; soundness around NULLs
    * comes from the manifest's per-file null counts (a file's
    * guaranteed supply of comparable values is rows - nulls) —
    * [[GraftBatch.planInputPartitions]] refuses when counts are
    * missing or nulls sort toward the head. Partially pushed: Spark's
    * own TakeOrdered still runs on the surviving files. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
    if (orders.length != 1) return false
    val o = orders(0)
    val col = o.expression() match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        fullSchema.fields.find(f => f.name.equalsIgnoreCase(r.fieldNames()(0))
          && f.dataType == org.apache.spark.sql.types.LongType).map(_.name)
      case _ => None
    }
    col match {
      case Some(c) =>
        val desc = o.direction() == SortDirection.DESCENDING
        val nullsFirst = o.nullOrdering() == NullOrdering.NULLS_FIRST
        topN = Some((c, desc, nullsFirst, l))
        true
      case None => false
    }
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val byName = fullSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    required = StructType(
      requiredSchema.fields.flatMap { f =>
        byName.get(f.name.toLowerCase).orElse {
          // the `_file` METADATA column (no physical twin — the reader
          // materializes it from the partition's own path)
          if (f.name.equalsIgnoreCase(GraftSourceUtil.FileColName))
            Some(StructField(GraftSourceUtil.FileColName,
              org.apache.spark.sql.types.StringType, nullable = false))
          else None
        }
      })
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftPrune.usable)
    filters // never exact: Spark re-applies everything post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = tryMetaAgg(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = tryMetaAgg(agg)

  private def tryMetaAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, NamedReference}
    import org.apache.spark.sql.types.LongType
    if (metaAgg.nonEmpty) return true // complete + push both ask; resolve once
    // residual filters would re-filter the already-aggregated row;
    // group-by needs per-group metadata the manifest doesn't keep
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return false
    val t = GraftSourceUtil.tableFor(
      LogTable(SparkSession.active, root), options)
    val snap = GraftSourceUtil.snapshotFor(t, options)
    // equality deletes tombstone by key — unanswerable from metadata
    if (snap.eqDeletes.nonEmpty) return false
    // a LONG column of the table, in the schema's own spelling (the
    // manifest's stats keys) — stats exist for INT64 columns only
    def longCol(e: V2Expr): Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        fullSchema.fields.find(f => f.name.equalsIgnoreCase(r.fieldNames()(0))
          && f.dataType == LongType).map(_.name)
      case _ => None
    }
    val resolved = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          snap.liveRows))
      case m: Min => longCol(m.column).flatMap(c =>
        t.minMaxMeta(c, snap.version).map { case (mn, _) =>
          (StructField(s"min_$c", LongType, nullable = true), mn) })
      case m: Max => longCol(m.column).flatMap(c =>
        t.minMaxMeta(c, snap.version).map { case (_, mx) =>
          (StructField(s"max_$c", LongType, nullable = true), mx) })
      case _ => None
    }
    // all-or-nothing: one unanswerable aggregate degrades the WHOLE
    // query to the normal scan (a half-pushed row would be wrong)
    if (resolved.exists(_.isEmpty) || resolved.isEmpty) return false
    val (fields, values) = resolved.flatten.unzip
    metaAgg = Some((StructType(fields), values.toArray))
    true
  }

  override def build(): Scan = metaAgg match {
    case Some((schema, values)) if rowLevel.isEmpty =>
      new GraftMetaAggScan(root, schema, values)
    case _ => new GraftScan(root, required, options, pushed,
      if (rowLevel.isEmpty) limit else None,
      if (rowLevel.isEmpty) topN else None, rowLevel)
  }
}

/** A pushed metadata aggregate as a one-row scan: the values were
  * already resolved from manifest arithmetic on the driver — the
  * "scan" ships them as a single InternalRow. Zero data I/O. */
private[sources] final class GraftMetaAggScan(root: String,
    schema: StructType, values: Array[Long]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft $root metadata-aggregate [${schema.fieldNames.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftMetaAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMetaAggReaderFactory
}

private[sources] final case class GraftMetaAggPartition(values: Array[Long])
    extends InputPartition

private[sources] final class GraftMetaAggReaderFactory
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val vs = p.asInstanceOf[GraftMetaAggPartition].values
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          vs.map(v => v: Any))
      override def close(): Unit = ()
    }
  }
}

/** RUNTIME FILTERING (Spark's dynamic partition pruning, v2 seam):
  * the scan reports which columns manifest pruning gets leverage from
  * — identity partition columns, hidden-transform sources, columns
  * with recorded file stats — and Spark injects the build side of a
  * broadcast join as an IN filter at execution time. `filter()`
  * re-prunes the file list with it, so a star join `fact ⋈ dim WHERE
  * dim.selective` scans only the fact files whose manifest metadata
  * can match the dim keys that survived — at 100 TB this is the
  * difference between scanning one partition and scanning the table,
  * decided at runtime with zero user hints. */
private[sources] final class GraftScan(root: String, schema: StructType,
    options: CaseInsensitiveStringMap, pushed: Array[Filter],
    limit: Option[Int] = None,
    topN: Option[(String, Boolean, Boolean, Int)] = None,
    rowLevel: Option[GraftRowLevelOperation] = None) extends Scan
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  @volatile private var runtime: Array[Filter] = Array.empty
  /** Runtime GROUP filter (row-level operations): the exact data files
    * holding rows the command matches, delivered as `_file IN (...)`
    * by Spark's RowLevelOperationRuntimeGroupFiltering subquery. */
  @volatile private var fileSet: Option[Set[String]] = None

  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft $root, PushedFilters: [${pushed.mkString(", ")}], " +
      limit.map(l => s"PushedLimit: $l, ").getOrElse("") +
      topN.map { case (c, d, _, n) =>
        s"PushedTopN: $n BY $c${if (d) " DESC" else ""}, " }.getOrElse("") +
      s"ReadSchema: ${schema.catalogString}"

  /** Manifest-accurate scan statistics, AFTER file pruning with the
    * pushed filters: Spark's planner sees the bytes/rows the scan will
    * actually read, so a filtered fact slice broadcasts when it truly
    * fits — at 100 TB the difference between a broadcast and a
    * sort-merge join is decided by THESE numbers, and a manifest
    * answers them without opening a file. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val snap = GraftSourceUtil.snapshotFor(
      LogTable(SparkSession.active, root), options)
    // prunedFiles: on a segmented snapshot, pointer-resident partition
    // summaries refute whole segments before their entries ever load
    val kept = snap.prunedFiles((pushed ++ runtime).toSeq)
    // position-delete marks subtract exactly per kept file (the same
    // arithmetic as Snapshot.liveRows): these numbers decide
    // broadcast-vs-sort-merge, so an overstated MoR table could push a
    // genuinely broadcastable side over the threshold. Equality
    // tombstones have unknowable match counts — left in (conservative
    // overestimate, never an understatement that could mis-broadcast).
    val marks = snap.deletes.flatMap(_.counts)
      .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).sum }
    val liveRows = kept.map(f =>
      math.max(0L, f.rows - marks.getOrElse(f.path, 0L))).sum
    // PER-COLUMN stats for the CBO: distinct counts from the manifest's
    // analyze-computed NDVs (capped at the scan's own row estimate —
    // pruning can only shrink cardinality) and null counts summed from
    // per-file footer stats when EVERY kept file reports the column.
    // With these, a 3-way join plans by key cardinality instead of
    // running blind (Iceberg surfaces puffin NDVs the same way).
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    schema.fields.foreach { f =>
      val ndv = snap.ndvs.get(f.name.toLowerCase)
        .map(n => math.min(n, liveRows))
      val nulls =
        if (kept.nonEmpty && kept.forall(_.nulls.exists(
            _._1.equalsIgnoreCase(f.name))))
          Some(kept.map(k => k.nulls.find(
            _._1.equalsIgnoreCase(f.name)).get._2).sum)
        else None
      if (ndv.nonEmpty || nulls.nonEmpty)
        colStats.put(
          org.apache.spark.sql.connector.expressions.Expressions.column(f.name),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              ndv.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
            override def nullCount(): java.util.OptionalLong =
              nulls.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
          })
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(kept.map(_.bytes).sum)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(liveRows)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }
  /** STORAGE-PARTITIONED JOINS: report the table's layout as
    * `KeyGroupedPartitioning` so Spark joins two graft tables with the
    * same layout of the join key partition-by-partition — no exchange
    * on either side. Resolved once; [[toBatch]] hands the SAME layout
    * to split planning, so the reported keys and the per-partition
    * `partitionKey()` rows can never disagree (a racing evolveSpec
    * between the two calls fails loudly at key-row build instead).
    * Row-level scans skip the report: their one consumer is a group
    * rewrite, and a stale claim there rewrites wrong groups. CDC
    * scans skip it too: their partitions are change/replay reads (no
    * per-partition key rows), so a layout claim would make Spark sort
    * partitions by a key that is not there. */
  private lazy val spjLayout: Option[SpjLayout] =
    if (rowLevel.nonEmpty || options.getBoolean("readChanges", false)) None
    else SpjLayout.of(GraftSourceUtil.snapshotFor(
      LogTable(SparkSession.active, root), options))

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjLayout match {
      case Some(l) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(l.keys, l.numPartitions)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  override def toBatch: Batch =
    if (options.getBoolean("readChanges", false))
      new GraftCdcBatch(root, schema, options, pushed ++ runtime)
    else
      new GraftBatch(root, schema, options, pushed ++ runtime, limit, topN,
        fileSet, rowLevel, spjLayout)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    if (options.getBoolean("readChanges", false))
      new GraftCdcMicroBatchStream(root, schema, options, pushed)
    else new GraftMicroBatchStream(root, schema, options, pushed)

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    // a ROW-LEVEL scan filters on GROUP IDENTITY alone: Spark's
    // runtime group filter builds ONE IN-filter over exactly these
    // attributes, so advertising anything beyond `_file` would turn it
    // into an untranslatable struct-IN and kill the narrowing
    if (rowLevel.nonEmpty)
      return Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(GraftSourceUtil.FileColName))
    val snap = GraftSourceUtil.snapshotFor(
      LogTable(SparkSession.active, root), options)
    // the union of range-stats columns answers from the pointer's
    // ReadMeta when present — advertising runtime-filter leverage must
    // not force a million-file segmented list to materialize
    val statCols = snap.readMeta.map(_.statsCols).getOrElse(
      snap.files.flatMap(f => f.ranges.keys ++ f.strRanges.keys))
    val leveraged =
      (snap.partCols ++ snap.transforms.map(_.source) ++ statCols).distinct
    leveraged
      .filter(c => schema.fieldNames.exists(_.equalsIgnoreCase(c)))
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  }
  override def filter(filters: Array[Filter]): Unit = {
    val (fileFs, rest) = filters.partition {
      case In(c, _) => c.equalsIgnoreCase(GraftSourceUtil.FileColName)
      case _ => false
    }
    runtime = rest.filter(GraftPrune.usable)
    if (fileFs.nonEmpty) {
      // conjunction of IN-lists → set intersection; values normalize
      // scheme-prefixed URIs back to manifest (plain-path) spelling
      val sets = fileFs.map { case In(_, vs) =>
        vs.flatMap(Option(_)).map(v => LogTable.localPath(v.toString)).toSet }
      fileSet = Some(sets.reduce(_ intersect _))
    }
  }
}

/** v1 `Filter` → `Column` translation for the SQL row-level seams
  * (`DELETE FROM` / `TRUNCATE` through the catalog): the translated
  * predicate routes into [[LogTable]]'s COW machinery. Exact-or-None —
  * an untranslatable filter refuses the SQL path loudly instead of
  * guessing. */
private[sources] object GraftFilters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}

  def toColumn(f: Filter): Option[Column] = f match {
    case _: org.apache.spark.sql.sources.AlwaysTrue => Some(lit(true))
    case _: org.apache.spark.sql.sources.AlwaysFalse => Some(lit(false))
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isInCollection(vs.toSeq.map(lit(_))))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case StringContains(c, v) => Some(col(c).contains(v))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(x) => toColumn(x).map(!_)
    case _ => None
  }

  /** The conjunction, or None if ANY member is untranslatable. */
  def conjunction(fs: Seq[Filter]): Option[Column] =
    if (fs.isEmpty) Some(lit(true))
    else {
      val cs = fs.map(toColumn)
      if (cs.exists(_.isEmpty)) None else Some(cs.flatten.reduce(_ && _))
    }
}

/** A small driver-resolved table (catalog METADATA tables —
  * `cat.ns.t.history` and friends): the rows are computed from
  * manifest metadata at load time and served through Spark's
  * [[org.apache.spark.sql.connector.read.LocalScan]], which plans
  * them as a LocalRelation — no executors touched. */
private[sources] final class GraftLocalTable(name0: String,
    df: org.apache.spark.sql.DataFrame) extends Table with SupportsRead {
  private val schema1 = df.schema
  private val data = GraftBridge.collectRows(df)
  override def name(): String = name0
  override def schema(): StructType = schema1
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def rows(): Array[InternalRow] = data
          override def readSchema(): StructType = schema1
          override def description(): String = s"graft metadata $name0"
        }
    }
}

/** Conservative manifest-metadata file skipping: a file is dropped
  * ONLY when a pushed filter PROVES no row in it can match — via the
  * manifest's per-file long ranges, ASCII string ranges, hive
  * partition values, or a hidden transform's derived directory key
  * (bucket prunes equality; monotonic transforms prune ranges, the
  * same truncation-monotonicity argument as [[Transform.derive]]).
  * Anything unrecognized keeps the file — degrade to "scan", never to
  * a wrong skip. */
private[sources] object GraftPrune {
  private val NullDir = "__HIVE_DEFAULT_PARTITION__"

  /** Filters the pruner can get leverage from (what we report pushed). */
  def usable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: In => true
    case And(l, r) => usable(l) || usable(r)
    case Or(l, r) => usable(l) && usable(r)
    case _ => false
  }

  def filesFor(files: Seq[DataFile], transforms: Seq[Transform],
      filters: Seq[Filter]): Seq[DataFile] =
    files.filter(f => filters.forall(mayMatch(f, transforms, _)))

  /** Per-SEGMENT conservative refutation over a pointer-resident
    * partition-value summary (see [[LogTable.segSummary]]). Soundness:
    * a recorded key lists the COMPLETE distinct value set of a
    * directory key EVERY file of the segment carries, so if EVERY
    * value in the set refutes the predicate under [[mayMatch]]'s
    * partition-value clause, every file of the segment is individually
    * refuted — the segment is skipped WITHOUT loading its entries.
    * One surviving value keeps the segment (its files then prune
    * individually). Unrecorded keys, unrecognized filters, and
    * non-summarized segments (legacy bare-name pointers) always keep —
    * absence never prunes, the same degrade-to-scan contract as the
    * per-file pruner. */
  def segMayMatch(partVals: Map[String, Seq[String]], ts: Seq[Transform],
      filters: Seq[Filter]): Boolean =
    partVals.isEmpty || filters.forall(segFilterMayMatch(partVals, ts, _))

  private def segFilterMayMatch(pv: Map[String, Seq[String]],
      ts: Seq[Transform], flt: Filter): Boolean = flt match {
    case And(l, r) => segFilterMayMatch(pv, ts, l) && segFilterMayMatch(pv, ts, r)
    case Or(l, r) => segFilterMayMatch(pv, ts, l) || segFilterMayMatch(pv, ts, r)
    case In(c, vs) => vs.exists(v => segFilterMayMatch(pv, ts, EqualTo(c, v)))
    case EqualTo(c, v) => segCmpSurvives(pv, ts, c, v, 0)
    case GreaterThan(c, v) => segCmpSurvives(pv, ts, c, v, 1)
    case GreaterThanOrEqual(c, v) => segCmpSurvives(pv, ts, c, v, 2)
    case LessThan(c, v) => segCmpSurvives(pv, ts, c, v, -1)
    case LessThanOrEqual(c, v) => segCmpSurvives(pv, ts, c, v, -2)
    case _ => true
  }

  /** One comparison against one summary — the set-lifted mirror of
    * [[cmpSurvives]]'s partition-value and transform clauses (column
    * ranges have no segment-level analogue: they stay per-file). The
    * segment survives iff SOME recorded value could keep SOME file. */
  private def segCmpSurvives(pv: Map[String, Seq[String]],
      ts: Seq[Transform], col: String, v: Any, op: Int): Boolean = {
    val lv = asLong(v)
    // 1. direct directory key (hive partition column)
    pv.find(_._1.equalsIgnoreCase(col)).forall { case (_, vals) =>
      vals.exists { x =>
        if (x == NullDir) false // a null value never survives a comparison
        else (lv, v) match {
          case (Some(n), _) => x.toLongOption.forall(p => opHolds(p, n, op))
          case (None, s: String) => opHoldsStr(x, s, op)
          case _ => true
        }
      }
    } &&
    // 2. hidden transforms over this source column whose derived
    // directory key is summarized — the same derive() arithmetic and
    // monotonicity rules as the per-file clause
    lv.forall(n => ts.filter(_.source.equalsIgnoreCase(col)).forall { t =>
      pv.get(t.colName) match {
        case Some(vals) => vals.exists { x =>
          if (x == NullDir) false
          else x.toLongOption.forall { d =>
            if (op == 0) d == t.derive(n)
            else if (t.monotonic) opHolds(d, t.derive(n), if (op > 0) 2 else -2)
            else true // bucket scrambles order: equality only
          }
        }
        case None => true // key not summarized for this segment: keep
      }
    }) &&
    // string point lookups through mbucket — the set-lifted mirror of
    // the per-file clause 5
    (v match {
      case s: String if op == 0 =>
        ts.filter(t => t.kind == "mbucket" &&
            t.source.equalsIgnoreCase(col)).forall { t =>
          pv.get(t.colName) match {
            case Some(vals) => vals.exists(x =>
              x != NullDir && x.toLongOption.forall(_ == t.deriveStr(s)))
            case None => true
          }
        }
      case _ => true
    })
  }

  private def asLong(v: Any): Option[Long] = v match {
    case x: Long => Some(x)
    case x: Int => Some(x.toLong)
    case x: Short => Some(x.toLong)
    case x: Byte => Some(x.toLong)
    // TIMESTAMP literals (both the legacy java.sql and java8 API
    // renderings a v1 Filter can carry) prune through monotonic
    // transforms as their µs-epoch value — the exact internal rep the
    // writer derived directory keys from, so derive() needs no
    // timestamp-specific arithmetic
    case x: java.sql.Timestamp =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(x))
    case x: java.time.Instant =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(x))
    case _ => None
  }

  /** All rows of `f` share its per-file partition values, so a
    * partition/transform directory key refutes a predicate for the
    * whole file; column ranges refute by [min, max] emptiness. */
  private def mayMatch(f: DataFile, ts: Seq[Transform], flt: Filter): Boolean =
    flt match {
      case And(l, r) => mayMatch(f, ts, l) && mayMatch(f, ts, r)
      case Or(l, r) => mayMatch(f, ts, l) || mayMatch(f, ts, r)
      case In(c, vs) => vs.exists(v => mayMatch(f, ts, EqualTo(c, v)))
      case EqualTo(c, v) => cmpSurvives(f, ts, c, v, 0)
      case GreaterThan(c, v) => cmpSurvives(f, ts, c, v, 1)
      case GreaterThanOrEqual(c, v) => cmpSurvives(f, ts, c, v, 2)
      case LessThan(c, v) => cmpSurvives(f, ts, c, v, -1)
      case LessThanOrEqual(c, v) => cmpSurvives(f, ts, c, v, -2)
      case _ => true
    }

  /** op: 0 = `= v`, 1 = `> v`, 2 = `>= v`, -1 = `< v`, -2 = `<= v`. */
  private def cmpSurvives(f: DataFile, ts: Seq[Transform], col: String,
      v: Any, op: Int): Boolean = {
    val lv = asLong(v)
    // 1. hive partition value: the column has ONE value for the file
    f.partitions.find(_._1.equalsIgnoreCase(col)).forall { case (_, pv) =>
      if (pv == NullDir) false // all-null column: no comparison matches
      else (lv, v) match {
        case (Some(n), _) => pv.toLongOption.forall(p => opHolds(p, n, op))
        case (None, s: String) => opHoldsStr(pv, s, op)
        case _ => true
      }
    } &&
    // 2. long column stats [min, max]
    lv.forall(n => f.ranges.find(_._1.equalsIgnoreCase(col)).forall {
      case (_, (mn, mx)) => op match {
        case 0 => n >= mn && n <= mx
        case 1 => mx > n
        case 2 => mx >= n
        case -1 => mn < n
        case -2 => mn <= n
      }
    }) &&
    // 3a. COMPLETE dictionary value sets (equality only): set-miss ⇒
    // provably no row matches — the file is skipped WITHOUT being
    // opened, one level earlier than its bloom filter could act.
    // Sound because dictionaries exclude nulls and `c = v` is
    // null-false; range ops stay with the [min,max] clauses.
    (v match {
      case s: String if op == 0 =>
        f.valueSets.find(_._1.equalsIgnoreCase(col)).forall(_._2.contains(s))
      case _ => true
    }) &&
    // 3. ASCII string stats (recorded only where byte and char order agree)
    (v match {
      case s: String => f.strRanges.find(_._1.equalsIgnoreCase(col)).forall {
        case (_, (mn, mx)) => op match {
          case 0 => s >= mn && s <= mx
          case 1 => mx > s
          case 2 => mx >= s
          case -1 => mn < s
          case -2 => mn <= s
        }
      }
      case _ => true
    }) &&
    // 4. hidden transforms over this source column
    lv.forall(n => ts.filter(_.source.equalsIgnoreCase(col)).forall { t =>
      f.partitions.get(t.colName) match {
        case Some(NullDir) => false // all-null source column
        case Some(dv) => dv.toLongOption.forall { d =>
          if (op == 0) d == t.derive(n)
          // range ops prune through MONOTONIC transforms only; a
          // bucket's hash scrambles order by construction
          else if (t.monotonic) opHolds(d, t.derive(n), if (op > 0) 2 else -2)
          else true
        }
        case None => true // file written under another spec: scan it
      }
    }) &&
    // 5. STRING point lookups through mbucket (Iceberg's bucket over
    // UTF-8 bytes — the doc-id/URL key shape): equality only, the
    // hash scrambles order
    (v match {
      case s: String if op == 0 =>
        ts.filter(t => t.kind == "mbucket" &&
            t.source.equalsIgnoreCase(col)).forall { t =>
          f.partitions.get(t.colName) match {
            case Some(NullDir) => false
            case Some(dv) => dv.toLongOption.forall(_ == t.deriveStr(s))
            case None => true
          }
        }
      case _ => true
    })
  }

  /** STRICT per-file verdict (the dual of [[mayMatch]], Iceberg's
    * metadata-delete eligibility test): `Some(true)` iff EVERY row of
    * `f` provably satisfies `flt`, `Some(false)` iff provably NO row
    * does, `None` when file metadata cannot decide — the caller then
    * falls back to a row-level rewrite. Decidable only from IDENTITY
    * partition values: a hive-partitioned file carries exactly one
    * value for the column, shared by all its rows, so a predicate on
    * that column evaluates file-wide. Column [min,max] ranges and
    * hidden transforms are deliberately NOT used here — they refute
    * (may-match) but cannot strictly AFFIRM every row, and a wrong
    * `Some(true)` silently deletes surviving rows, the worst failure
    * mode a table format has. Comparisons are null-false (SQL
    * three-valued logic): an all-null partition value strictly fails
    * every comparison and strictly passes IsNull. */
  def strictMatch(f: DataFile, ts: Seq[Transform], flt: Filter): Option[Boolean] = flt match {
    case And(l, r) => (strictMatch(f, ts, l), strictMatch(f, ts, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (strictMatch(f, ts, l), strictMatch(f, ts, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(inner) => strictMatch(f, ts, inner) match {
      case Some(true) => Some(false) // every row matches inner ⇒ none matches NOT
      // "no row matches inner" inverts to "every row matches NOT inner"
      // only under TWO-valued logic. A NULL row fails BOTH `c = v` and
      // `NOT (c = v)` (SQL three-valued logic), so the affirmative flip
      // is sound only when every column `inner` references is provably
      // null-free for this file — Iceberg's strict evaluator consults
      // null counts for notEq/notIn the same way. An all-null partition
      // (NullDir) must NOT strictly match `c <> v`.
      case Some(false) =>
        if (inner.references.forall(c =>
              strictNullness(f, ts, c).contains(false))) Some(true)
        else None
      case None => None
    }
    case In(c, vs) =>
      val verdicts = vs.toSeq.map(v => strictMatch(f, ts, EqualTo(c, v)))
      if (verdicts.contains(Some(true))) Some(true)
      else if (verdicts.forall(_.contains(false))) Some(false)
      else None
    case IsNull(c) => strictNullness(f, ts, c)
    case IsNotNull(c) => strictNullness(f, ts, c).map(!_)
    case EqualTo(c, v) => strictCmp(f, ts, c, v, 0)
    case EqualNullSafe(c, v) =>
      if (v == null) strictNullness(f, ts, c) else strictCmp(f, ts, c, v, 0)
    case GreaterThan(c, v) => strictCmp(f, ts, c, v, 1)
    case GreaterThanOrEqual(c, v) => strictCmp(f, ts, c, v, 2)
    case LessThan(c, v) => strictCmp(f, ts, c, v, -1)
    case LessThanOrEqual(c, v) => strictCmp(f, ts, c, v, -2)
    case _ => None
  }

  private def partVal(f: DataFile, col: String): Option[String] =
    f.partitions.find(_._1.equalsIgnoreCase(col)).map(_._2)

  /** Files group by directory tuple at write time, so a recorded key —
    * identity or derived — is all-null (`NullDir`) or null-free. */
  private def strictNullness(f: DataFile, ts: Seq[Transform],
      col: String): Option[Boolean] =
    partVal(f, col).map(_ == NullDir).orElse(
      ts.filter(_.source.equalsIgnoreCase(col)).iterator
        .flatMap(t => f.partitions.get(t.colName)).map(_ == NullDir)
        .nextOption())

  private def strictCmp(f: DataFile, ts: Seq[Transform], col: String, v: Any,
      op: Int): Option[Boolean] =
    if (v == null) Some(false) // comparisons against NULL are never true
    else partVal(f, col).flatMap { pv =>
      if (pv == NullDir) Some(false)
      else (asLong(v), v) match {
        case (Some(n), _) => pv.toLongOption.map(p => opHolds(p, n, op))
        case (None, s: String) => Some(opHoldsStr(pv, s, op))
        case _ => None
      }
    }.orElse(asLong(v).flatMap(n => strictViaTransforms(f, ts, col, n, op)))

  /** Strict verdicts through MONOTONIC hidden transforms: a file's
    * directory value `d` under hour/day/truncate bounds its source
    * column to an exact interval (trunc-toward-zero division, so the
    * bounds differ by sign), and a comparison whose literal clears the
    * interval decides for every row. This is what makes `DELETE WHERE
    * ts_us < <day boundary>` on a day-partitioned log table a
    * manifest-only operation. Buckets scramble order and never decide;
    * a truncate dir value that is not a multiple of its width is
    * treated as undecidable, never guessed. */
  private def strictViaTransforms(f: DataFile, ts: Seq[Transform],
      col: String, n: Long, op: Int): Option[Boolean] =
    ts.filter(t => t.monotonic && t.source.equalsIgnoreCase(col)).iterator
      .flatMap { t =>
        f.partitions.get(t.colName) match {
          case Some(NullDir) => Some(Some(false)) // all-null source column
          case Some(dv) => dv.toLongOption.map(d =>
            monoBounds(t, d).flatMap { case (lo, hi) =>
              strictRange(lo, hi, n, op) })
          case None => None // file predates this transform: undecidable
        }
      }
      .flatten.nextOption()

  /** Exact source-domain interval of one monotonic directory value.
    * `derive` is trunc-toward-zero `div`, so quotient q covers
    * [q·w, q·w + w-1] for q>0, [-(w-1), w-1] for q=0, and
    * [q·w - (w-1), q·w] for q<0. */
  private def monoBounds(t: Transform, d: Long): Option[(Long, Long)] = {
    // calendar ordinals (year/month) have exact variable-width
    // intervals: [first µs of the period, first µs of the next) - 1 —
    // floor-based on the whole domain, so no sign cases
    if (t.kind == "year" || t.kind == "month") {
      // ordinals whose period exceeds the µs-long domain are
      // undecidable, not an error (multiplyExact catches them)
      try {
        val (from, to) = t.kind match {
          case "year" =>
            (java.time.LocalDate.of(
              Math.toIntExact(Math.addExact(1970L, d)), 1, 1),
              java.time.LocalDate.of(
                Math.toIntExact(Math.addExact(1971L, d)), 1, 1))
          case _ =>
            val y = Math.toIntExact(
              Math.addExact(1970L, Math.floorDiv(d, 12L)))
            val m = Math.floorMod(d, 12L).toInt + 1
            val f = java.time.LocalDate.of(y, m, 1)
            (f, f.plusMonths(1))
        }
        return Some((Math.multiplyExact(from.toEpochDay, 86400000000L),
          Math.multiplyExact(to.toEpochDay, 86400000000L) - 1L))
      } catch {
        case _: ArithmeticException | _: java.time.DateTimeException =>
          return None
      }
    }
    val w = t.kind match {
      case "hour" => 3600000000L
      case "day" => 86400000000L
      case "truncate" => t.n
      case _ => return None
    }
    val q = t.kind match {
      case "truncate" => if (d % w != 0) return None else d / w
      case _ => d
    }
    val lo = if (q > 0) q * w else q * w - (w - 1)
    val hi = if (q < 0) q * w else q * w + (w - 1)
    Some((lo, hi))
  }

  /** Decide `col <op> n` when every row's `col` lies in [lo, hi]. */
  private def strictRange(lo: Long, hi: Long, n: Long,
      op: Int): Option[Boolean] = op match {
    case 0 =>
      if (n < lo || n > hi) Some(false)
      else if (lo == hi) Some(true)
      else None
    case 1 => if (lo > n) Some(true) else if (hi <= n) Some(false) else None
    case 2 => if (lo >= n) Some(true) else if (hi < n) Some(false) else None
    case -1 => if (hi < n) Some(true) else if (lo >= n) Some(false) else None
    case -2 => if (hi <= n) Some(true) else if (lo > n) Some(false) else None
    case _ => None
  }

  private def opHolds(x: Long, v: Long, op: Int): Boolean = op match {
    case 0 => x == v
    case 1 => x > v
    case 2 => x >= v
    case -1 => x < v
    case -2 => x <= v
  }
  /** String comparisons in Spark's collation: UTF8String compares raw
    * UTF-8 bytes (code-POINT order), while Java's `String.compareTo`
    * is UTF-16 code-UNIT order — the two disagree for supplementary
    * characters vs. U+E000..U+FFFF. strictCmp AFFIRMS verdicts, so
    * range ops must use the engine's own order, not the JVM's. */
  private def opHoldsStr(x: String, v: String, op: Int): Boolean = {
    lazy val c = org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(v))
    op match {
      case 0 => x == v
      case 1 => c > 0
      case 2 => c >= 0
      case -1 => c < 0
      case -2 => c <= 0
    }
  }
}

/** The batch-write half of a writable [[GraftTable]]: a [[V1Write]]
  * whose InsertableRelation appends (INSERT INTO) or atomically
  * overwrites (INSERT OVERWRITE / truncate) through [[LogTable]] — the
  * driver-side bridge keeps every table invariant (checks, schema
  * evolution, hidden layout, commit retries) in ONE code path instead
  * of duplicating the writer in executor-side DataWriters. */
private[sources] final class GraftWriteBuilder(root: String,
    branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var replace = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    replace = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
        new org.apache.spark.sql.sources.InsertableRelation {
          override def insert(data: org.apache.spark.sql.DataFrame,
              overwrite: Boolean): Unit = {
            val t0 = LogTable(SparkSession.active, root)
            // a branch handle commits to the BRANCH lineage — main's
            // readers see nothing until CALL fast_forward publishes
            val t = branch.map(t0.branch).getOrElse(t0)
            if (replace || overwrite) t.overwrite(data) else t.append(data)
            ()
          }
        }
    }
}

/** One appended data file = one InputPartition: split planning is
  * manifest metadata only. `parts` carries the file's hive-partition
  * values (directory layout, not file data); `deletes` the snapshot's
  * position-delete files referencing this data file as (path, bytes)
  * — also pure manifest metadata ([[DeleteFile.counts]] keys say which
  * data files a delete file touches without opening it). */
private[sources] final case class GraftInputPartition(path: String,
    bytes: Long, parts: Map[String, String],
    deletes: Seq[(String, Long)] = Nil,
    /** EQUALITY-delete files NEWER than this data file (seq guard
      * applied at planning) as (path, bytes, key columns): the
      * executor loads their key tuples and filters matching rows. */
    eqDels: Seq[(String, Long, Seq[String])] = Nil,
    /** This file's partition-key row for storage-partitioned joins —
      * set only when the scan reported `KeyGroupedPartitioning`
      * (Spark groups same-key partitions and aligns the join sides by
      * these rows); null on every other path, which never reads it. */
    pkey: InternalRow = null,
    /** INVERTED position semantics (the CDC replay of a MoR marking
      * commit): emit ONLY the rows at `deletes`' marked positions —
      * the rows that commit made invisible — instead of everything
      * else. Row path only; batch scans never set it. */
    selectDeleted: Boolean = false) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = pkey
}

/** Executor-side readers for MERGE-ON-READ snapshots, built only when
  * the planned snapshot carries position deletes: `raw` reads a data
  * file UNFILTERED — position semantics are "row index within the
  * file", so parquet row-group pruning under a pushed filter would
  * silently shift positions and delete the WRONG rows; dirty files
  * trade row-group skipping for correctness (Spark re-applies every
  * filter post-scan, and deletes are transient — compact folds them).
  * `del` reads the (file_path, pos) delete files themselves. */
private[sources] final case class GraftMorReaders(
    raw: PartitionedFile => Iterator[InternalRow],
    del: PartitionedFile => Iterator[InternalRow])

/** Stream offset = manifest version. */
private[sources] final case class GraftOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** CHANGE-DATA-CAPTURE planning, shared by the streaming tail and the
  * batch window scan (Delta CDF's read, derived from each commit's
  * SHAPE rather than its name): each manifest version in (from, to]
  * maps to per-FILE partitions tagged `_change_type` /
  * `_commit_version` —
  *
  *   - row-preserving maintenance (compact / recluster / metadata
  *     commits) → nothing;
  *   - MoR marking commits (mor-delete / mor-merge) → the NEW delete
  *     files' marked rows as 'delete' via inverted position reads
  *     (disjoint from prior marks — the marking scan is delete-aware),
  *     plus a mor-merge's appended post-images as 'insert';
  *   - any ONE-SIDED file-list change → pure adds (appends,
  *     append-only transaction publishes, restoring rollbacks) as
  *     'insert' under the new snapshot's delete context; pure drops
  *     (metadata-delete retention, zero-survivor COW, truncate,
  *     dropping rollbacks) as 'delete' under the PARENT's context
  *     (already-marked rows were never visible and are not
  *     re-announced).
  *
  * What refuses — loudly, pointing at the batch
  * [[LogTable.readCdc]] catch-up path: MIXED add+remove changes (a
  * rewrite copies surviving rows between files; per-file reads cannot
  * separate copies from changes), delete-context changes on KEPT
  * files, mark-file drops that are not the commit's own GC, tombstone
  * appearances (visibility flips with no file change), and
  * equality-tombstone context on emitted files (eq-key sets vary per
  * commit; a stream builds its reader factory once). The tags ride
  * the partition-value channel, so the executor projects them as
  * per-file constants — zero per-row work. */
private[sources] object GraftCdcUtil {
  val TypeCol = "_change_type"
  val VerCol = "_commit_version"

  /** Earliest `startingVersion` the table can still replay from:
    * replaying commit v reads manifests v AND v's parent, and
    * [[LogTable.expire]] deletes old manifests — so after the first
    * expire the floor is the oldest RETAINED manifest (its own parent
    * is gone; the first replayable commit is the one after it). A
    * never-expired table keeps manifest 1, whose parent is the
    * synthetic empty v0, so the floor stays 0 — full history. */
  def replayFloor(table: LogTable): Long =
    table.versions.headOption.map(h => if (h <= 1L) 0L else h).getOrElse(0L)

  def expiredError(root: String, asked: Long, floor: Long): Nothing =
    throw new LogTable.CdcHistoryExpiredException(
      s"CDC history before version $floor of $root has been expired " +
        s"(expire() removed the manifests a replay from $asked would " +
        s"read). Set startingVersion >= $floor, or re-read the current " +
        "table state and resume CDC from there.")

  def schemaWith(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      StructField(TypeCol, org.apache.spark.sql.types.StringType, nullable = false),
      StructField(VerCol, org.apache.spark.sql.types.LongType, nullable = false)))

  private val RowPreserving = Set("compact", "recluster", "set-check",
    "set-bloom", "set-sort", "set-props", "evolve-schema", "evolve-spec")

  def partitions(table: LogTable, from: Long, to: Long,
      pushed: Seq[Filter]): Seq[InputPartition] =
    ((from + 1) to to).flatMap { v =>
      val snap = table.snapshot(v)
      lazy val prev = table.snapshot(snap.parent)
      lazy val prevPaths = prev.files.map(_.path).toSet
      lazy val curPaths = snap.files.map(_.path).toSet
      def tag(f: DataFile, t: String) =
        f.partitions + (TypeCol -> t) + (VerCol -> v.toString)
      snap.operation match {
        // commit-time CHANGE FILES (write.cdc.enabled): the committing
        // COW delete/update/merge staged its exact pre/post-images, so
        // the otherwise-unrepresentable mixed rewrite replays as plain
        // file reads — change tags ride the constant channel, the
        // rows come straight from the change parquet (which stores
        // partition columns physically; no hive-dir reconstruction)
        case _ if snap.cdc.nonEmpty =>
          snap.cdc.map(cf => GraftInputPartition(cf.path, cf.bytes,
            Map(TypeCol -> cf.change, VerCol -> v.toString)): InputPartition)
        case op if RowPreserving.contains(op) => Nil
        case "append" =>
          GraftPrune.filesFor(
              snap.files.filterNot(f => prevPaths.contains(f.path)),
              snap.transforms, pushed)
            .map(f => GraftInputPartition(f.path, f.bytes,
              tag(f, "insert")): InputPartition)
        // MoR MARKING commits replay exactly: the NEW delete files'
        // marked positions are the rows this commit made invisible
        // (disjoint from every prior mark — the marking scan is
        // delete-aware), read back as 'delete' rows with inverted
        // position semantics; a mor-merge's appended post-image files
        // are its 'insert' half (an update = delete + insert, the
        // standard net-change encoding)
        case "mor-delete" | "mor-merge" =>
          val prevDelPaths = prev.deletes.map(_.path).toSet
          val newDels = snap.deletes.filterNot(d => prevDelPaths.contains(d.path))
          val marked = snap.files.filter(f =>
            newDels.exists(_.counts.contains(f.path)))
          val deletes = GraftPrune.filesFor(marked, prev.transforms, pushed)
            .map(f => GraftInputPartition(f.path, f.bytes, tag(f, "delete"),
              newDels.filter(_.counts.contains(f.path))
                .map(d => (d.path, d.bytes)),
              selectDeleted = true): InputPartition)
          val inserts = GraftPrune.filesFor(
              snap.files.filterNot(f => prevPaths.contains(f.path)),
              snap.transforms, pushed)
            .map(f => GraftInputPartition(f.path, f.bytes,
              tag(f, "insert")): InputPartition)
          deletes ++ inserts
        // A ROLLBACK never copies rows between files — its mixed
        // file-list change is EXACTLY representable at file
        // granularity: dropped files emit their prior live rows as
        // 'delete' (parent's delete context), restored files their
        // live rows as 'insert' (the rollback snapshot's context).
        // Sound only while KEPT files' visibility is untouched: their
        // position-mark reference sets must be identical across the
        // boundary and the equality-tombstone set unchanged (a
        // restored/retired mark or tombstone flips rows with no file
        // change) — else fall through to the refusal below.
        case "rollback" if {
          val kept = snap.files.filter(f => prevPaths.contains(f.path))
          def marksOn(dels: Seq[DeleteFile], p: String) =
            dels.filter(_.counts.contains(p)).map(_.path).toSet
          // SET comparison (matching marksOn below): a set-identical
          // but reordered tombstone manifest must not spuriously
          // refuse a perfectly representable rollback
          snap.eqDeletes.map(_.path).toSet == prev.eqDeletes.map(_.path).toSet &&
            kept.forall(f => marksOn(snap.deletes, f.path) ==
              marksOn(prev.deletes, f.path))
        } =>
          val removed = prev.files.filterNot(f => curPaths.contains(f.path))
          val added = snap.files.filterNot(f => prevPaths.contains(f.path))
          def eqGuard(ctx: Snapshot, f: DataFile, what: String): Unit =
            if (ctx.eqDeletes.exists(_.seq > f.seq))
              throw new IllegalStateException(
                s"streaming CDC cannot represent v$v ('rollback'): $what " +
                  s"file ${f.path} carries equality-tombstone context — " +
                  s"consume LogTable.readCdc(${v - 1}, ...) for the boundary")
          GraftPrune.filesFor(removed, prev.transforms, pushed).map { f =>
            eqGuard(prev, f, "dropped")
            val dels = prev.deletes.filter(_.counts.contains(f.path))
              .map(d => (d.path, d.bytes))
            GraftInputPartition(f.path, f.bytes, tag(f, "delete"),
              dels): InputPartition
          } ++
          GraftPrune.filesFor(added, snap.transforms, pushed).map { f =>
            eqGuard(snap, f, "restored")
            val dels = snap.deletes.filter(_.counts.contains(f.path))
              .map(d => (d.path, d.bytes))
            GraftInputPartition(f.path, f.bytes, tag(f, "insert"),
              dels): InputPartition
          }
        // ANY other commit is representable iff its file-list change
        // is ONE-SIDED — pure adds (an append-only transaction publish)
        // emit the added files' visible rows as 'insert'; pure drops
        // (metadata-delete retention, zero-survivor COW, truncate) emit
        // the removed files' prior live rows as 'delete'. A MIXED
        // change copies surviving rows between files (COW rewrite,
        // overwrite) and cannot be told apart from real changes without
        // row diffing — batch readCdc's job (or commit-time change
        // files, see the cdc case above). Delete-context guards: marks
        // on KEPT files must be unchanged (a restored/retired mark
        // flips visibility with no file change), dropped mark files may
        // only be the commit's own GC (all their references left), and
        // equality tombstones may only DIE (GC), never appear.
        case _ =>
          val added = snap.files.filterNot(f => prevPaths.contains(f.path))
          val removed = prev.files.filterNot(f => curPaths.contains(f.path))
          val prevDelPaths = prev.deletes.map(_.path)
          // set equality: a reordered-but-identical manifest list is the
          // same delete context (matches marksOn and the cdc case above)
          val posSame = snap.deletes.map(_.path).toSet == prevDelPaths.toSet
          val eqSame =
            snap.eqDeletes.map(_.path).toSet == prev.eqDeletes.map(_.path).toSet
          val eqGcOnly = snap.eqDeletes.map(_.path)
            .forall(p => prev.eqDeletes.exists(_.path == p)) &&
            snap.eqDeletes.size <= prev.eqDeletes.size
          val removedPaths = removed.map(_.path).toSet
          // dropped position-delete files must be GC of the dropped
          // data files; surviving ones must predate this commit
          val posGcOnly = snap.deletes.map(_.path)
            .forall(p => prevDelPaths.contains(p)) &&
            prev.deletes.filterNot(d => snap.deletes.exists(_.path == d.path))
              .forall(_.refPaths.forall(removedPaths.contains))
          def refuse(why: String): Nothing = throw new IllegalStateException(
            s"streaming CDC cannot represent v$v ('${snap.operation}'): $why " +
              s"— consume LogTable.readCdc(${v - 1}, ...) for the boundary " +
              "and restart the stream past it with startingVersion, or set " +
              s"table property ${LogTable.CdcEnabledProp}=true so future COW " +
              "commits stage replayable change files")
          if (added.nonEmpty && removed.nonEmpty)
            refuse("it both adds and removes files (a rewrite copies " +
              "surviving rows between files)")
          else if (added.nonEmpty) {
            if (!posSame || !eqSame)
              refuse("it changes delete context alongside added files")
            GraftPrune.filesFor(added, snap.transforms, pushed).map { f =>
              if (snap.eqDeletes.exists(_.seq > f.seq))
                refuse(s"added file ${f.path} carries equality-tombstone context")
              val dels = snap.deletes.filter(_.counts.contains(f.path))
                .map(d => (d.path, d.bytes))
              GraftInputPartition(f.path, f.bytes, tag(f, "insert"),
                dels): InputPartition
            }
          } else if (removed.nonEmpty) {
            if (!posGcOnly)
              refuse("it changes position-delete context on kept files")
            if (!eqGcOnly)
              refuse("it adds equality tombstones")
            GraftPrune.filesFor(removed, prev.transforms, pushed).map { f =>
              if (prev.eqDeletes.exists(_.seq > f.seq))
                refuse(s"dropped file ${f.path} carries equality-tombstone context")
              val dels = prev.deletes.filter(_.counts.contains(f.path))
                .map(d => (d.path, d.bytes))
              GraftInputPartition(f.path, f.bytes, tag(f, "delete"),
                dels): InputPartition
            }
          } else if (posSame && eqSame) Nil // metadata-only (analyze, …)
          else refuse("it changes row visibility with no file change " +
            "(equality/position tombstones)")
      }
    }
}

/** BATCH change-data-capture scan (Iceberg's changelog scan through
  * the DSv2 seam): `spark.read.format("graft")
  * .option("readChanges", true).option("startingVersion", a)
  * [.option("endingVersion", b)].load(root)` reads the net changes in
  * (a, b] — the same per-commit planner and reader as the streaming
  * tail, so the two surfaces can never drift. Defaults: the full
  * retained history (0, currentVersion]. */
private[sources] final class GraftCdcBatch(root: String,
    logical: StructType, options: CaseInsensitiveStringMap,
    pushed: Array[Filter]) extends Batch {
  private val spark = SparkSession.active
  private val table = LogTable(spark, root)
  private val physLogical = StructType(logical.fields.filterNot(f =>
    f.name.equalsIgnoreCase(GraftCdcUtil.TypeCol) ||
      f.name.equalsIgnoreCase(GraftCdcUtil.VerCol) ||
      f.name.equalsIgnoreCase(GraftSourceUtil.FileColName)))
  private val phys = GraftSourceUtil.physicalSchema(physLogical)

  override def planInputPartitions(): Array[InputPartition] = {
    val floor = GraftCdcUtil.replayFloor(table)
    // default window = the full RETAINED history: after expire() the
    // old (0, current] default is unplannable, so the open start
    // clamps to the earliest retained boundary; an EXPLICIT start
    // below it fails loudly instead of silently replaying less
    var from = Option(options.get("startingVersion")).map(_.toLong) match {
      case Some(s) if s < floor => GraftCdcUtil.expiredError(root, s, floor)
      case Some(s) => s
      case None => floor
    }
    var to = Option(options.get("endingVersion")).map(_.toLong)
      .getOrElse(table.currentVersion)
    // pushed `_commit_version` bounds narrow the PLANNING window —
    // whole commits are skipped instead of read-then-filtered, and a
    // `WHERE _commit_version > x` slice on the `.changes` handle (which
    // has no options surface) keeps working after expire() whenever x
    // clears the retained floor. Spark still re-applies every filter
    // post-scan, so tightening here is purely subtractive.
    def ver(a: Any): Option[Long] = a match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    pushed.foreach {
      case GreaterThan(c, v) if c.equalsIgnoreCase(GraftCdcUtil.VerCol) =>
        ver(v).foreach(n => from = math.max(from, n))
      case GreaterThanOrEqual(c, v) if c.equalsIgnoreCase(GraftCdcUtil.VerCol) =>
        ver(v).foreach(n => from = math.max(from, n - 1))
      case LessThan(c, v) if c.equalsIgnoreCase(GraftCdcUtil.VerCol) =>
        ver(v).foreach(n => to = math.min(to, n - 1))
      case LessThanOrEqual(c, v) if c.equalsIgnoreCase(GraftCdcUtil.VerCol) =>
        ver(v).foreach(n => to = math.min(to, n))
      case EqualTo(c, v) if c.equalsIgnoreCase(GraftCdcUtil.VerCol) =>
        ver(v).foreach { n => from = math.max(from, n - 1); to = math.min(to, n) }
      case _ => ()
    }
    GraftCdcUtil.partitions(table, from, math.max(from, to), pushed.toSeq).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(GraftSourceUtil.buildReadFunc(spark, phys),
      phys, logical,
      mor = Some(GraftMorReaders(
        GraftSourceUtil.buildReadFunc(spark, phys),
        GraftSourceUtil.buildReadFunc(spark, LogTable.DeleteSchema))))
}

/** The `cat.ns.t.changes` handle (Iceberg's changelog-table
  * convention): the table's full retained change history as a plain
  * batch relation — every SELECT pushes through [[GraftCdcBatch]].
  * Version windows stay on the options surface of `format("graft")`;
  * SQL slices with `WHERE _commit_version > x`. */
private[sources] final class GraftChangesTable(root: String,
    schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft changes $root"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val m = new util.HashMap[String, String](options)
    m.put("readChanges", "true")
    new GraftScanBuilder(root, schema0, new CaseInsensitiveStringMap(m))
  }
}

/** The CDC twin of [[GraftMicroBatchStream]]: offsets ARE manifest
  * versions, batches plan through [[GraftCdcUtil.partitions]]. */
private[sources] final class GraftCdcMicroBatchStream(root: String,
    logical: StructType, options: CaseInsensitiveStringMap,
    pushed: Array[Filter] = Array.empty)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val spark = SparkSession.active
  private val table = LogTable(spark, root)
  // the CDC tags have no physical twin — keep them (and `_file`) out
  // of the parquet read schema; the reader projects them from the
  // partition-value channel
  private val physLogical = StructType(logical.fields.filterNot(f =>
    f.name.equalsIgnoreCase(GraftCdcUtil.TypeCol) ||
      f.name.equalsIgnoreCase(GraftCdcUtil.VerCol) ||
      f.name.equalsIgnoreCase(GraftSourceUtil.FileColName)))
  private val phys = GraftSourceUtil.physicalSchema(physLogical)
  private lazy val readFunc = GraftSourceUtil.buildReadFunc(spark, phys)
  @volatile private var availableNowCap: Long = -1L
  private val maxVersions: Long =
    Option(options.get("maxVersionsPerTrigger")).map(_.toLong).getOrElse(0L)
  private val maxBytes: Long =
    Option(options.get("maxBytesPerTrigger")).map(_.toLong).getOrElse(0L)

  override def initialOffset(): Offset = {
    // a NEW stream's default start is the earliest RETAINED boundary
    // (not 0 — expire() may have deleted older manifests); an explicit
    // start below it fails here, at stream start, with the remedy,
    // instead of as a raw missing-manifest read in the first batch
    val floor = GraftCdcUtil.replayFloor(table)
    val sv = Option(options.get("startingVersion")).getOrElse(floor.toString)
    if (sv.equalsIgnoreCase("latest")) GraftOffset(table.currentVersion)
    else {
      val v = sv.toLong
      if (v < floor) GraftCdcUtil.expiredError(root, v, floor)
      GraftOffset(v)
    }
  }
  override def latestOffset(): Offset = GraftOffset(table.currentVersion)
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentVersion
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = GraftOffset(table.currentVersion)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftOffset].version
    var to = table.currentVersion
    if (availableNowCap >= 0L) to = math.min(to, availableNowCap)
    if (maxVersions > 0L) to = math.min(to, from + maxVersions)
    // byte-based admission, CDC-aware: a version's cost is the bytes
    // its change partitions would READ (added + dropped + marked
    // files) — manifest arithmetic via the same planner that will
    // plan the batch, so admission and planning can't disagree.
    // Always at least one version, or an oversized commit stalls the
    // tail. An unrepresentable commit throws here exactly as planning
    // would — same contract, discovered one call earlier.
    if (maxBytes > 0L && to > from) {
      var v = from
      var acc = 0L
      while (v < to && acc < maxBytes) {
        acc += GraftCdcUtil.partitions(table, v, v + 1, Nil)
          .map(_.asInstanceOf[GraftInputPartition].bytes).sum
        v += 1
      }
      to = v
    }
    GraftOffset(to)
  }
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftCdcUtil.partitions(table,
      start.asInstanceOf[GraftOffset].version,
      end.asInstanceOf[GraftOffset].version, pushed.toSeq).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(readFunc, phys, logical,
      // delete-context partitions (dropped files with MoR marks) read
      // their delete files through these; built unconditionally — the
      // schemas are fixed, and a stream factory is built once
      mor = Some(GraftMorReaders(
        GraftSourceUtil.buildReadFunc(spark, phys),
        GraftSourceUtil.buildReadFunc(spark, LogTable.DeleteSchema))))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final class GraftMicroBatchStream(root: String,
    logical: StructType, options: CaseInsensitiveStringMap,
    pushed: Array[Filter] = Array.empty)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val spark = SparkSession.active
  private val table = LogTable(spark, root)
  private val phys = GraftSourceUtil.physicalSchema(logical)
  // one reader build (and conf broadcast) per stream, not per batch
  private lazy val readFunc =
    GraftSourceUtil.buildReadFunc(spark, phys, pushed.toSeq)
  // AvailableNow pins the end offset at trigger start (native support —
  // no engine-side wrapper, no "uncommitted batch" caveat)
  @volatile private var availableNowCap: Long = -1L
  private val maxVersions: Long =
    Option(options.get("maxVersionsPerTrigger")).map(_.toLong).getOrElse(0L)
  private val maxBytes: Long =
    Option(options.get("maxBytesPerTrigger")).map(_.toLong).getOrElse(0L)

  override def initialOffset(): Offset = {
    val sv = Option(options.get("startingVersion")).getOrElse("0")
    GraftOffset(
      if (sv.equalsIgnoreCase("latest")) table.currentVersion else sv.toLong)
  }
  override def latestOffset(): Offset = GraftOffset(table.currentVersion)
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentVersion
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = GraftOffset(table.currentVersion)
  /** Admission control: cap at the AvailableNow pin (if armed) and at
    * `maxVersionsPerTrigger` manifest versions past `start` (if set) —
    * a continuous tail can bound per-batch work instead of swallowing
    * an arbitrarily long backlog in one micro-batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftOffset].version
    var to = table.currentVersion
    if (availableNowCap >= 0L) to = math.min(to, availableNowCap)
    if (maxVersions > 0L) to = math.min(to, from + maxVersions)
    // byte-based admission (Delta's maxBytesPerTrigger): admit whole
    // manifest versions until their appended bytes reach the cap —
    // always at least one version, or a single oversized commit would
    // stall the stream forever. Manifest arithmetic only (the byte
    // counts are snapshot metadata); row-changing commits throw here
    // exactly as planInputPartitions would — same tail contract.
    if (maxBytes > 0L && to > from) {
      var v = from
      var acc = 0L
      while (v < to && acc < maxBytes) {
        acc += table.appendedFilesBetween(v, v + 1).map(_.bytes).sum
        v += 1
      }
      to = v
    }
    GraftOffset(to)
  }
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftPrune.filesFor(
        table.appendedFilesBetween(
          start.asInstanceOf[GraftOffset].version,
          end.asInstanceOf[GraftOffset].version),
        table.snapshot().transforms, pushed.toSeq)
      .map(f => GraftInputPartition(f.path, f.bytes, f.partitions): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(readFunc, phys, logical,
      columnar = GraftSourceUtil.columnarPlan(
        spark, logical, table.snapshot(), pushed.toSeq))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final class GraftBatch(root: String, logical: StructType,
    options: CaseInsensitiveStringMap,
    pushed: Array[Filter] = Array.empty,
    limit: Option[Int] = None,
    topN: Option[(String, Boolean, Boolean, Int)] = None,
    fileSet: Option[Set[String]] = None,
    rowLevel: Option[GraftRowLevelOperation] = None,
    spj: Option[SpjLayout] = None) extends Batch {
  private val spark = SparkSession.active
  // `_file` is metadata — the reader materializes it from the
  // partition's own path; it has no physical twin to read
  private val physLogical = StructType(logical.fields.filterNot(
    _.name.equalsIgnoreCase(GraftSourceUtil.FileColName)))
  private val phys = GraftSourceUtil.physicalSchema(physLogical)
  // resolved ONCE: planInputPartitions and createReaderFactory must see
  // the SAME snapshot, or a commit racing between the two calls could
  // plan delete-carrying partitions without their MoR readers
  private lazy val snap =
    GraftSourceUtil.snapshotFor(LogTable(spark, root), options)

  // equality-delete key columns must be READABLE even when the query
  // pruned them away (they only drive filtering, never output). The
  // appended twins keep their field METADATA (historical names) and
  // expand like physicalSchema does — a pre-rename file stores the
  // key under an old physical name, and the key projection coalesces
  // exactly as the logical projection would; dropping the metadata
  // here let rows in pre-rename files project NULL keys and silently
  // escape their tombstones.
  private lazy val physAll: StructType = {
    val extra = snap.eqDeletes.flatMap(_.cols).distinct
      .filterNot(c => phys.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (extra.isEmpty || snap.schemaJson.isEmpty) phys
    else {
      val full = LogTable.parseSchema(snap.schemaJson)
      StructType(phys.fields ++ extra.flatMap(c =>
        full.fields.find(_.name.equalsIgnoreCase(c)).toSeq.flatMap(f =>
          StructField(f.name, f.dataType, nullable = true, f.metadata) +:
            LogTable.prevNames(f).map(p =>
              StructField(p, f.dataType, nullable = true)))))
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val kept0 = snap.prunedFiles(pushed.toSeq)
    // file-level TOP-N (`ORDER BY c [DESC] LIMIT n` — the reference's
    // recent-N headline shape): rank files by the best value they can
    // offer, accumulate each file's GUARANTEED comparable supply
    // (rows - nulls, all >= its min for DESC) until n is covered, and
    // drop every file whose range cannot reach the resulting
    // threshold. Sound only on a clean snapshot with no residual
    // filters, null counts known, and nulls sorting toward the tail
    // (otherwise unknown files' nulls could place in the top n).
    val kept = topN match {
      case Some((c, desc, nullsFirst, n))
          if pushed.isEmpty && snap.eqDeletes.isEmpty =>
        // POSITION deletes subtract exactly from each file's provable
        // supply via their per-file mark counts (a marked row might
        // have been a comparable value — assume every mark was);
        // ranges stay sound bounds (deletes only shrink a file's value
        // set). EQUALITY deletes stay a refusal: match counts are
        // unknowable from metadata.
        val marks = snap.deletes.flatMap(_.counts)
          .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).sum }
        val withRows = kept0.filter(_.rows > 0)
        val known = withRows.forall(f =>
          f.ranges.contains(c) && f.nulls.contains(c))
        val anyNulls = withRows.exists(f => f.nulls.getOrElse(c, 0L) > 0L)
        if (!known || (anyNulls && nullsFirst)) kept0
        else {
          val ordered =
            if (desc) withRows.sortBy(f => -f.ranges(c)._2)
            else withRows.sortBy(f => f.ranges(c)._1)
          var acc = 0L
          val taken = Seq.newBuilder[DataFile]
          val it = ordered.iterator
          while (acc < n && it.hasNext) {
            val f = it.next()
            taken += f
            acc += math.max(0L,
              f.rows - f.nulls(c) - marks.getOrElse(f.path, 0L))
          }
          if (acc < n) kept0 // cannot prove n comparable rows — scan all
          else {
            val t = taken.result()
            val thr =
              if (desc) t.map(_.ranges(c)._1).min
              else t.map(_.ranges(c)._2).max
            withRows.filter { f =>
              val (mn, mx) = f.ranges(c)
              if (desc) mx >= thr else mn <= thr
            }
          }
        }
      case _ => kept0
    }
    // file-level LIMIT: stop planning once the manifest guarantees
    // enough LIVE rows. Sound only when nothing downstream of the
    // file boundary can thin rows below the limit: no residual
    // filters, no equality deletes (match counts unknown); position
    // deletes subtract exactly via their per-file mark counts.
    val planned0 = limit match {
      case Some(n) if pushed.isEmpty && snap.eqDeletes.isEmpty =>
        val marks = snap.deletes.flatMap(_.counts)
          .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).sum }
        var acc = 0L
        val out = Seq.newBuilder[DataFile]
        val it = kept.iterator
        while (acc < n && it.hasNext) {
          val f = it.next()
          out += f
          acc += f.rows - marks.getOrElse(f.path, 0L)
        }
        out.result()
      case _ => kept
    }
    // runtime GROUP filter (row-level operations): exactly the files
    // holding rows the command matched — the rewrite's blast radius
    val planned = fileSet match {
      case Some(s) => planned0.filter(f => s.contains(f.path))
      case None => planned0
    }
    // the row-level write replaces EXACTLY the groups this scan plans:
    // record them (and the snapshot they came from) for its commit
    rowLevel.foreach(_.recordScan(snap, planned.map(_.path), pushed.toSeq))
    planned
      .map { f =>
        // a merge-on-read snapshot ships each file's referencing delete
        // files with its partition (manifest metadata only): the
        // executor anti-sets the marked positions away at read time
        val dels = snap.deletes.filter(_.counts.contains(f.path))
          .map(d => (d.path, d.bytes))
        // equality deletes apply under the DATA-SEQUENCE guard: only
        // tombstones NEWER than the file can mark its rows — the guard
        // is resolved here, at planning, from manifest metadata
        val eqs = snap.eqDeletes.filter(_.seq > f.seq)
          .map(d => (d.path, d.bytes, d.cols))
        GraftInputPartition(f.path, f.bytes, f.partitions, dels, eqs,
          spj.map(_.keyRowOf(f)).orNull): InputPartition
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // a ROW-LEVEL read feeds a group REWRITE: every surviving row of a
    // planned file must come back, so parquet row-group/page skipping
    // from the command condition would silently drop the non-matching
    // rows of a matched file — no data filters, no columnar shortcut
    val dataFilters = if (rowLevel.isEmpty) pushed.toSeq else Nil
    val mor =
      if (snap.deletes.isEmpty) None
      else Some(GraftMorReaders(
        GraftSourceUtil.buildReadFunc(spark, physAll),
        GraftSourceUtil.buildReadFunc(spark, LogTable.DeleteSchema)))
    val eq =
      if (snap.eqDeletes.isEmpty) None
      else {
        val full = LogTable.parseSchema(snap.schemaJson)
        val types = snap.eqDeletes.flatMap(_.cols).distinct.flatMap(c =>
          full.fields.find(_.name.equalsIgnoreCase(c))
            .map(f => c.toLowerCase -> f.dataType)).toMap
        val readers = snap.eqDeletes.map(_.cols).distinct.map { cols =>
          cols -> GraftSourceUtil.buildReadFunc(spark, StructType(cols.map(c =>
            StructField(c, types(c.toLowerCase), nullable = true))))
        }.toMap
        Some((types, readers))
      }
    new GraftReaderFactory(
      GraftSourceUtil.buildReadFunc(spark, physAll, dataFilters), physAll,
      logical, mor,
      if (rowLevel.nonEmpty ||
          logical.fieldNames.exists(_.equalsIgnoreCase(GraftSourceUtil.FileColName)))
        None
      else GraftSourceUtil.columnarPlan(spark, logical, snap, pushed.toSeq),
      eq)
  }
}

/** Executor-side reader: Spark's parquet reader over the physical
  * schema, then one projection to the logical row — hive-partition
  * fields become per-file literals (their values are directory
  * metadata, carried in the manifest), renamed fields coalesce their
  * historical names, everything else is a bound reference. Partitions
  * carrying position-delete references read their delete files first
  * (small — positions, not data), build the file's deleted-position
  * set, and skip those row indexes while scanning. */
private[sources] final class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    phys: StructType, logical: StructType,
    mor: Option[GraftMorReaders] = None,
    columnar: Option[ColumnarPlan] = None,
    eq: Option[(Map[String, org.apache.spark.sql.types.DataType],
      Map[Seq[String], PartitionedFile => Iterator[InternalRow]])] = None)
    extends PartitionReaderFactory {

  private def wholeFile(path: String, bytes: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(path), 0L, bytes, Array.empty, 0L, bytes)

  /** The deleted-position set for one data file, from every delete
    * file referencing it (a delete file may mark many data files;
    * rows for other files filter out here). */
  private def deletedPositions(gp: GraftInputPartition)
      : java.util.HashSet[java.lang.Long] = {
    val deleted = new java.util.HashSet[java.lang.Long]()
    gp.deletes.foreach { case (dp, dbytes) =>
      if (DeletionVectors.isVector(dp))
        // deletion-vector blob: read only this data file's section
        DeletionVectors.readFor(dp, gp.path).foreach(p => deleted.add(p))
      else {
        val mr = mor.getOrElse(throw new IllegalStateException(
          s"partition for ${gp.path} carries position deletes but the " +
            "factory has no MoR readers — planner/factory snapshot drift"))
        unwrap(mr.del(wholeFile(dp, dbytes))).foreach { r =>
          if (LogTable.localPath(r.getUTF8String(0).toString) == gp.path)
            deleted.add(r.getLong(1))
        }
      }
    }
    deleted
  }

  /** EQUALITY-tombstone key groups for one partition (seq guard
    * applied at planning): one (key set, key projection, width) per
    * key-column group. Tombstones containing a NULL key never match
    * (SQL equality semantics — a byte-wise UnsafeRow compare would
    * equate null with null). Key columns coalesce their HISTORICAL
    * physical names, as the logical projection does — a pre-rename
    * file stores the key under an old name, and binding only the
    * current name would project null keys there (rows silently
    * escaping their tombstones). A key that is a PARTITION column of
    * this file binds the file's partition value as a literal:
    * hive-layout files do not store partition columns, so the
    * physical reference would project null keys and every row of the
    * partition would escape its tombstone. `fields`/`fieldIdx`
    * describe the rows the projection will evaluate (the physical row
    * on the row path, the full batch row on the columnar path). */
  private def eqGroups(gp: GraftInputPartition,
      fields: Array[org.apache.spark.sql.types.StructField],
      fieldIdx: Map[String, Int])
      : Seq[(java.util.HashSet[InternalRow], UnsafeProjection, Int)] = {
    val (types, readers) = eq.getOrElse(throw new IllegalStateException(
      s"partition for ${gp.path} carries equality deletes but the " +
        "factory has no eq readers — planner/factory snapshot drift"))
    gp.eqDels.groupBy(_._3).toSeq.map { case (cols, dels) =>
      val ts = cols.map(c => types(c.toLowerCase))
      val delProj = UnsafeProjection.create(ts.zipWithIndex.map {
        case (t, i) => BoundReference(i, t, nullable = true) })
      val set = new java.util.HashSet[InternalRow]()
      dels.foreach { case (dp, dbytes, _) =>
        unwrap(readers(cols)(wholeFile(dp, dbytes))).foreach { r =>
          if (ts.indices.forall(i => !r.isNullAt(i)))
            set.add(delProj(r).copy())
        }
      }
      val keyProj = UnsafeProjection.create(cols.zip(ts).map {
        case (c, t) =>
          gp.parts.find(_._1.equalsIgnoreCase(c)).map(_._2) match {
            case Some("__HIVE_DEFAULT_PARTITION__") =>
              Literal(null, t): Expression
            case Some(v) =>
              Literal.create(
                Cast(Literal(v), t, Some("UTC")).eval(null), t)
            case None =>
              val names = c +: fields
                .find(_.name.equalsIgnoreCase(c)).toSeq
                .flatMap(LogTable.prevNames)
              val refs = names.flatMap(n => fieldIdx.get(n.toLowerCase))
                .map(i => BoundReference(i, t, nullable = true))
              require(refs.nonEmpty, s"equality-delete key column '$c' " +
                "resolves to no physical column")
              if (refs.size == 1) refs.head
              else (Coalesce(refs): Expression)
          }
      })
      (set, keyProj, ts.size)
    }
  }

  private def eqMarked(
      groups: Seq[(java.util.HashSet[InternalRow], UnsafeProjection, Int)],
      r: InternalRow): Boolean =
    groups.exists { case (set, keyProj, n) =>
      val k = keyProj(r)
      (0 until n).forall(i => !k.isNullAt(i)) && set.contains(k)
    }

  /** Columnar when the driver planned it ([[GraftSourceUtil
    * .columnarPlan]]'s uniformity checks) and this partition's layout
    * agrees — Spark's vectorized batches pass through with an
    * O(columns) vector reorder, no per-row work; position-deleted
    * files filter their batches through the mark bitmap (only batches
    * actually holding marks pay a rebuild). A partition whose
    * layout drifted from the plan (a mid-stream spec evolution)
    * reports false, which Spark's all-or-nothing columnar check turns
    * into a LOUD plan error rather than a silent null column. */
  override def supportColumnarReads(p: InputPartition): Boolean =
    columnar.exists { plan =>
      val gp = p.asInstanceOf[GraftInputPartition]
      !gp.selectDeleted &&
        logical.fieldNames.filter(n =>
          gp.parts.keys.exists(_.equalsIgnoreCase(n))).toSet ==
        plan.partS.fieldNames.toSet
    }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] = {
    val plan = columnar.getOrElse(
      throw new IllegalStateException("columnar read without a columnar plan"))
    val gp = p.asInstanceOf[GraftInputPartition]
    // partition values for THIS file, in partitionSchema order — the
    // reader turns them into constant column vectors
    val vals: Array[Any] = plan.partS.fields.map { f =>
      gp.parts.find(_._1.equalsIgnoreCase(f.name)).map(_._2) match {
        case None | Some("__HIVE_DEFAULT_PARTITION__") => null
        case Some(v) => Cast(Literal(v), f.dataType, Some("UTC")).eval(null)
      }
    }
    val pf = PartitionedFile(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals),
      SparkPath.fromPathString(gp.path), 0L, gp.bytes, Array.empty, 0L, gp.bytes)
    // position-marked files read UNFILTERED (row-group pruning would
    // shift positions); equality matching is position-free, so
    // eq-only and clean files keep the pushed-filter reader
    val deleted =
      if (gp.deletes.isEmpty) null else deletedPositions(gp)
    // equality-key projections bind against the FULL batch row
    // (data ++ extra key ++ partition vectors)
    val groups =
      if (gp.eqDels.isEmpty) Nil
      else eqGroups(gp, plan.batchS.fields,
        plan.batchS.fieldNames.map(_.toLowerCase).zipWithIndex.toMap)
    val it = (if (deleted == null) plan.read else plan.readRaw)(pf)
      .asInstanceOf[Iterator[Any]]
    val reorder = plan.reorder
    new PartitionReader[ColumnarBatch] {
      private var cur: ColumnarBatch = _
      // rebuilt-survivor vectors this reader owns (the reader's own
      // batch vectors are owned and recycled by the parquet reader)
      private var owned: Array[_ <: org.apache.spark.sql.vectorized.ColumnVector] = _
      // converter binds lazily: only delete-carrying files pay for it
      private lazy val conv =
        org.apache.spark.sql.execution.GraftExecBridge
          .rowToColumnConverter(logical)
      private var base = 0L // row index of the next batch's first row
      private def closeOwned(): Unit =
        if (owned != null) { owned.foreach(_.close()); owned = null }

      override def next(): Boolean = {
        cur = null
        while (cur == null && it.hasNext) it.next() match {
          case b: ColumnarBatch =>
            val n = b.numRows()
            val first = base
            base += n
            if (deleted == null && groups.isEmpty)
              cur = new ColumnarBatch(reorder.map(b.column), n)
            else {
              // mark pass over the full batch row: position bitmap +
              // equality-key set probes (exactly the row path's
              // semantics); untouched batches pass through zero-copy
              val marked = new java.util.BitSet(n)
              var marks = 0
              val mit = b.rowIterator()
              var i = 0
              while (mit.hasNext) {
                val row = mit.next()
                if ((deleted != null && deleted.contains(first + i)) ||
                    (groups.nonEmpty && eqMarked(groups, row))) {
                  marked.set(i); marks += 1
                }
                i += 1
              }
              if (marks == 0)
                cur = new ColumnarBatch(reorder.map(b.column), n)
              else if (marks < n) {
                // rebuild the SURVIVORS as fresh column vectors — the
                // same row→vector converter Spark's RowToColumnarExec
                // runs; O(survivors), only on batches holding marks
                closeOwned()
                val vecs: Array[org.apache.spark.sql.execution.vectorized
                  .WritableColumnVector] = org.apache.spark.sql.execution
                  .vectorized.OnHeapColumnVector
                  .allocateColumns(n - marks, logical)
                  .asInstanceOf[Array[org.apache.spark.sql.execution
                    .vectorized.WritableColumnVector]]
                val reordered = new ColumnarBatch(reorder.map(b.column), n)
                val rit = reordered.rowIterator()
                var idx = 0
                while (rit.hasNext) {
                  val row = rit.next()
                  if (!marked.get(idx)) conv(row, vecs)
                  idx += 1
                }
                owned = vecs
                cur = new ColumnarBatch(
                  vecs.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]],
                  n - marks)
              } // marks == n: fully-deleted batch — advance
            }
          case other => throw new IllegalStateException(
            s"expected a ColumnarBatch from the vectorized reader, got " +
              s"${other.getClass.getName}")
        }
        cur != null
      }
      override def get(): ColumnarBatch = cur
      override def close(): Unit = closeOwned()
    }
  }

  /** The reader yields ColumnarBatch elements when the vectorized path
    * engaged (Spark's scan exec does the same duck-typed unwrap). */
  private def unwrap(it: Iterator[InternalRow]): Iterator[InternalRow] =
    it.asInstanceOf[Iterator[Any]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator(r)
    }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftInputPartition]
    val physIdx = phys.fieldNames.map(_.toLowerCase).zipWithIndex.toMap
    val exprs: Seq[Expression] = logical.map { f =>
      // the `_file` metadata column: this partition's own manifest
      // path as a per-file constant (a real data column shadows it)
      if (f.name.equalsIgnoreCase(GraftSourceUtil.FileColName) &&
          !physIdx.contains(f.name.toLowerCase))
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(gp.path),
          org.apache.spark.sql.types.StringType)
      else gp.parts.find(_._1.equalsIgnoreCase(f.name)).map(_._2) match {
        case Some(v) =>
          // Spark's null-partition sentinel directory name
          if (v == "__HIVE_DEFAULT_PARTITION__") Literal(null, f.dataType)
          else Literal.create(
            Cast(Literal(v), f.dataType, Some("UTC")).eval(null), f.dataType)
        case None =>
          val names = f.name +: LogTable.prevNames(f)
          val physDt = LogTable.physicalType(f.dataType)
          val refs = names.map(n =>
            BoundReference(physIdx(n.toLowerCase), physDt, nullable = true))
          val base = if (refs.size == 1) refs.head else Coalesce(refs)
          // nested rename history: rebuild the physically-read struct
          // back to its logical shape (per-field coalesce of
          // historical names); identity for types without history
          GraftSourceUtil.renameFixExpr(base, f.dataType)
      }
    }
    val proj = UnsafeProjection.create(exprs)
    val rows0: Iterator[InternalRow] =
      if (gp.deletes.isEmpty)
        unwrap(readFunc(wholeFile(gp.path, gp.bytes)))
      else {
        val mr = mor.getOrElse(throw new IllegalStateException(
          s"partition for ${gp.path} carries position deletes but the " +
            "factory has no MoR readers — planner/factory snapshot drift"))
        val deleted = deletedPositions(gp)
        // raw (unfiltered) read: positions are row indexes within the
        // file, so row-group pruning would shift them
        var pos = -1L
        unwrap(mr.raw(wholeFile(gp.path, gp.bytes)))
          .filter { _ => pos += 1
            if (gp.selectDeleted) deleted.contains(pos)
            else !deleted.contains(pos) }
      }
    val rows: Iterator[InternalRow] =
      if (gp.eqDels.isEmpty) rows0
      else {
        val groups = eqGroups(gp, phys.fields, physIdx)
        rows0.filter(r => !eqMarked(groups, r))
      }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = proj(rows.next()); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
