package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name subset (local
    // iteration — the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Wipe stale outputs first: a query that crashes THIS run must not
    // pass the gate on a previous run's surviving directory.
    graft.sources.LogTable.deleteRecursively(Paths.get(outDir))
    new java.io.File(outDir).mkdirs()
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val res = fn(spark, sfDir)
          // Result TIMESTAMP columns dump as TIMESTAMP_NTZ: graft's
          // write paths standardize parquet timestamps to INT64 micros
          // with isAdjustedToUTC=true (the Iceberg seam requirement),
          // which DuckDB types as TIMESTAMP WITH TIME ZONE while the
          // oracle SQL computes naive TIMESTAMPs — a dtype mismatch on
          // an identical instant. Under this UTC session the NTZ cast
          // preserves the rendered instant exactly (and matches what
          // the legacy INT96 dumps read as in DuckDB).
          val dumped = res.schema.fields.foldLeft(res)((d, f) =>
            if (f.dataType == org.apache.spark.sql.types.TimestampType)
              d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name)
                .cast(org.apache.spark.sql.types.TimestampNTZType))
            else d)
          dumped.coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          failed ::= name
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full declared-query list, so the gate can flag a query that crashed
    // (no output dir) instead of it silently vanishing from the report.
    val allQ = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n))).map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/queries.json"), allQ)
    spark.stop()
    // Exit 0 even on per-query failure: outputs for the healthy queries
    // are still valid, and check_oracle.py fails any declared query with
    // no output directory (via queries.json above).
    if (failed.nonEmpty)
      System.err.println(s"[verify] FAILED queries: ${failed.sorted.mkString(", ")}")
  }
}
