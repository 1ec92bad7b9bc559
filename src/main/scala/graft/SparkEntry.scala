package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, ApiLog, Dedup, Lakehouse, LogAnalytics, MultiModal, Pipeline, RangeJoin, Similarity, Skew, TextAnalysis}
import graft.sources.Formats
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each entry implements. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's headline query (README.md:151-154: API calls
    * by type, ordered by count). */
  def entry(spark: SparkSession): DataFrame =
    LogAnalytics.logByType(spark, "/root/testdata/sf0.001")

  /** Per-module registries, kept as a LIST so the merged maps can be
    * integrity-checked: `++` silently overwrites on a key collision,
    * which would drop a module's query from the driver gate without
    * any test failing. */
  private val queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(LogAnalytics.queries, ApiLog.queries, Analytics.queries,
      TextAnalysis.queries, Dedup.queries, Similarity.queries,
      Lakehouse.queries, Streams.queries, MultiModal.queries,
      Skew.queries, RangeJoin.queries, Pipeline.queries, Formats.queries)

  private val oracleModules: Seq[Map[String, String]] =
    Seq(LogAnalytics.oracles, ApiLog.oracles, Analytics.oracles,
      TextAnalysis.oracles, Dedup.oracles, Similarity.oracles,
      Lakehouse.oracles, Streams.oracles, MultiModal.oracles,
      Skew.oracles, RangeJoin.oracles, Pipeline.oracles, Formats.oracles)

  private def merged[V](ms: Seq[Map[String, V]], what: String): Map[String, V] = {
    val all = ms.flatMap(_.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate $what ids across modules: ${dups.toSeq.sorted.mkString(", ")} — " +
        "a ++ merge would silently drop one definition")
    ms.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(queryModules, "query")

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (engine-specific hashes /
    * sketches / approximate ops) get the driver's rows-only check and a
    * ScalaTest spec instead. Every oracle id must name a registered
    * query — an orphaned oracle would simply never run, which is a
    * silent hole in the gate. */
  val oracleSql: Map[String, String] = {
    val o = merged(oracleModules, "oracle")
    val orphans = o.keySet -- queries.keySet
    require(orphans.isEmpty,
      s"oracles without a registered query: ${orphans.toSeq.sorted.mkString(", ")}")
    o
  }
}
