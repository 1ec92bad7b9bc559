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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    LogAnalytics.queries ++
      ApiLog.queries ++
      Analytics.queries ++
      TextAnalysis.queries ++
      Dedup.queries ++
      Similarity.queries ++
      Lakehouse.queries ++
      Streams.queries ++
      MultiModal.queries ++
      Skew.queries ++
      RangeJoin.queries ++
      Pipeline.queries ++
      Formats.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (engine-specific hashes /
    * sketches / approximate ops) get the driver's rows-only check and a
    * ScalaTest spec instead. */
  def oracleSql: Map[String, String] =
    LogAnalytics.oracles ++
      ApiLog.oracles ++
      Analytics.oracles ++
      TextAnalysis.oracles ++
      Dedup.oracles ++
      Similarity.oracles ++
      Lakehouse.oracles ++
      Streams.oracles ++
      MultiModal.oracles ++
      Skew.oracles ++
      RangeJoin.oracles ++
      Pipeline.oracles ++
      Formats.oracles
}
