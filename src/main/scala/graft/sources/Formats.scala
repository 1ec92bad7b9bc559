package graft.sources

import graft.{Cols, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Source-format coverage: the reference's ingest path accepts logs as
  * JSON/CSV payloads before they are flushed to parquet (reference
  * README.md:191-199 — API logs arrive as records, land columnar).
  * These operators prove the engine round-trips the events table
  * through each wire format with NO value drift: write temp
  * JSON/CSV, read back with an EXPLICIT schema (never inference — at
  * 100 TB schema inference means an extra full scan), aggregate, and
  * hash-match the same aggregate computed by DuckDB over the original
  * parquet.
  */
object Formats {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_us", LongType)))

  /** Shared roundtrip aggregate — any lost row, reordered column, or
    * float-drifted value breaks the oracle hash. */
  private def summarize(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      Cols.asDouble(sum(Cols.money(col("value")))).as("total_value"),
      min(col("ts_us")).as("min_us"), max(col("ts_us")).as("max_us"))

  private def shaped(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("ts_us"))

  /** One round-trip for any DataSource format: write temp, read back
    * with the explicit schema, summarize. */
  private def roundtrip(s: SparkSession, dir: String, fmt: String,
      opts: Map[String, String] = Map.empty): DataFrame = {
    val tmp = graft.Scratch.dir(s"graft_$fmt" + "_").toString
    shaped(s, dir).write.mode("overwrite").options(opts).format(fmt).save(tmp)
    summarize(s.read.schema(eventsSchema).options(opts).format(fmt).load(tmp))
  }

  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "json")

  def csvRoundtrip(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "csv", Map("header" -> "true"))

  def orcRoundtrip(s: SparkSession, dir: String): DataFrame =
    roundtrip(s, dir, "orc")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_json" -> (jsonRoundtrip _),
    "source_csv" -> (csvRoundtrip _),
    "source_orc" -> (orcRoundtrip _),
  )

  private val summarySql =
    """SELECT count(*) AS n, count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
      |FROM events""".stripMargin

  val oracles: Map[String, String] = Map(
    "source_json" -> summarySql,
    "source_csv" -> summarySql,
    "source_orc" -> summarySql,
  )
}
