package graft.operators

import graft.{Cols, Tables}
import graft.sources.LogTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end lakehouse roundtrip over [[graft.sources.LogTable]] —
  * the reference's core mechanism as one oracle-checked operator
  * (reference README.md:191-212: buffered ingest → parquet flush →
  * atomic multi-file commit → query; compaction as maintenance).
  *
  * The roundtrip ingests `events` in three atomic appends, compacts
  * the small files, and aggregates the read-back — which must equal
  * the same aggregate computed directly over the source parquet
  * (the DuckDB oracle). Any lost/duplicated row or file in
  * append/commit/compact/read breaks the hash match.
  */
object Lakehouse {

  def lakeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_lake_").toString
    val table = LogTable(s, tmp)
    val ev = Tables.events(s, dir)
    // Three atomic multi-file appends (the reference's flush batches).
    (0 until 3).foreach { i =>
      table.append(ev.filter(pmod(col("event_id"), lit(3)) === i))
    }
    // Everything is tiny at test SF → bin-packs into one file.
    table.compact()
    table.read()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        Cols.asDouble(sum(Cols.money(col("value")))).as("total_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_roundtrip" -> (lakeRoundtrip _),
  )

  val oracles: Map[String, String] = Map(
    "lake_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
