package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one user/tenant owning most of a 100 TB fact table).
  *
  * AQE's runtime skew-join split is the first line of defense and is
  * on by default; explicit salting is for the cases AQE can't save —
  * a skewed key whose single hash bucket exceeds what one executor
  * can even hold, or deterministic pre-partitioning of a pipeline
  * that reuses the join output. The salt fans each big-side row into
  * one of `salts` sub-buckets and replicates the SMALL side `salts`×,
  * so the hot key's work spreads over `salts` tasks while every join
  * pair still meets exactly once.
  */
object Skew {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salts` ways.
    * Produces exactly the rows of `big.join(small, key)` (asserted by
    * SkewSpec), with the big side's per-key load split across `salts`
    * shuffle buckets. The salt is a deterministic hash of the big
    * row's full contents — distinct rows of a hot key spread evenly;
    * exact duplicate rows share a bucket (they carry no information
    * to balance on). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already have a _salt column; rename it before saltedJoin")
    val bigCols: Seq[Column] = big.columns.map(col).toSeq
    val b = big.withColumn("_salt", pmod(xxhash64(bigCols: _*), lit(salts.toLong)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** End-to-end salted-join query, hash-checked against the oracle's
    * PLAIN join: the events fact table salted-joined 8 ways to a
    * per-user dimension, then aggregated. Whatever the salt does to
    * the physical shuffle, the logical result must equal an unsalted
    * join — the oracle computes exactly that in DuckDB. */
  def qSalted(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = ev.groupBy(col("user_id")).agg(min(col("event_id")).as("first_event"))
    saltedJoin(ev, dim, "user_id", salts = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_id") === col("first_event"), 1).otherwise(0))
          .cast("long").as("n_first"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted" -> (qSalted _),
  )

  val oracles: Map[String, String] = Map(
    "q_salted" ->
      """WITH dim AS (
        |  SELECT user_id, min(event_id) AS first_event FROM events GROUP BY 1)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN event_id = first_event THEN 1 ELSE 0 END) AS BIGINT) AS n_first
        |FROM events JOIN dim USING (user_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
