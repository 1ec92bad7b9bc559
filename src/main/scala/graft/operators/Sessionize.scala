package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic batch sessionization: assign a session id to every row
  * such that rows of the same key whose gap exceeds `gapUs` start a
  * new session — the canonical distributed sessionizer (lag flags
  * session starts, a running sum numbers them; state is per-key, the
  * shuffle key is the key, so it scales linearly with keys). The
  * streaming analog with identical semantics is
  * [[graft.streaming.Streams.sessionize]]; LogAnalytics.logSessions
  * (DuckDB-hash-checked) is built on this. */
object Sessionize {

  /** Input rows + `session` (1-based per-key session ordinal).
    * `tieBreak` columns make the in-key sort total when times tie. */
  def assign(df: DataFrame, key: String, timeCol: String, gapUs: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapUs >= 0, "gapUs must be >= 0")
    require(!df.columns.contains("_new_sess"),
      "input already has a _new_sess column; rename it before assign")
    require(!df.columns.contains("session"),
      "input already has a session column — assign would silently clobber it; rename it first")
    val order = (timeCol +: tieBreak).map(col)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("_new_sess",
        when(lag(col(timeCol), 1).over(w).isNull ||
          col(timeCol) - lag(col(timeCol), 1).over(w) > gapUs, 1)
          .otherwise(0))
      .withColumn("session",
        sum(col("_new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_sess")
  }
}
