package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline a training-data run
  * actually executes, composed FROM the library's own operators
  * rather than re-implemented: language-ID gate (declared 'en' AND
  * the detector agrees) → quality-score gate → exact-dedup keeper
  * gate → corpus stats. Each stage is an oracle-checked operator on
  * its own; this query oracle-checks their COMPOSITION (joins on
  * doc_id of narrow per-doc frames — at 100 TB each stage is a map
  * or one agg, and the doc_id joins co-partition).
  */
object Pipeline {

  /** Surviving-corpus stats per source after the three gates.
    * Aggregates are integer-exact (counts and word totals) — no
    * float aggregation, so the DuckDB hash can't drift; the
    * score THRESHOLD compare is per-row IEEE arithmetic, identical
    * in both engines (the same contract text_quality's green hash
    * rests on). */
  def corpusFilter(s: SparkSession, dir: String,
      minScore: Double = 0.22): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"), col("source"))
    val quality = TextAnalysis.quality(s, dir).select(col("doc_id"), col("n_words"), col("score"))
    val langid = TextAnalysis.langid(s, dir).select(col("doc_id"), col("predicted"))
    val keepers = Dedup.exact(s, dir).select(col("doc_id"))
    docs
      .join(quality, Seq("doc_id"))
      .join(langid, Seq("doc_id"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("lang") === "en" && col("predicted") === col("lang") &&
        col("score") >= minScore)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("total_words"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_corpus" -> ((s, dir) => corpusFilter(s, dir)),
  )

  val oracles: Map[String, String] = Map(
    "pipeline_corpus" ->
      """WITH f AS (
        |  SELECT doc_id, lang, source,
        |    length(text) AS n_chars_m,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS stop_hits,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and)\b')) AS c_en,
        |    len(regexp_extract_all(text, '\b(el|la|de|que|los)\b')) AS c_es,
        |    len(regexp_extract_all(text, '\b(der|die|das|und|ist)\b')) AS c_de,
        |    len(regexp_extract_all(text, '\b(le|la|les|des|est)\b')) AS c_fr
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, source, n_words,
        |    CAST(stop_hits AS DOUBLE) / n_words * 0.5
        |      + least(1.0, CAST(n_words AS DOUBLE) / 200.0) * 0.3
        |      + least(1.0, (CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words) / 8.0) * 0.2 AS score,
        |    CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
        |         WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
        |         WHEN c_de >= c_fr THEN 'de'
        |         ELSE 'fr' END AS predicted
        |  FROM f),
        |keepers AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS total_words
        |FROM g JOIN keepers USING (doc_id)
        |WHERE lang = 'en' AND predicted = lang AND score >= 0.22
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
