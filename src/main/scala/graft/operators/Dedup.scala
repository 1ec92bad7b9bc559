package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over the
  * `documents` corpus.
  *
  * Scale design: none of these ever materializes the O(n²) pair space.
  *  - exact: one hash-partitioned group-by on the content key.
  *  - n-gram Jaccard: pairs are generated ONLY for documents sharing a
  *    5-gram (the shingle is the blocking key), so the shuffle is
  *    keyed by shingle and candidate pairing stays partition-local.
  *  - MinHash/LSH: O(n·bands) shuffle rows; collisions within a band
  *    bucket are the only pairs compared — the standard way to near-dup
  *    a 100 TB corpus.
  *  - SimHash: 64-bit fingerprints, banded into 16-bit chunks for
  *    hamming-neighbor blocking.
  *
  * The corpus has no planted duplicates, so near-dup operators return
  * the TOP-N most similar candidate pairs (always non-empty,
  * deterministic order) rather than a thresholded set.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Exact dedup: keep the lowest doc_id per distinct text. */
  def exact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Distinct word 5-grams per document (shingling). */
  private def shingled(df: DataFrame, n: Int): DataFrame = {
    val words = split(col("text"), " ")
    val gram = (i: Column) => concat_ws(" ",
      (0 until n).map(o => element_at(words, i + lit(o + 1))): _*)
    df.select(col("doc_id"),
      when(size(words) >= n,
        array_distinct(transform(sequence(lit(0), size(words) - n), gram)))
        .otherwise(array().cast("array<string>")).as("grams"))
  }

  /** Word-5-gram Jaccard near-dup: top-20 most similar pairs.
    * Blocking key = the shingle itself; only docs sharing a 5-gram
    * are ever paired. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val g = shingled(docs(s, dir), 5)
      .select(col("doc_id"), col("grams"), size(col("grams")).as("n_grams"))
    val e = g.select(col("doc_id"), explode(col("grams")).as("gram"), col("n_grams"))
    val a = e.select(col("doc_id").as("doc_a"), col("gram"), col("n_grams").as("na"))
    val b = e.select(col("doc_id").as("doc_b"), col("gram"), col("n_grams").as("nb"))
    a.join(b, a("gram") === b("gram") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jacc",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jacc"))
      .orderBy(col("jacc").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  private val NumHashes = 16
  private val BandSize = 4 // → 4 bands

  /** MinHash + LSH banding over word unigram sets: documents colliding
    * in ≥1 band are candidates; output top-100 by band-collision count.
    * O(n·bands) shuffle — THE near-dup shape for 100 TB. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    // 16 independent min-hashes in ONE aggregation pass (seeded xxhash64).
    val sigAggs = (0 until NumHashes).map(j => min(xxhash64(lit(j), col("w"))).as(s"h$j"))
    val sig = words.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    // 4 bands of 4 hashes → band key = hash of the band's signature slice.
    val bands = sig.select(col("doc_id"),
      explode(array((0 until NumHashes / BandSize).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * BandSize until (b + 1) * BandSize).map(j => col(s"h$j")): _*)
            .as("bkey"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("n_bands").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  /** 64-bit SimHash over word unigrams; hamming-near pairs found by
    * 16-bit band blocking (a ≤3-bit-different pair must share one of
    * the 4 bands); output top-100 pairs by hamming distance. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    // For each of 64 bits: +1 if set else -1; sign of the sum is the bit.
    val bitAggs = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i"))
    val bitSums = words.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val fp = bitSums.select(col("doc_id"),
      (0 until 64).map(i =>
        when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("fp"))
    val banded = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("fp"), b * 16).bitwiseAND(0xFFFFL).as("bkey"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("fp"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val l = banded.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"), col("band"), col("bkey"))
    val r = banded.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_ngram" -> (ngramJaccard _),
    "dedup_minhash" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _),
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "dedup_ngram" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS grams
        |  FROM w WHERE len(ws) >= 5),
        |e AS (
        |  SELECT doc_id, unnest(grams) AS gram, len(grams) AS n_grams FROM g),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_grams AS na,
        |    b.n_grams AS nb, count(*) AS shared
        |  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, shared,
        |  CAST(shared AS DOUBLE) / (na + nb - shared) AS jacc
        |FROM p ORDER BY jacc DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    // dedup_minhash / dedup_simhash: no oracle (xxhash64 is
    // Spark-specific); rows-only + ScalaTest.
  )
}
