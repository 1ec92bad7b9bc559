package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * Determinism: cosine ranking is done in an EXACT integer domain so the
  * DuckDB oracle matches bit-for-bit. Vectors are quantized to
  * round(x*1000) (long); for a pair with integer dot product d and
  * integer norm products P = |a|²·|b|², the sort key
  * sign(d) · d²/P is a monotone function of cosine and is computed from
  * integers ≤2^53 with a single IEEE division — identical in any engine,
  * no order-dependent float summation anywhere.
  *
  * Scale design: brute-force top-k is the per-bucket refinement kernel;
  * the scale path routes through sign-bit LSH buckets (`annLsh`) so a
  * query only scans its bucket — at 100 TB the bucket id is the shuffle
  * key and each partition does a local top-k.
  */
object Similarity {

  /** Quantized vectors + integer self-norm. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables(s, dir, "embeddings")).select(
      col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("qv"))
      .withColumn("nrm", aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** sign(d)·d²/P — exact-integer monotone proxy for cosine. */
  private def cosKey(d: Column, pp: Column): Column =
    when(d < 0, -1.0).otherwise(1.0) *
      ((d * d).cast("double") / pp.cast("double"))

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id<10).
    * The small query side is broadcast; candidates stream through. */
  def annTopk(s: SparkSession, dir: String): DataFrame = {
    val all = quantized(s, dir)
    val q = all.select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
      .filter(col("q_id") < 10)
    val c = all.select(col("vec_id").as("n_id"), col("qv").as("n_qv"), col("nrm").as("n_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("key").desc, col("n_id"))
    c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("key", cosKey(dot(col("q_qv"), col("n_qv")),
        col("q_nrm") * col("n_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("n_id"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Sign-bit bucket over the first `bits` dimensions — axis-aligned
    * random-hyperplane LSH (deterministic, engine-independent). */
  private def signBucket(qv: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(qv, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** LSH-bucketed approximate top-k: queries only scan their own
    * bucket. Recall is tunable via bits/probes; this is the 100 TB
    * path (bucket id = partition key, local top-k per bucket). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val all = quantized(s, dir).withColumn("bucket", signBucket(col("qv"), 4))
    val q = all.select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
      col("nrm").as("q_nrm"), col("bucket")).filter(col("q_id") < 10)
    val c = all.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("key").desc, col("n_id"))
    c.join(broadcast(q), Seq("bucket")).filter(col("n_id") =!= col("q_id"))
      .withColumn("key", cosKey(dot(col("q_qv"), col("n_qv")),
        col("q_nrm") * col("n_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("n_id"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Embedding-cosine near-dup: 8-bit sign-LSH blocking, exact
    * integer-cosine key within buckets, top-50 most similar pairs. */
  def dedupEmbed(s: SparkSession, dir: String): DataFrame = {
    val all = quantized(s, dir).withColumn("bucket", signBucket(col("qv"), 8))
    val a = all.select(col("vec_id").as("vec_a"), col("qv").as("a_qv"),
      col("nrm").as("a_nrm"), col("bucket"))
    val b = all.select(col("vec_id").as("vec_b"), col("qv").as("b_qv"),
      col("nrm").as("b_nrm"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .withColumn("key", cosKey(dot(col("a_qv"), col("b_qv")),
        col("a_nrm") * col("b_nrm")))
      .select(col("vec_a"), col("vec_b"), col("key"))
      .orderBy(col("key").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk" -> (annTopk _),
    "ann_lsh" -> (annLsh _),
    "dedup_embed" -> (dedupEmbed _),
  )

  val oracles: Map[String, String] = Map(
    "ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, qv,
        |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
        |  FROM e),
        |p AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS n_id,
        |    CAST(list_sum(list_transform(range(1, 65), i -> q.qv[i] * d.qv[i])) AS BIGINT) AS dot,
        |    q.nrm * d.nrm AS pp
        |  FROM n q JOIN n d ON d.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |k AS (
        |  SELECT q_id, n_id,
        |    (CASE WHEN dot < 0 THEN -1.0 ELSE 1.0 END)
        |      * (CAST(dot * dot AS DOUBLE) / CAST(pp AS DOUBLE)) AS skey
        |  FROM p),
        |r AS (
        |  SELECT q_id, n_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY skey DESC, n_id) AS rnk
        |  FROM k)
        |SELECT q_id, rnk, n_id FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // ann_lsh / dedup_embed: approximate variants — rows-only + ScalaTest
    // (recall measured against ann_topk in the spec).
  )
}
