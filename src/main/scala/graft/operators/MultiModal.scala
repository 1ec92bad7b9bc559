package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads carried as opaque `binary` columns with a typed metadata
  * struct, plus feature extraction and frame sampling over them.
  *
  * CODEC STUB: this container has no media libraries, so the "decoder"
  * is a clearly-marked deterministic fake — payload bytes are the UTF-8
  * encoding of the document text, and frames are fixed 64-byte slices.
  * Everything Spark-side is real and shaped exactly as the real thing
  * would be: an opaque binary column, a typed metadata struct, a
  * narrow (shuffle-free) per-row decode/feature stage, and a
  * frame-explode whose output is keyed for downstream shuffles. A real
  * deployment swaps `payload`'s producer and the per-frame kernel for
  * an actual codec; no plan shape changes.
  *
  * Scale notes: encode/features are pure map stages (zero Exchange in
  * the plan — asserted by MultiModalSpec) that scale with input
  * splits; framesample's explode multiplies rows BEFORE any shuffle,
  * so downstream aggregations shuffle sampled frames only (the
  * SampleEvery stride bounds the blow-up at 1/4 of full decode).
  */
object MultiModal {

  /** Fixed frame width of the fake codec (bytes). */
  val FrameBytes = 64
  /** Default sampling stride: keep every 4th frame. */
  val SampleEvery = 4
  /** Feature-vector width of the fake extractor. */
  val FeatureDims = 8

  private def docs(s: SparkSession, dir: String) =
    Tables.spread(Tables(s, dir, "documents"))

  private val nFrames: Column =
    expr(s"(length(payload) + ${FrameBytes - 1}) div $FrameBytes")

  /** The multimodal table: doc_id, modality, opaque binary payload,
    * typed metadata struct. Modality + metadata are deterministic
    * functions of (doc_id, payload size) so the flattened view is
    * oracle-checkable. */
  def mmTable(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("meta", struct(
        when(col("modality") === "image", lit(32L) + pmod(col("doc_id"), lit(8)) * 16L).as("width"),
        when(col("modality") === "image", lit(24L) + pmod(col("doc_id"), lit(8)) * 12L).as("height"),
        when(col("modality") === "audio", lit(8000L) + pmod(col("doc_id"), lit(4)) * 8000L).as("sample_rate"),
        when(col("modality") === "video", lit(24L) + pmod(col("doc_id"), lit(2)) * 6L).as("fps"),
        nFrames.as("n_frames"),
        when(col("modality") === "image", "fake_png")
          .when(col("modality") === "audio", "fake_pcm")
          .otherwise("fake_h264").as("codec")))

  /** Flattened, oracle-checkable view of the encoded table. */
  def mmEncode(s: SparkSession, dir: String): DataFrame =
    mmTable(s, dir)
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.sample_rate").as("sample_rate"), col("meta.fps").as("fps"),
        col("meta.n_frames").as("n_frames"), col("meta.codec").as("codec"))
      .orderBy(col("doc_id"))

  /** Fake feature extractor: FeatureDims doubles per payload, each the
    * scaled hash of one byte stripe — stands in for an embedding model
    * with the identical plan shape (narrow map over binary). The
    * stripe hash is the first 60 bits of md5 mod 1e9+7 (the same
    * cross-engine trick as text_fingerprint), so the VALUES — not
    * just the stripe geometry — are DuckDB-oracle-checkable; the
    * final /1e9 division is IEEE-exact on both engines. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val stride = greatest(expr(s"(length(payload) + ${FeatureDims - 1}) div $FeatureDims"), lit(1L))
    val features = transform(sequence(lit(0L), lit(FeatureDims - 1L)),
      i => pmod(conv(substring(md5(col("payload").substr(i * stride + 1, stride)),
          1, 15), 16, 10).cast("long"),
        lit(1000000007L)).cast("double") / 1e9)
    mmTable(s, dir)
      .select(col("doc_id"), features.as("features"))
      .withColumn("n_dims", size(col("features")).cast("long"))
      .select(col("doc_id"), col("n_dims"), col("features"))
      .orderBy(col("doc_id"))
  }

  /** Driver-facing mm_features: scalar columns only. The DOUBLE[]
    * `features` column is flattened to a CSV string (fixed 9-decimal
    * format — deterministic, locale-free) because the driver's pandas
    * canonicalization cannot sort/hash array cells. Specs keep using
    * the array-valued [[mmFeatures]]. */
  def mmFeaturesFlat(s: SparkSession, dir: String): DataFrame =
    mmFeatures(s, dir)
      .select(col("doc_id"), col("n_dims"),
        array_join(transform(col("features"),
          f => format_number(f, 9)), ",").as("features_csv"))
      .orderBy(col("doc_id"))

  /** Oracle-checkable projection of the feature extraction: the stripe
    * geometry (n_dims, stride, last-stripe width) is a pure function of
    * payload length, so DuckDB can recompute it from octet_length —
    * hash-green evidence that the extractor walks the bytes the way it
    * claims, even though the hash values themselves are engine-specific. */
  def mmFeatureStats(s: SparkSession, dir: String): DataFrame = {
    val stride = greatest(expr(s"(length(payload) + ${FeatureDims - 1}) div $FeatureDims"), lit(1L))
    mmTable(s, dir)
      .select(col("doc_id"), col("n_bytes"), stride.as("stride"),
        lit(FeatureDims.toLong).as("n_dims"),
        // bytes actually covered by the last stripe (payload may not
        // fill stride*FeatureDims exactly)
        greatest(col("n_bytes") - stride * (FeatureDims - 1), lit(0L)).as("last_stripe_bytes"))
      .orderBy(col("doc_id"))
  }

  /** The BATCHED-inference variant of mmFeatures: mapPartitions groups
    * rows into fixed-size batches and calls the "model" once per batch
    * — the exact plumbing (iterator → batch → vectorized call →
    * flatten) a real embedding model or image decoder needs on an
    * executor, with the deterministic fake standing in for the model.
    * Produces byte-identical features to the expression path
    * (MultiModalSpec), so swapping in a real model changes ONE
    * function. `mapPartitions` is last-resort per the custom-operator
    * ladder — used here precisely because batched native inference is
    * the one shape Catalyst expressions cannot express. */
  def mmFeaturesBatched(s: SparkSession, dir: String, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    import s.implicits._
    mmTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // one call per BATCH: this is where model.predict(batch) goes
          val vectors = fakeModelBatch(batch.map(_._2))
          batch.map(_._1).zip(vectors)
        }
      }
      .toDF("doc_id", "features")
      .withColumn("n_dims", size(col("features")).cast("long"))
      .select(col("doc_id"), col("n_dims"), col("features"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic fake "model": same math as the mmFeatures
    * expression path (substr + md5-first-60-bits mod p), so the two
    * formulations are asserted byte-identical. */
  private def fakeModelBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map { bytes =>
      val stride = math.max((bytes.length + FeatureDims - 1) / FeatureDims, 1)
      Array.tabulate(FeatureDims) { i =>
        val from = math.min(i.toLong * stride, bytes.length.toLong).toInt
        val until = math.min(from + stride, bytes.length)
        val slice = java.util.Arrays.copyOfRange(bytes, from, until)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(slice).map("%02x".format(_)).mkString.substring(0, 15)
        val p = 1000000007L
        (java.lang.Long.parseLong(hex, 16) % p).toDouble / 1e9
      }
    }

  /** Frame/chunk sampling: explode every `every`-th 64-byte frame of
    * each payload. The per-frame kernel here (length + UTF-8 decode)
    * is where a real pipeline would run its per-frame model. */
  def frameSample(s: SparkSession, dir: String, every: Int = SampleEvery): DataFrame =
    mmTable(s, dir)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), nFrames - 1L, lit(every.toLong))).as("frame_idx"))
      .withColumn("frame", col("payload").substr(
        col("frame_idx") * FrameBytes + 1, lit(FrameBytes)))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        decode(col("frame"), "UTF-8").as("frame_text"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Exact BINARY dedup: duplicate payload clusters per modality by
    * content digest — the multimodal twin of `dedup_exact` (a crawl
    * re-fetches the same image/audio bytes under many doc ids; the
    * digest group-by finds every copy without comparing payloads
    * pairwise). One hash agg on (modality, md5): map-side combine
    * collapses each partition to its distinct digests, the shuffle is
    * O(distinct payloads), and the payload bytes themselves never
    * shuffle — at 100 TB only 16-byte digests move. Keeper = min
    * doc_id; reclaim = bytes of the (n-1) dropped copies. */
  def mmDedup(s: SparkSession, dir: String): DataFrame =
    dedupClustersOf(mmTable(s, dir))

  /** NEAR-duplicate detection over multimodal payloads — the
    * perceptual-dedup shape (a re-encode/re-crawl that changed a few
    * bytes still shares most of its content): the per-stripe signature
    * ints of [[mmFeatures]] form an 8-stripe fingerprint, candidates
    * block on 2-stripe LSH bands (4 bands; near-dups agree on ≥1 whole
    * band — never an all-pairs compare), and a candidate pair is a
    * near-dup when ≥ `minMatch` of its 8 stripes agree exactly.
    * GATE NON-VACUITY: the corpus has no near-dups by construction, so
    * a deterministically MUTATED slice is planted (every doc_id%7==0
    * payload ≥64 B re-keyed under +1e6 with its last 4 bytes replaced
    * — the stride keeps all but the final stripe(s) intact, ≥6/8
    * stripes agree). Integer-exact md5 stripe arithmetic → the oracle
    * replays everything including the plant.
    *
    * Scale: signatures are 8 longs/payload computed in ONE narrow
    * pass; only (band-key, sigs) rows shuffle — payload bytes never do
    * — and the band join meets only same-band-key candidates. */
  def mmDedupNear(s: SparkSession, dir: String, minMatch: Int = 6): DataFrame = {
    val base = mmTable(s, dir).select(col("doc_id"), col("payload"))
    val planted = base
      .filter(pmod(col("doc_id"), lit(7)) === 0 && length(col("payload")) >= 64)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(expr("substring(payload, 1, length(payload) - 4)"),
          encode(lit("XXXX"), "UTF-8")).as("payload"))
    val mm = base.unionByName(planted)
    val stride = greatest(
      expr(s"(length(payload) + ${FeatureDims - 1}) div $FeatureDims"), lit(1L))
    val sigsCol = transform(sequence(lit(0L), lit(FeatureDims - 1L)), i =>
      pmod(conv(substring(md5(col("payload").substr(i * stride + 1, stride)),
          1, 15), 16, 10).cast("long"), lit(1000000007L)))
    val sig = mm.select(col("doc_id"), sigsCol.as("sigs"))
    val bands = sig.select(col("doc_id"), col("sigs"),
      explode(expr(s"transform(sequence(0, ${FeatureDims / 2 - 1}), b -> " +
        "struct(b AS band, sigs[b * 2] AS k1, sigs[b * 2 + 1] AS k2))")).as("bd"))
      .select(col("doc_id"), col("sigs"),
        col("bd.band").as("band"), col("bd.k1").as("k1"), col("bd.k2").as("k2"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.k1") === col("b.k1") &&
          col("a.k2") === col("b.k2") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sigs").as("sa"), col("b.sigs").as("sb"))
      .distinct()
    cand
      .withColumn("n_match", expr(
        "aggregate(zip_with(sa, sb, (x, y) -> CAST(x = y AS INT)), 0, (acc, v) -> acc + v)")
        .cast("long"))
      .filter(col("n_match") >= minMatch)
      .select(col("id_a"), col("id_b"), col("n_match"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The driver-gate variant of [[mmDedup]] (the `mm_dedup` queries
    * entry). GATE NON-VACUITY: the synthetic corpus has no duplicate
    * payloads by construction, so dedup over it alone returns zero
    * rows and the driver's rows+schema+hash oracle check would pass
    * even for an operator that always returned nothing. This variant
    * unions a deterministically RE-KEYED slice (every doc_id % 7 == 0
    * payload again under doc_id + 1e6 — a crawl re-fetch of the same
    * bytes) so the oracle exercises real cluster resolution: keeper
    * must be the ORIGINAL id, n_copies and reclaim must count the
    * planted copy. The DuckDB oracle plants the identical slice. */
  def mmDedupGate(s: SparkSession, dir: String): DataFrame = {
    val base = mmTable(s, dir)
    val planted = base.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    dedupClustersOf(base.unionByName(planted))
  }

  private def dedupClustersOf(mm: DataFrame): DataFrame =
    mm.groupBy(col("modality"), md5(col("payload")).as("digest"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keeper"),
        (max(col("n_bytes")) * (count(lit(1)) - 1)).cast("long").as("reclaim_bytes"))
      .filter(col("n_copies") >= 2)
      .select(col("modality"), col("digest"), col("n_copies"),
        col("keeper"), col("reclaim_bytes"))
      .orderBy(col("modality"), col("digest"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_encode" -> (mmEncode _),
    "mm_features" -> (mmFeaturesFlat _),
    "mm_feature_stats" -> (mmFeatureStats _),
    "mm_framesample" -> ((s, dir) => frameSample(s, dir)),
    "mm_dedup" -> (mmDedupGate _),
    "mm_dedup_near" -> ((s, dir) => mmDedupNear(s, dir)),
  )

  val oracles: Map[String, String] = Map(
    "mm_encode" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN 32 + (doc_id % 8) * 16 END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN 24 + (doc_id % 8) * 12 END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 4) * 8000 END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 2 THEN 24 + (doc_id % 2) * 6 END AS fps,
        |  (octet_length(encode(text)) + 63) // 64 AS n_frames,
        |  CASE doc_id % 3 WHEN 0 THEN 'fake_png' WHEN 1 THEN 'fake_pcm' ELSE 'fake_h264' END AS codec
        |FROM documents ORDER BY doc_id""".stripMargin,
    // PARITY PRECONDITION: the oracle slices text by CHARACTERS
    // (DuckDB has no blob substring) while the operator slices the
    // payload by BYTES — equivalent only while the corpus is
    // single-byte text. MultiModalSpec's "corpus is single-byte"
    // test fails loudly if that ever stops holding.
    "mm_framesample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    (octet_length(encode(text)) + 63) // 64 AS n_frames
        |  FROM documents),
        |i AS (
        |  SELECT doc_id, text, unnest(range(0, n_frames, 4)) AS frame_idx FROM f)
        |SELECT doc_id, frame_idx,
        |  CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS BIGINT) AS frame_len,
        |  substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64) AS frame_text
        |FROM i ORDER BY doc_id, frame_idx""".stripMargin,
    // md5 hex over the same UTF-8 bytes on both sides (payload IS
    // encode(text, 'UTF-8'), and DuckDB's md5(VARCHAR) hashes the
    // string's UTF-8 bytes) — digests compare cell-exact. The planted
    // UNION ALL mirrors the query's re-keyed doc_id % 7 slice (gate
    // non-vacuity — see mmDedup's doc): modality/digest/n_bytes carry
    // from the ORIGINAL row, only doc_id is re-keyed.
    "mm_dedup" ->
      """WITH mm AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    md5(text) AS digest,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |allrows AS (
        |  SELECT * FROM mm
        |  UNION ALL
        |  SELECT doc_id + 1000000, modality, digest, n_bytes
        |  FROM mm WHERE doc_id % 7 = 0)
        |SELECT modality, digest, count(*) AS n_copies, min(doc_id) AS keeper,
        |  CAST(max(n_bytes) * (count(*) - 1) AS BIGINT) AS reclaim_bytes
        |FROM allrows GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY modality, digest""".stripMargin,
    // mm_features: the md5-based stripe hash makes the VALUES
    // cross-engine — DuckDB slices the (single-byte, spec-pinned)
    // text exactly as the operator slices the payload bytes, hashes
    // the same way, and formats with printf (both formatters recover
    // the exact 9-decimal form of h/1e9, far inside double precision)
    // the near-dup pipeline replayed end to end, plant included: the
    // mutated slice, the stripe signatures, the 2-stripe band
    // blocking, and the >=6-of-8 exact-stripe verification
    "mm_dedup_near" ->
      s"""WITH b0 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, substr(text, 1, length(text) - 4) || 'XXXX'
         |  FROM documents
         |  WHERE doc_id % 7 = 0 AND octet_length(encode(text)) >= 64),
         |g AS (
         |  SELECT doc_id, text,
         |    greatest((octet_length(encode(text)) + ${FeatureDims - 1}) // $FeatureDims, 1) AS stride
         |  FROM b0),
         |sg AS (
         |  SELECT doc_id,
         |    list_transform(range(0, $FeatureDims), i ->
         |      CAST(concat('0x', substr(md5(substr(text,
         |          CAST(i * stride + 1 AS BIGINT), CAST(stride AS BIGINT))),
         |        1, 15)) AS BIGINT) % 1000000007) AS sigs
         |  FROM g),
         |bd AS (
         |  SELECT doc_id, sigs, b AS band, sigs[b * 2 + 1] AS k1, sigs[b * 2 + 2] AS k2
         |  FROM sg, LATERAL (SELECT unnest(range(0, ${FeatureDims / 2})) AS b)),
         |cd AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |    a.sigs AS sa, c.sigs AS sb
         |  FROM bd a JOIN bd c ON c.band = a.band AND c.k1 = a.k1
         |    AND c.k2 = a.k2 AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |  CAST(list_sum(list_transform(range(1, ${FeatureDims + 1}),
         |    i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) AS BIGINT) AS n_match
         |FROM cd
         |WHERE list_sum(list_transform(range(1, ${FeatureDims + 1}),
         |  i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) >= 6
         |ORDER BY id_a, id_b""".stripMargin,
    "mm_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
         |g AS (
         |  SELECT doc_id, text,
         |    greatest((n + ${FeatureDims - 1}) // $FeatureDims, 1) AS stride
         |  FROM b)
         |SELECT doc_id, CAST($FeatureDims AS BIGINT) AS n_dims,
         |  array_to_string(list_transform(range(0, $FeatureDims), i ->
         |    printf('%.9f',
         |      (CAST(concat('0x', substr(md5(substr(text,
         |          CAST(i * stride + 1 AS BIGINT), CAST(stride AS BIGINT))),
         |        1, 15)) AS BIGINT) % 1000000007) / 1e9)), ',') AS features_csv
         |FROM g ORDER BY doc_id""".stripMargin,
    // mm_feature_stats: stripe geometry recomputed independently.
    "mm_feature_stats" ->
      s"""WITH b AS (
         |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, n_bytes,
         |    greatest((n_bytes + ${FeatureDims - 1}) // $FeatureDims, 1) AS stride
         |  FROM b)
         |SELECT doc_id, n_bytes, stride, CAST($FeatureDims AS BIGINT) AS n_dims,
         |  greatest(n_bytes - stride * ${FeatureDims - 1}, 0) AS last_stripe_bytes
         |FROM g ORDER BY doc_id""".stripMargin,
  )
}
