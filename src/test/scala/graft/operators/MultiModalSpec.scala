package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing specs: codec roundtrip, feature-vector shape,
  * frame reassembly, and the narrow (shuffle-free) plan contract. */
class MultiModalSpec extends SparkSpec {
  import spark.implicits._

  test("mm_encode: payload roundtrips byte-exact through the stub codec") {
    val bad = MultiModal.mmTable(spark, sfDir)
      .join(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
      .filter(decode(col("payload"), "UTF-8") =!= col("text"))
      .count()
    assert(bad === 0L, s"$bad payloads failed the decode(encode(text)) roundtrip")
  }

  test("mm_encode: metadata is typed per modality") {
    val m = MultiModal.mmEncode(spark, sfDir)
    val byMod = m.groupBy("modality")
      .agg(count(lit(1)).as("n"),
        count(col("width")).as("n_width"),
        count(col("sample_rate")).as("n_sr"),
        count(col("fps")).as("n_fps"))
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(byMod.keySet === Set("image", "audio", "video"))
    assert(byMod("image")._3 === byMod("image")._2, "every image row needs width")
    assert(byMod("image")._4 === 0L && byMod("image")._5 === 0L)
    assert(byMod("audio")._4 === byMod("audio")._2, "every audio row needs sample_rate")
    assert(byMod("video")._5 === byMod("video")._2, "every video row needs fps")
  }

  test("mm_features: fixed-width deterministic vectors that separate payloads") {
    val f = MultiModal.mmFeatures(spark, sfDir)
    val dims = f.select("n_dims").distinct().as[Long].collect()
    assert(dims.sameElements(Array(MultiModal.FeatureDims.toLong)),
      s"expected uniform width ${MultiModal.FeatureDims}, got ${dims.mkString(",")}")
    val r1 = f.collect().toSeq
    val r2 = MultiModal.mmFeatures(spark, sfDir).collect().toSeq
    assert(r1 === r2, "feature extraction must be deterministic")
    val distinctVecs = f.select("features").distinct().count()
    assert(distinctVecs > f.count() / 2, "features should separate distinct payloads")
  }

  test("mm_features: batched mapPartitions path is byte-identical to the expression path") {
    val expr = MultiModal.mmFeatures(spark, sfDir).collect().toSeq
    val batched = MultiModal.mmFeaturesBatched(spark, sfDir, batchSize = 7).collect().toSeq
    assert(batched.nonEmpty && batched === expr,
      "swapping the fake model for a real one must be the ONLY difference")
  }

  test("mm_framesample: every=1 frames reassemble the exact payload") {
    // collect_list order is not guaranteed — sort the (idx, text) pairs.
    val reassembled = MultiModal.frameSample(spark, sfDir, every = 1)
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("frame_idx"), col("frame_text")))),
        x => x.getField("frame_text")), "").as("rebuilt"))
    val bad = reassembled
      .join(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(bad === 0L, s"$bad documents failed frame reassembly")
  }

  test("corpus is single-byte text (the mm_framesample oracle's parity precondition)") {
    // The oracle slices characters, the operator slices bytes; they
    // agree only while every document is single-byte. If the corpus
    // gains multi-byte text this must fail HERE, not as a confusing
    // oracle hash mismatch.
    val multibyte = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(multibyte === 0L,
      s"$multibyte documents contain multi-byte chars; byte-vs-char frame parity breaks")
  }

  test("mm encode/features are narrow plans: no hash shuffle anywhere") {
    // Tables.spread's round-robin repartition (local small-file widening,
    // a no-op at scale) and the presentation sort's range partition are
    // the only exchanges allowed — a hash shuffle would mean the decode/
    // feature stage itself stopped being a pure map.
    def hashShuffles(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r.findAllIn(
        df.queryExecution.executedPlan.toString).length
    assert(hashShuffles(MultiModal.mmTable(spark, sfDir)) === 0)
    assert(hashShuffles(MultiModal.mmFeatures(spark, sfDir)) === 0)
    assert(hashShuffles(MultiModal.frameSample(spark, sfDir)) === 0)
  }

  test("mm_dedup: every cluster is a true byte-duplicate set; keeper is the min id") {
    // the sf0.001 corpus may carry no duplicate texts — plant a corpus
    // with KNOWN dup structure: docs 0/3/6 share bytes (all modality
    // 'image' since ids ≡ 0 mod 3), docs 1/4 share bytes but NOT
    // modality (1 → audio, 4 → audio? no: 4 % 3 = 1 → audio too), and
    // 2 is unique — so exactly two clusters report
    val d = java.nio.file.Files.createTempDirectory("mm_dedup_").toString
    Seq(
      (0L, "same bytes alpha", "en", "src0", 16L),
      (3L, "same bytes alpha", "en", "src0", 16L),
      (6L, "same bytes alpha", "en", "src1", 16L),
      (1L, "same bytes beta", "en", "src0", 15L),
      (4L, "same bytes beta", "en", "src1", 15L),
      (2L, "unique bytes", "en", "src0", 12L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val clusters = MultiModal.mmDedup(spark, d)
      .as[(String, String, Long, Long, Long)].collect()
    assert(clusters.length === 2, s"expected 2 dup clusters, got ${clusters.toSeq}")
    assert(clusters.forall(_._3 >= 2), "single-copy groups must not report")
    val byMod = clusters.map(c => c._1 -> c).toMap
    // image cluster: docs 0/3/6, keeper 0, reclaim 2 × 16 bytes
    assert(byMod("image")._3 === 3L && byMod("image")._4 === 0L &&
      byMod("image")._5 === 32L)
    // audio cluster: docs 1/4, keeper 1, reclaim 1 × 15 bytes
    assert(byMod("audio")._3 === 2L && byMod("audio")._4 === 1L &&
      byMod("audio")._5 === 15L)
    // and on the real corpus the operator agrees with an independent
    // text-level grouping, including when both are empty
    val expected = MultiModal.mmTable(spark, sfDir)
      .groupBy(col("modality"), col("payload"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count()
    assert(MultiModal.mmDedup(spark, sfDir).count() === expected)
  }
}
