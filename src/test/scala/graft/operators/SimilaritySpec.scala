package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Verification the rows-only similarity operators can't get from the
  * DuckDB oracle: LSH recall vs the exact scan, bucket balance of the
  * random-hyperplane keys, and planted near-duplicate detection. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("ann_lsh: recall vs exact ann_topk is high on the near-uniform corpus") {
    val exact = Similarity.annTopk(spark, sfDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annLsh(spark, sfDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ann_lsh recall@5 = $recall%.3f (${(exact & approx).size}/${exact.size})")
    // Neighbors here sit at ~68° (near-random data) — the hardest case
    // for hyperplane LSH. CALIBRATED bound: 4 bits × 16 tables measures
    // 0.94 recall@5 on this corpus with the fixed seed; 0.8 leaves
    // margin for corpus regeneration, and a real regression (a seed or
    // banding bug collapses recall toward the ~0.15 single-table
    // floor) lands far below it.
    assert(recall >= 0.8, s"recall $recall below the calibrated 0.8 bound")
  }

  test("ann_hybrid_ladder: fused top-5 parity >= 0.9 vs the exact-rank hybrid on the clustered corpus") {
    // the clustered fixture is where BOTH arms carry signal (cluster
    // mates share geometry AND topic words) — the regime hybrid
    // retrieval exists for. On near-uniform data the fused order is
    // decided by tail-rank noise both forms treat differently, which
    // measures the corpus, not the operator.
    val exact = Similarity.annHybrid(spark, hybridClusteredDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ladder = Similarity
      .annHybridLadder(spark, hybridClusteredDir, k = 8, probes = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val parity = (exact & ladder).size.toDouble / exact.size
    info(f"ann_hybrid_ladder parity@5 = $parity%.3f (${(exact & ladder).size}/${exact.size})")
    // the shortlist form can only miss a fused winner that sat outside
    // BOTH short lists — rare when either signal ranks it; 0.9 leaves
    // margin for corpus regeneration while a fusion bug (wrong join,
    // dropped arm, rank off-by-one) collapses parity far below
    assert(parity >= 0.9, s"parity $parity below the 0.9 bound")
  }

  /** [[clusteredDir]] plus correlated TEXT: docs in a cluster share
    * its topic vocabulary (plus per-doc noise words), so the lexical
    * and vector arms agree the way real hybrid corpora do. */
  private lazy val hybridClusteredDir: String = {
    val d = Files.createTempDirectory("hybrid_clustered_").toString
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat * 3f))
    val rows = (0L until 96L).map { id =>
      val c = centers((id % 8).toInt)
      id -> c.map(x => x + rnd.nextGaussian().toFloat * 0.05f)
    }
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val topics = (0 until 8).map(t =>
      (0 until 6).map(w => s"topic${t}word$w").mkString(" "))
    val docs = (0L until 96L).map { id =>
      val noise = (0 until 3).map(j => s"noise${id}x$j").mkString(" ")
      val text = topics((id % 8).toInt) + " " + noise
      (id, text, "en", "s", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("ann_refine: exact re-rank recovers recall the raw PQ estimate loses") {
    val exact = Similarity.annTopk(spark, clusteredDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val pq = recallOf(Similarity.annPq(spark, clusteredDir, k = 8, probes = 2))
    val refined = recallOf(
      Similarity.annRefine(spark, clusteredDir, refine = 50, k = 8, probes = 2))
    info(f"recall@5: pq=$pq%.3f refine=$refined%.3f")
    // the refine pool (top-50 by ADC) almost surely contains the true
    // top-5; the exact re-rank then orders them correctly — recall must
    // never drop below the estimate it refines, and should approach 1
    assert(refined >= pq, s"refine $refined lost recall vs raw PQ $pq")
    assert(refined >= 0.9, s"refine recall $refined below the 0.9 bound")
    // output contract: exactly 5 ranked neighbors per query, ranks 1..5
    val rows = Similarity.annRefine(spark, clusteredDir, refine = 50, k = 8, probes = 2)
      .groupBy("q_id").agg(count(lit(1)).as("n"),
        min("rnk").as("lo"), max("rnk").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(r => r._2 == 5L && r._3 == 1 && r._4 == 5))
  }

  test("bucketKeys: random hyperplanes give balanced buckets") {
    val dim = 64
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("qv"))
    val all = Similarity.withSigns(base, 42L, 8, 4, dim)
      .withColumn("bk", explode(Similarity.bucketKeys(col("qv"), col("signs"), 8, 4)))
    val sizes = all.groupBy(col("bk")).count().select("count").as[Long].collect()
    val n = sizes.sum.toDouble
    val mean = n / sizes.length
    info(s"buckets=${sizes.length} mean=$mean max=${sizes.max}")
    // 4-bit tables → 16 buckets each; axis-aligned thresholds on
    // correlated dims would pile everything into a few buckets.
    assert(sizes.length >= 8 * 12, "most of the 8×16 bucket space should be populated")
    assert(sizes.max <= mean * 4, s"hot bucket ${sizes.max} vs mean $mean")
  }

  /** Planted corpus: vec 1 ≈ vec 0 (tiny perturbation), others random. */
  private lazy val plantedDir: String = {
    val d = Files.createTempDirectory("planted_emb_").toString
    val rnd = new scala.util.Random(7)
    def randVec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = randVec()
    val near = base.map(x => x + 0.001f)
    val rows = Seq(0L -> base, 1L -> near) ++ (2L until 40L).map(_ -> randVec())
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    d
  }

  /** Clustered corpus: 8 tight clusters of 12 vectors; queries 0-9
    * live in clusters, so true neighbors share the query's cell. */
  private lazy val clusteredDir: String = {
    val d = Files.createTempDirectory("clustered_emb_").toString
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat * 3f))
    val rows = (0L until 96L).map { id =>
      val c = centers((id % 8).toInt)
      id -> c.map(x => x + rnd.nextGaussian().toFloat * 0.05f)
    }
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("ann_ivf: near-perfect recall on clustered embeddings") {
    val exact = Similarity.annTopk(spark, clusteredDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(spark, clusteredDir, k = 8, probes = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"ann_ivf clustered recall@5 = $recall%.3f")
    assert(recall >= 0.9, s"IVF recall $recall on clustered data below 0.9")
  }

  test("ann_ivf: deterministic across invocations on the corpus") {
    val r1 = Similarity.annIvf(spark, sfDir).collect().toSeq
    val r2 = Similarity.annIvf(spark, sfDir).collect().toSeq
    assert(r1.nonEmpty && r1 === r2)
  }

  test("ivfSave/ivfLoad: a persisted quantizer round-trips exactly and probes identically") {
    val idx = Similarity.ivfIndex(spark, sfDir)
    val p = Files.createTempDirectory("ivf_idx_").resolve("index.txt").toString
    Similarity.ivfSave(idx, p)
    val loaded = Similarity.ivfLoad(p)
    assert(loaded === idx)
    // warming a fresh corpus key with the loaded index makes annIvf
    // probe it (no retrain) and reproduce the same neighbors
    val before = Similarity.annIvf(spark, sfDir).collect().toSeq
    Similarity.ivfWarm(sfDir, loaded)
    val after = Similarity.annIvf(spark, sfDir).collect().toSeq
    assert(before === after)
  }

  test("ivfIndex: cached quantizer is identical to a fresh retrain") {
    // annIvf reuses the process-lifetime index cache (build once,
    // probe many) — this asserts the cache can't go stale: training is
    // deterministic, so a from-scratch rebuild must reproduce the
    // cached centroids exactly.
    val cached = Similarity.ivfIndex(spark, sfDir)
    val fresh = Similarity.trainCentroids(
      graft.Tables.spread(graft.Tables(spark, sfDir, "embeddings")).select(
        col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("qv"))
        .withColumn("nrm", aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x)),
      k = 16, iters = 1)
    assert(cached === fresh)
  }

  test("ann_pq: high recall on clustered embeddings despite 64x compression") {
    val exact = Similarity.annTopk(spark, clusteredDir)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.annPq(spark, clusteredDir, k = 8, probes = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"ann_pq clustered recall@5 = $recall%.3f")
    // ADC ranks candidates by their RECONSTRUCTED codewords — within a
    // tight cluster the residuals are small, so recall should stay
    // high; it is honestly below IVF's exact-vector refinement.
    // CALIBRATED: measures 0.68 on this corpus with fixed seeds; 0.64
    // leaves regeneration margin while catching a codebook/ADC
    // regression (which collapses toward random ≈ k/n).
    assert(recall >= 0.64, s"PQ recall $recall below the calibrated 0.64 bound")
  }

  test("ann_pq: deterministic across invocations, codes are m small ints") {
    val r1 = Similarity.annPq(spark, sfDir).collect().toSeq
    val r2 = Similarity.annPq(spark, sfDir).collect().toSeq
    assert(r1.nonEmpty && r1 === r2)
    // the codebooks cache rebuilds identically
    val cached = Similarity.pqBooks(spark, sfDir)
    val fresh = Similarity.trainBooks(
      graft.Tables.spread(graft.Tables(spark, sfDir, "embeddings")).select(
        col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("qv")),
      m = 8, ksub = 16)
    assert(cached === fresh)
    // shape: 8 subspaces × 16 codewords × 8 dims each
    assert(cached.length === 8 &&
      cached.forall(b => b.length === 16 && b.forall(_.length === 8)))
  }

  test("ann_pq: a planted near-identical vector is found as the top neighbor") {
    val res = Similarity.annPq(spark, plantedDir, k = 4, probes = 2)
      .filter(col("q_id") === 0 && col("rnk") === 1)
      .select("n_id").as[Long].collect()
    assert(res.sameElements(Array(1L)), s"expected planted neighbor 1, got ${res.mkString(",")}")
  }

  test("ann_lsh: a planted near-identical vector is found as the top neighbor") {
    val res = Similarity.annLsh(spark, plantedDir)
      .filter(col("q_id") === 0 && col("rnk") === 1)
      .select("n_id").as[Long].collect()
    assert(res.sameElements(Array(1L)), s"expected planted neighbor 1, got ${res.mkString(",")}")
  }

  test("dedup_embed: the planted near-dup pair ranks first") {
    val top = Similarity.dedupEmbed(spark, plantedDir)
      .select("vec_a", "vec_b").as[(Long, Long)].head()
    assert(top === ((0L, 1L)), s"expected planted pair (0,1) first, got $top")
  }

  test("ann_hybrid: RRF fusion equals an independent driver-side replay of both rank lists") {
    val got = Similarity.annHybrid(spark, sfDir)
      .select("q_id", "rnk", "n_id", "v_rank", "l_rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // independent replay: exact cosine ranks + idf-weighted lexical
    // ranks + 1/(60+r) fusion, all from raw parquet on the driver
    val textOf = Tables(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val vecs = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .filter { case (id, _) => textOf.contains(id) }
      .map { case (id, e) =>
        (id, e.map(x => math.round(x.toDouble * 1000)))
      }.sortBy(_._1)
    val nrm = vecs.map { case (id, v) => id -> v.map(x => x * x).sum }.toMap
    val terms = vecs.map { case (id, _) =>
      id -> textOf(id).split(" ", -1).distinct.toSet
    }.toMap
    val df = terms.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size }
    val bigN = vecs.length.toLong
    def wgt(t: String): Long = (1000000L * bigN) / df(t)
    val expect = vecs.filter(_._1 < 10).flatMap { case (q, qv) =>
      val ranked = vecs.filter(_._1 != q)
      val vRank = ranked.map { case (n, nv) =>
        val d = qv.zip(nv).map { case (a, b) => a * b }.sum
        val key = (if (d < 0) -1.0 else 1.0) *
          ((d * d).toDouble / (nrm(q) * nrm(n)).toDouble)
        (n, key)
      }.sortBy { case (n, k) => (-k, n) }
        .zipWithIndex.map { case ((n, _), i) => n -> (i + 1L) }.toMap
      val lRank = ranked.map { case (n, _) =>
        n -> terms(q).intersect(terms(n)).toSeq.map(wgt).sum
      }.sortBy { case (n, sc) => (-sc, n) }
        .zipWithIndex.map { case ((n, _), i) => n -> (i + 1L) }.toMap
      ranked.map { case (n, _) =>
        val rrf = 1.0 / (60.0 + vRank(n)) + 1.0 / (60.0 + lRank(n))
        (n, rrf)
      }.sortBy { case (n, r) => (-r, n) }.take(5).zipWithIndex.map {
        case ((n, _), i) => (q, i + 1L, n, vRank(n), lRank(n))
      }
    }.toSeq
    assert(got.sortBy(r => (r._1, r._2)) === expect.sortBy(r => (r._1, r._2)))
  }

  test("ann_filtered: every neighbor shares the query's label, never a post-filter of the unfiltered top-k") {
    val got = Similarity.annFiltered(spark, sfDir)
      .select("q_id", "rnk", "n_id", "label")
      .as[(Long, Long, Long, Int)].collect()
    val labelOf = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    // the filter holds on every result row
    got.foreach { case (q, _, n, l) =>
      assert(labelOf(n) === labelOf(q) && l === labelOf(q),
        s"neighbor $n of query $q crosses the label filter")
    }
    // ranks are contiguous from 1 per query
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq,
        s"query $q ranks not contiguous")
    }
    // filter-BEFORE-rank: the result must equal an independent
    // brute force over the label-restricted candidates — which a
    // post-filtered unfiltered top-k cannot match when the filter is
    // selective (it under-fills k)
    val vecs = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
      .map { case (id, l, e) =>
        (id, l, e.map(x => math.round(x.toDouble * 1000)))
      }
    val queries = vecs.filter(_._1 < 10)
    queries.foreach { case (q, ql, qv) =>
      val expect = vecs.iterator
        .filter { case (n, nl, _) => n != q && nl == ql }
        .map { case (n, _, nv) =>
          val d = qv.zip(nv).map { case (a, b) => a * b }.sum
          val pp = qv.map(x => x * x).sum * nv.map(x => x * x).sum
          val key = (if (d < 0) -1.0 else 1.0) * (d.toDouble * d / pp)
          (n, key)
        }.toSeq.sortBy { case (n, k) => (-k, n) }.take(5).map(_._1)
      val mine = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(mine === expect, s"query $q filtered top-5 mismatch")
    }
  }
}
