package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Verification for the engine-hash dedup operators (no DuckDB oracle
  * possible): planted near-duplicates must be flagged, unrelated
  * documents must not outrank them. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Planted corpus: docs 0/1 share ~95% of their words (one token
    * changed), docs 2..41 are disjoint random-vocabulary texts. */
  private lazy val plantedDir: String = {
    val d = Files.createTempDirectory("planted_docs_").toString
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 2000).map(i => s"w$i")
    def randDoc(): String =
      Seq.fill(120)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = randDoc()
    val near = {
      val ws = base.split(" "); ws(60) = "CHANGED"; ws.mkString(" ")
    }
    val rows = (Seq(0L -> base, 1L -> near) ++ (2L until 42L).map(_ -> randDoc()))
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_minhash: planted near-dup pair collides in the most bands") {
    val top = Dedup.minhashLsh(spark, plantedDir)
      .select("doc_a", "doc_b", "n_bands").as[(Long, Long, Long)].collect()
    assert(top.nonEmpty, "minhash returned no candidate pairs")
    val (a, b, bands) = top.head
    assert((a, b) === ((0L, 1L)), s"expected planted pair first, got ($a,$b)")
    // 95% word overlap → s⁴ ≈ 0.8 per band; expect most of 8 bands.
    assert(bands >= 4, s"planted pair collided in only $bands bands")
    // no unrelated pair should match it
    assert(top.tail.forall(_._3 < bands), "an unrelated pair tied the planted pair")
  }

  test("dedup_simhash: planted near-dup pair has the smallest hamming distance") {
    val top = Dedup.simhash(spark, plantedDir)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(top.nonEmpty, "simhash returned no candidate pairs")
    val (a, b, ham) = top.head
    assert((a, b) === ((0L, 1L)), s"expected planted pair first, got ($a,$b)")
    assert(ham <= 16, s"planted pair hamming $ham too large for 1-word change")
    assert(top.tail.forall(_._3 > ham), "an unrelated pair matched the planted hamming")
  }

  test("dedup_spans: planted near-dups are flagged, disjoint docs have zero duplicated windows") {
    val rows = Dedup.dedupSpans(spark, plantedDir)
      .select("doc_id", "n_windows", "n_dup", "dup_pct", "flagged")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.length === 42)
    val byId = rows.map(r => r._1 -> r).toMap
    // docs 0/1 share all 10-word windows except those crossing the one
    // changed token (~10 of 111) → ~0.9 duplicated coverage, flagged
    for (id <- Seq(0L, 1L)) {
      val (_, nw, nd, pct, fl) = byId(id)
      assert(nw === 111L, s"doc $id window count")
      assert(nd >= 90L && nd < nw, s"doc $id n_dup=$nd")
      assert(pct > 0.5 && fl, s"doc $id must be flagged (pct=$pct)")
    }
    // random-vocabulary docs share no window with anyone
    for (id <- 2L until 42L) {
      val (_, _, nd, _, fl) = byId(id)
      assert(nd === 0L && !fl, s"doc $id unexpectedly duplicated")
    }
  }

  test("dedup_clean: rewrite keeps first occurrences, reassembles in order, empties all-boilerplate docs") {
    val d = Files.createTempDirectory("clean_docs_").toString
    val bp = "this boilerplate sentence is well over thirty characters long"
    val bp2 = "another boilerplate sentence also well over thirty characters"
    val uA = "unique alpha line that is longer than thirty characters"
    val uB = "unique beta line that is also longer than thirty chars!"
    val rows = Seq(
      (0L, s"$bp\n$uA\nok"),  // all first occurrences; 'ok' short → kept
      (1L, s"$bp\n$uB\nok"),  // bp already seen → dropped
      (2L, s"$bp2\n$bp2"),    // within-doc repeat: first kept, second dropped
      (3L, bp))               // all-boilerplate → empty string, doc SURVIVES
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = Dedup.cleanLines(spark, d)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, s"$bp\n$uA\nok", 3L, 3L),
      (1L, s"$uB\nok", 3L, 2L),
      (2L, bp2, 2L, 1L),
      (3L, "", 1L, 0L)))
  }

  test("dedup_minhash: corpus run is deterministic across invocations") {
    val r1 = Dedup.minhashLsh(spark, sfDir).collect().toSeq
    val r2 = Dedup.minhashLsh(spark, sfDir).collect().toSeq
    assert(r1.nonEmpty && r1 === r2)
  }

  /** Chained corpus: 0~1~2 share ~95% pairwise (transitively one
    * cluster), 3~4 a separate near-dup pair, 5..24 unrelated. */
  private lazy val chainedDir: String = {
    val d = Files.createTempDirectory("chained_docs_").toString
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 2000).map(i => s"w$i")
    def randDoc(): String =
      Seq.fill(120)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(doc: String, at: Int, tok: String): String = {
      val ws = doc.split(" "); ws(at) = tok; ws.mkString(" ")
    }
    val base = randDoc()
    val d2 = randDoc()
    val rows = (Seq(
      0L -> base,
      1L -> mutate(base, 30, "X1"),
      2L -> mutate(base, 90, "X2"), // chains to 0 via 1's untouched half too
      3L -> d2,
      4L -> mutate(d2, 60, "Y1")) ++
      (5L until 25L).map(_ -> randDoc()))
      .map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_clusters: chained near-dups resolve to components with one keeper each") {
    val out = Dedup.dedupClusters(spark, chainedDir)
      .select("doc_id", "cluster_id", "keep").as[(Long, Long, Int)]
      .collect().sortBy(_._1).toSeq
    assert(out.map(_._1) === Seq(0L, 1L, 2L, 3L, 4L),
      s"expected exactly the 5 planted docs in pairs, got ${out.map(_._1)}")
    assert(out.filter(_._1 <= 2).forall(_._2 == 0L), "chain 0-1-2 must share cluster 0")
    assert(out.filter(_._1 >= 3).forall(_._2 == 3L), "pair 3-4 must share cluster 3")
    assert(out.filter(_._3 == 1).map(_._1) === Seq(0L, 3L), "one keeper per cluster")
  }
}
