package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Verification for the rows-only text/sketch operators. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("text_fingerprint: identical texts get identical fingerprints, different texts differ") {
    val d = Files.createTempDirectory("fp_docs_").toString
    val rows = Seq(
      (0L, "alpha beta gamma delta", "en", "s", 22L),
      (1L, "alpha beta gamma delta", "en", "s", 22L), // exact copy of 0
      (2L, "alpha beta gamma epsilon", "en", "s", 24L),
      (3L, "delta gamma beta alpha", "en", "s", 22L)) // order matters
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val fp = TextAnalysis.fingerprint(spark, d)
      .select("doc_id", "fp").as[(Long, Long)].collect().toMap
    assert(fp(0L) === fp(1L), "identical texts must fingerprint identically")
    assert(fp(0L) !== fp(2L), "different texts must fingerprint differently")
    assert(fp(0L) !== fp(3L), "the rolling hash must be order-sensitive")
  }

  test("text_fingerprint: stable across repeated corpus runs") {
    val r1 = TextAnalysis.fingerprint(spark, sfDir).collect().toSeq
    val r2 = TextAnalysis.fingerprint(spark, sfDir).collect().toSeq
    assert(r1.nonEmpty && r1 === r2)
  }

  test("q_approx_percentile: sketch median within 5% of the exact median per group") {
    val exact = Analytics.qMedian(spark, sfDir)
      .select("l_returnflag", "median_qty").as[(String, Double)].collect().toMap
    val approx = Analytics.qApproxPercentile(spark, sfDir)
      .as[(String, Double)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, m) =>
      val a = approx(flag)
      assert(math.abs(a - m) / m <= 0.05, s"$flag: sketch $a vs exact $m")
    }
  }

  test("redact masks planted PII, counts replacements, leaves clean text alone") {
    val docs = Seq(
      (1L, "mail me at alice.smith+x@example.co.uk or bob@test.org today"),
      (2L, "call 555-123-4567 and ssn 123-45-6789 from 10.0.255.1"),
      (3L, "clean text with no personal data at all"),
      (4L, "dotted phone 555.123.4567 stays a phone")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(docs)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_redacted")
      .as[(Long, String, Long)].collect()
    assert(out(0)._2 === "mail me at <EMAIL> or <EMAIL> today")
    assert(out(0)._3 === 2L)
    assert(out(1)._2 === "call <PHONE> and ssn <SSN> from <IP>")
    assert(out(1)._3 === 3L)
    assert(out(2)._2 === "clean text with no personal data at all")
    assert(out(2)._3 === 0L)
    assert(out(3)._2 === "dotted phone <PHONE> stays a phone")
    // nothing PII-shaped survives anywhere
    val leaked = TextAnalysis.redact(docs)
      .filter(col("text").rlike("@|\\d{3}[-.]\\d{2,4}"))
    assert(leaked.count() === 0L)
  }

  test("q_approx_distinct: HLL estimate within 5% of exact per event type") {
    val exact = Analytics.qDistinctUsers(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val approx = Analytics.qApproxDistinct(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (tpe, n) =>
      val a = approx(tpe)
      val rel = math.abs(a - n).toDouble / n
      info(f"$tpe: exact=$n approx=$a rel=$rel%.4f")
      assert(rel <= 0.05, s"$tpe estimate $a off exact $n by ${rel * 100}%%")
    }
  }

  test("text_lm_coverage: scores equal an independent in-memory LM replay; unique-bigram docs score zero") {
    val d = Files.createTempDirectory("lm_docs_").toString
    val phrases = Seq("the cat sat", "on the mat", "the dog ran")
    val rows = (0L until 38L).map(i =>
      (i, phrases((i % 3).toInt) + " " + phrases(((i / 3) % 3).toInt),
        "en", "s", 20L)) ++
      Seq((38L, "zqx1 zqx2 zqx3", "en", "s", 14L), // globally unique bigrams
        (39L, "yvw1 yvw2", "en", "s", 9L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextAnalysis.lmCoverage(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // INDEPENDENT replay with plain Scala collections, using the
    // operator's OWN split expression (the PipelineSpec precedent) so
    // a drifted hash fails here, not just at the fixed-corpus oracle
    val splits = rows.map(_._1).toDF("doc_id")
      .select(col("doc_id"), Pipeline.splitCol(col("doc_id")).as("sp"))
      .as[(Long, String)].collect().toMap
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ")
      if (w.length < 2) Nil else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val ref = rows.filter(r => splits(r._1) == "train")
      .flatMap(r => bigrams(r._2))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3L).toMap
    val expect = rows.flatMap { r =>
      val bs = bigrams(r._2)
      if (bs.isEmpty) None
      else {
        val known = bs.flatMap(ref.get)
        Some((r._1, bs.size.toLong, known.size.toLong,
          known.map(math.min(_, 10L)).sum, 100L * known.size / bs.size))
      }
    }
    assert(got === expect.sortBy(_._1))
    // the unique-bigram docs can never be "known" (rc = 1 < minCount),
    // whatever split they landed in
    Seq(38L, 39L).foreach { id =>
      val r = got.find(_._1 == id).get
      assert(r._3 === 0L && r._4 === 0L && r._5 === 0L,
        s"gibberish doc $id must score zero coverage, got $r")
    }
  }
}
