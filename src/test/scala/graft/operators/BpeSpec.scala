package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge training ([[TextAnalysis.bpe]]): checked against an
  * INDEPENDENT in-test reference implementation (plain Scala lists,
  * the Sennrich formulation), including the left-to-right
  * non-overlapping merge rule that same-symbol runs exercise. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: vocab of (symbol-list, count); per round count
    * adjacent pairs, take (count DESC, l ASC, r ASC) argmax, merge
    * left-to-right non-overlapping. */
  private def refBpe(words: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => w.map(_.toString).toList -> ws.size.toLong }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, wc) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + wc)
      }
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((round, l, r, cnt))
        def mergeLtr(syms: List[String]): List[String] = syms match {
          case a :: b :: rest if a == l && b == r => (a + b) :: mergeLtr(rest)
          case a :: rest => a :: mergeLtr(rest)
          case Nil => Nil
        }
        vocab = vocab.groupBy { case (syms, _) => mergeLtr(syms) }
          .map { case (m, g) => m -> g.values.sum }
      }
    }
    out.result()
  }

  private def plant(words: Seq[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("bpe_").toString
    Seq((0L, words.mkString(" "), "en", "s", words.map(_.length).sum.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("learned merges equal the independent reference implementation") {
    val words = Seq("lower", "lower", "lowest", "newer", "newer", "newer",
      "wider", "low", "new", "newest", "lowest", "newer")
    val got = TextAnalysis.bpe(spark, plant(words), rounds = 4)
      .as[(Int, String, String, String, Long)].collect()
      .map(t => (t._1, t._2, t._3, t._5)).toSeq
    assert(got === refBpe(words, 4))
  }

  test("same-symbol runs merge LEFT-TO-RIGHT NON-OVERLAPPING (aaaa -> aa aa, never aa a)") {
    val words = Seq.fill(5)("aaaa") ++ Seq.fill(2)("ab")
    val d = plant(words)
    val got = TextAnalysis.bpe(spark, d, rounds = 2)
      .as[(Int, String, String, String, Long)].collect()
    // round 1: (a,a) dominates — 5 words × 3 adjacent occurrences
    assert((got(0)._2, got(0)._3, got(0)._5) === ("a", "a", 15L))
    // round 2: each 'aaaa' is now [aa, aa] (ONE pair per word) — had
    // the merge overlapped ([aa, a] + stray 'a a' pairs) the counts
    // and the winner would differ. Reference agrees end-to-end.
    assert(got.toSeq.map(t => (t._1, t._2, t._3, t._5)) === refBpe(words, 2))
    assert((got(1)._2, got(1)._3) === ("aa", "aa"))
  }

  /** Reference encoder: apply refBpe's merges to a word left-to-right
    * round by round, then count tokens / sum ids under the same
    * (length, lexicographic) id ranking bpeEncode pins. */
  test("bpeEncode equals an independent reference encode (counts, ids, totals)") {
    val words = Seq("lower", "lower", "lowest", "newer", "newer", "newer",
      "wider", "low", "new", "newest", "lowest", "newer")
    val rounds = 4
    // reference: segment each distinct word by replaying the merges
    val merges = refBpe(words, rounds)
    def seg(w: String): List[String] = {
      var syms = w.map(_.toString).toList
      merges.foreach { case (_, l, r, _) =>
        def m(xs: List[String]): List[String] = xs match {
          case a :: b :: rest if a == l && b == r => (a + b) :: m(rest)
          case a :: rest => a :: m(rest)
          case Nil => Nil
        }
        syms = m(syms)
      }
      syms
    }
    val vocabSyms = words.distinct.flatMap(seg).distinct
      .sortBy(sym => (sym.length, sym))
    val tid = vocabSyms.zipWithIndex.map { case (s2, i) => s2 -> (i + 1L) }.toMap
    // two docs so the per-doc fold is exercised, not just one row
    val d = java.nio.file.Files.createTempDirectory("bpe_enc_").toString
    val (d1, d2) = (words.take(7), words.drop(7))
    Seq((0L, d1.mkString(" "), "en", "s", 1L), (1L, d2.mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextAnalysis.bpeEncode(spark, d, rounds)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Seq(d1, d2).zipWithIndex.map { case (ws, i) =>
      val toks = ws.flatMap(seg)
      (i.toLong, ws.size.toLong, toks.size.toLong, toks.map(tid).sum)
    }
    assert(got === want)
    // the id ranking covers every final symbol exactly once, ids 1..n
    assert(tid.values.toSeq.sorted === (1L to vocabSyms.size.toLong))
  }

  test("bpeEncodeIds round-trips: decode(vocab, ids) reproduces every doc token-for-token") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val (_, vocab) = TextAnalysis.bpeTrain(spark, sfDir, 5)
    val enc = TextAnalysis.bpeEncodeIds(vocab, docs)
    // the sequence agrees with the aggregate encode on count AND id sum
    val agg = TextAnalysis.bpeEncode(spark, sfDir, 5)
    val xchk = enc
      .select(col("doc_id"), size(col("ids")).cast("long").as("n_seq"),
        expr("aggregate(ids, 0L, (a, x) -> a + x)").as("seq_sum"))
      .join(agg, "doc_id")
      .filter(col("n_seq") =!= col("n_tokens") || col("seq_sum") =!= col("id_sum"))
      .count()
    assert(xchk === 0L)
    assert(enc.count() === agg.count())
    // decode target: the doc text with spaces stripped (word boundaries
    // are pre-tokenizer metadata the id stream deliberately omits)
    val bad = TextAnalysis.bpeDecode(vocab, enc)
      .join(docs.select(col("doc_id"),
        replace(col("text"), lit(" "), lit("")).as("want")), "doc_id")
      .filter(col("detok") =!= col("want"))
      .count()
    assert(bad === 0L)
  }

  test("trained vocab is a DISK artifact: post-eviction consumers never re-train") {
    val words = Seq("lower", "lower", "lowest", "newer", "newer", "wider")
    val d = plant(words)
    val (_, vocab) =
      TextAnalysis.bpeTrainDf(spark.read.parquet(s"$d/documents.parquet"), 3)
    // the returned frame is backed by the scratch parquet artifact —
    // no lineage back to the corpus survives to be recomputed
    assert(vocab.inputFiles.nonEmpty)
    assert(vocab.inputFiles.forall(_.contains("graft_bpe_vocab_")),
      s"vocab frame reads ${vocab.inputFiles.mkString(",")} — not the disk artifact")
    val before = vocab.count()
    // simulate total block-manager eviction: drop every cached frame/RDD
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // a post-eviction consumer is a bounded artifact read — training
    // (>= 2 jobs per merge round plus the corpus census) would blow
    // the job budget immediately
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      assert(vocab.count() === before)
      // the assertion targets TRAINING-SCALE work, not an exact job
      // count: a parquet read may legitimately schedule footer/AQE
      // side jobs, but training is >= 2 jobs per merge round (3
      // rounds here) plus the corpus census — a floor of ~7. Stay
      // well under it, and pin the structural fact directly: the
      // frame still reads ONLY the disk artifact.
      val deadline = System.nanoTime() + 5000000000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() < 5,
        s"post-eviction vocab read ran ${jobs.get()} jobs — " +
          "at training scale (>= 7 for 3 merge rounds)?")
      assert(vocab.inputFiles.forall(_.contains("graft_bpe_vocab_")),
        "post-eviction vocab frame must still read the disk artifact")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("the corpus is sentinel-free (the wrapped-symbol encoding's precondition)") {
    val dirty = graft.Tables(spark, sfDir, "documents")
      .filter(col("text").contains("") || col("text").contains(""))
      .count()
    assert(dirty === 0L,
      "corpus text contains the BPE sentinel bytes — swap sentinels")
  }
}
