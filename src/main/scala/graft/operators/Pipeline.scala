package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._

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

  /** First 8 hex digits of md5(key) read as an integer in [0, 2^32) —
    * the ONE hashing scheme behind every deterministic assignment
    * operator here (split, mixture). DuckDB computes the identical
    * value as `('0x' || substring(md5(key), 1, 8))::BIGINT`, which is
    * what makes these operators oracle-checkable. */
  private[graft] def hash32(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** floor(0.8·2^32) / floor(0.9·2^32) — exact integer split
    * boundaries, no float compare. */
  private[graft] val TrainBelow = 3435973836L
  private[graft] val ValBelow = 3865470566L

  /** Split label from an ALREADY-COMPUTED hash column — kept separate
    * from the hashing so callers can materialize the hash once behind a
    * projection boundary and compare it against both thresholds, instead
    * of paying md5+conv twice per row (Catalyst does not reliably CSE
    * across when-branches). */
  private[graft] def splitFromHash(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(h < lit(TrainBelow), "train")
      .when(h < lit(ValBelow), "val")
      .otherwise("test")

  /** Per-document split assignment — the expression splitAssign
    * aggregates over, exposed so specs (and users wanting the per-doc
    * column) exercise the operator's OWN expression, not a copy. */
  private[graft] def splitCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    splitFromHash(hash32(docId))

  /** Deterministic train/val/test assignment by content-independent
    * hash — the split every training run needs to be REPRODUCIBLE
    * across reruns, engines, and data re-orders. The assignment key is
    * [[hash32]] of doc_id: doc placement depends only on doc_id, so
    * adding or removing other documents never moves a doc between
    * splits (the property a random()-based split lacks — PipelineSpec
    * proves it on [[splitCol]] directly). Thresholds are exact integer
    * literals so both engines compare identical values.
    * Pure narrow map → one tiny agg; scales to any corpus. */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    docs
      // hash materialized ONCE into its own attribute; splitFromHash
      // compares that attribute against both thresholds. CollapseProject
      // keeps the boundary (it refuses to inline a non-cheap alias used
      // more than once), so each row pays md5 exactly once.
      .withColumn("_h32", hash32(col("doc_id")))
      .withColumn("split", splitFromHash(col("_h32")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("split"))
  }

  /** Training-shard packing: assign each document a (bucket, shard)
    * so that consecutive documents within a bucket fill ~64 KiB
    * shards — the "pack the corpus into fixed-size training files"
    * step that precedes tokenization. Documents are bucketed by
    * doc_id so the packing parallelizes (each bucket's running sum is
    * an independent partitioned window — NO global-order window, which
    * would serialize at 100 TB; with B buckets the sort runs B-way
    * parallel and B scales with the cluster). Within a bucket the
    * shard id is the 64 KiB slab the document's START offset falls
    * in, under the deterministic doc_id order — integer math only,
    * reproducible everywhere. */
  def shardPack(s: SparkSession, dir: String,
      buckets: Int = 8, shardChars: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), pmod(col("doc_id"), lit(buckets)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start_off", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("shard", expr(s"start_off div ${shardChars}L"))
      .groupBy(col("bucket"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bucket"), col("shard"))
  }

  /** Deterministic mixture sampling — the "upweight curated sources,
    * downweight crawl" step of corpus curation. Each source gets a
    * keep-rate from {1.0, 0.75, 0.5, 0.25} (here derived from the
    * source id; in production the rates arrive as a tiny broadcast
    * config dim) and each doc keeps or drops by comparing an md5-hash
    * integer against floor(rate·2^32) — exact integer thresholds, so
    * the sample is reproducible across engines and reruns, and a doc's
    * fate never depends on other docs. The hash key is salted with
    * ':mix' so mixture decisions are INDEPENDENT of pipeline_split's
    * (the same doc_id hashes differently for each decision).
    * Pure narrow map → one small agg; scales to any corpus. */
  /** SEEDED GLOBAL SHUFFLE + SHARD — the training-order step: every
    * epoch the corpus is read in a pseudo-random order, and that order
    * must be REPRODUCIBLE (resume mid-epoch, re-run a job, compare two
    * runs). Derive a 32-bit hash from (seed, doc_id), shard by hash
    * modulus, and rank WITHIN each shard by hash — a two-level order
    * (random shard, random order inside it), which is how real
    * pipelines shuffle at scale: the within-shard rank is a B-way
    * parallel PARTITIONED window; a single global row_number would
    * collapse 100 TB onto one task. Changing the seed permutes
    * everything; the same seed replays bit-identically on any engine
    * (integer-exact md5 arithmetic — the oracle recomputes it). */
  def shuffleShard(s: SparkSession, dir: String,
      nShards: Int = 8, seed: String = "epoch1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash32(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
    Tables(s, dir, "documents").select(col("doc_id"))
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
    val mixHash = hash32(concat(col("doc_id").cast("string"), lit(":mix")))
    // try_cast on BOTH engines: a source name that isn't 'srcN' falls
    // to the default 0.25 rate instead of Spark returning NULL while
    // the DuckDB oracle's plain CAST errors — divergence by accident.
    val keepBelow = expr(
      """case try_cast(substring(source, 4, 10) as int) % 4
        |  when 0 then 4294967296L when 1 then 3221225472L
        |  when 2 then 2147483648L else 1073741824L end""".stripMargin)
    docs
      .filter(mixHash < keepBelow)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("source"))
  }

  /** TEMPERATURE-RESAMPLED MIXTURE (the multinomial-temperature
    * reweighting of multilingual/multi-source training, α = 0.5): each
    * source's keep-rate is sqrt(n_src / n_max) — low-resource sources
    * keep everything, the dominant source is downsampled toward
    * balance. Rates DERIVE FROM THE DATA (one tiny count aggregate
    * broadcast back over the corpus), unlike [[mixtureSample]]'s fixed
    * config rates. Per-doc keep/drop compares a salted [[hash32]]
    * against floor(rate·2^32): sqrt, divide, multiply and floor are
    * all IEEE-exact (correctly rounded) double ops, so the integer
    * threshold — and therefore every doc's fate — is bit-identical on
    * any engine, rerun, or data order. Plan shape: tiny agg →
    * broadcast join → narrow filter → small agg; the corpus is
    * touched twice with no wide shuffle, so it scales to 100 TB. */
  def temperatureSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(max(col("n_src")).as("n_max"))))
      .select(col("source"), floor(sqrt(col("n_src").cast("double") /
        col("n_max").cast("double")) * lit(4294967296.0))
        .cast("long").as("keep_below"))
    val h = hash32(concat(col("doc_id").cast("string"), lit(":temp")))
    docs.join(broadcast(rates), Seq("source"))
      .filter(h < col("keep_below"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("source"))
  }

  /** SEQUENCE PACKING — the step between sharding and the trainer:
    * documents are laid end-to-end into fixed-capacity context windows
    * (here 2048 whitespace tokens) and the pipeline needs, per window,
    * how many docs start in it, how many tokens they carry, and how
    * many docs SPILL across the boundary (each spill is either a
    * truncation or a cross-doc attention leak — the quantity packing
    * exists to manage). Same parallel skeleton as [[shardPack]]:
    * bucket by doc_id, per-bucket running token sum (B-way parallel
    * partitioned window, never a global sort), window id = the slab
    * the doc's first token falls in — integer math only, reproducible
    * on any engine, which is what makes it oracle-checkable. */
  def packWindows(s: SparkSession, dir: String,
      buckets: Int = 8, windowTokens: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("win", expr(s"start div ${windowTokens}L"))
      .withColumn("spill",
        (expr(s"(start + tok - 1) div ${windowTokens}L") =!= col("win")).cast("long"))
      .groupBy(col("bucket"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"),
        sum(col("spill")).cast("long").as("n_spill"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bucket"), col("win"))
  }

  /** [[packWindows]] denominated in REAL tokenizer output: per-doc
    * token counts come from the trained BPE encoder
    * ([[TextAnalysis.bpeEncode]]'s n_tokens) instead of the whitespace
    * proxy — the packing a production run would actually ship to the
    * trainer, since context windows hold TOKENS, not words. Same
    * B-way-parallel skeleton (bucket by doc_id, partitioned running
    * sum, integer slab math); the encoder adds one vocab-dict join
    * pass over the corpus before the pack. Docs with no encodable
    * word (empty after whitespace split) carry zero tokens and are
    * absent on both sides by the same inner-join rule. */
  def packWindowsBpe(s: SparkSession, dir: String,
      buckets: Int = 8, windowTokens: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextAnalysis.bpeEncode(s, dir)
      .select(col("doc_id"), col("n_tokens").as("tok"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("win", expr(s"start div ${windowTokens}L"))
      .withColumn("spill",
        (expr(s"(start + tok - 1) div ${windowTokens}L") =!= col("win")).cast("long"))
      .groupBy(col("bucket"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"),
        sum(col("spill")).cast("long").as("n_spill"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bucket"), col("win"))
  }

  /** TRAINING-ORDER INTERLEAVE — the deterministic multi-source data
    * order a trainer actually consumes: each source's documents spread
    * evenly through the epoch by the standard low-discrepancy position
    * key (doc i of n_s at (2i+1)/(2·n_s) — stratified, so a
    * 4×-larger source appears 4× as often, never in bursts), total
    * order (key, source, doc_id). The first `head` positions ship as
    * the gated artifact (the head of the schedule pins the whole
    * construction — every source's cadence is visible there);
    * [[interleaveSchedule]] materializes the WHOLE order as sharded
    * blocks, the form a trainer consumes.
    *
    * Scale shape — NO per-source window: `row_number() OVER
    * (PARTITION BY source)` would serialize each source's ENTIRE row
    * set through one task (a handful of huge sources is the 100 TB
    * reality — the skew worst-case SURVEY §5 forbids and
    * pipeline_select/curriculum avoid). Instead the bucketed-rank
    * census: range-partition by (source, doc_id) into B
    * session-derived buckets (pinned — RangePartitioner re-samples
    * per action), collect the ≤B·|sources|-row count census,
    * broadcast per-source offsets + totals back, and the per-source
    * rank is the within-(bkt, source) row_number plus the bucket
    * offset — B-way parallel end to end, exact for ANY B (`buckets`
    * is the spec hook proving B=3 ≡ B=64). The head cut stays a TopK
    * (TakeOrderedAndProject — never a global sort materialization);
    * the key arithmetic is exact-integer inputs under one IEEE double
    * divide, deterministic across engines (the ann routing-key
    * doctrine). */
  def interleave(s: SparkSession, dir: String, head: Int = 100,
      buckets: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (pinned, ranked) = interleaveRanked(s, dir, buckets)
    val top = ranked.orderBy(col("key"), col("source"), col("doc_id"))
      .limit(head)
      .withColumn("pos", row_number().over(
        Window.orderBy(col("key"), col("source"), col("doc_id"))).cast("long"))
      .select(col("pos"), col("source"), col("doc_id"))
      .orderBy(col("pos"))
    // materialize the ≤head-row artifact NOW so the pinned bucket
    // assignment can release before returning (the curriculum
    // lifecycle); the post-cut window ranks ≤head rows — bounded
    val rows = top.collect().toIndexedSeq
    pinned.unpersist(blocking = false)
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, top.schema)
  }

  /** The interleave key frame (doc_id, source, key) with per-source
    * ranks from the bucketed census — exposed un-collected so
    * PlanContractSpec can pin the no-per-source-window shape.
    * Returns (pinned bucket assignment to unpersist, keyed frame). */
  private[graft] def interleaveRanked(s: SparkSession, dir: String,
      buckets: Option[Int] = None): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val b = buckets.getOrElse(Tables.sliceCount(s))
    val bucketed = docs
      .repartitionByRange(b, col("source"), col("doc_id"))
      .withColumn("bkt", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // census: per-(bucket, source) doc counts → per-source rank
    // offsets and totals (≤ B·|sources| rows to the driver)
    val counts = bucketed.groupBy(col("bkt"), col("source")).count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val nS = counts.groupBy(_._1._2).map { case (src, m) =>
      src -> m.values.sum }
    val offRows = counts.keys.toSeq.groupBy(_._2).toSeq.flatMap {
      case (src, ks) =>
        val ordered = ks.map(_._1).sorted
        val offs = ordered.map(bk => counts((bk, src))).scanLeft(0L)(_ + _)
        ordered.zip(offs).map { case (bk, off) => (bk, src, off, nS(src)) }
    }
    import s.implicits._
    val offDf = offRows.toDF("bkt", "source", "off", "n_s")
    val w = Window.partitionBy(col("bkt"), col("source"))
      .orderBy(col("doc_id"))
    val ranked = bucketed.join(broadcast(offDf), Seq("bkt", "source"))
      .withColumn("i", row_number().over(w).cast("long") - 1L + col("off"))
      .withColumn("key",
        (col("i") * 2L + 1L).cast("double") / (col("n_s") * 2L).cast("double"))
      .select(col("doc_id"), col("source"), col("key"))
    (bucketed, ranked)
  }

  /** FULL interleave SCHEDULE as sharded blocks — the consumable
    * artifact ([[interleave]]'s head-N is the gate; a training run
    * consumes the WHOLE order): every document gets its exact global
    * position in the interleave order, and positions cut into
    * `shards` near-equal CONTIGUOUS blocks (the first n%shards
    * shards take the extra row — curriculum's exact NTILE
    * arithmetic), so shard k is the k-th slice of the training
    * order. Output: the per-shard conservation census (doc count,
    * position range, id checksum, source spread) — the hash gate
    * pins every block boundary and the whole order's content.
    *
    * Scale shape: TWO bucketed censuses, zero global windows — the
    * per-source rank census of [[interleaveRanked]], then the same
    * trick again on the ORDER key ((key, source, doc_id)
    * range-partition → B-row count census → offsets broadcast →
    * within-bucket row_number + offset = exact global position). */
  def interleaveSchedule(s: SparkSession, dir: String, shards: Int = 8,
      buckets: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (pinned, ranked) = interleaveRanked(s, dir, buckets)
    val b = buckets.getOrElse(Tables.sliceCount(s))
    val bucketed2 = ranked
      .repartitionByRange(b, col("key"), col("source"), col("doc_id"))
      .withColumn("bkt2", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = bucketed2.groupBy(col("bkt2")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val offsets = (0 until b).scanLeft(0L)((acc, i) =>
      acc + counts.getOrElse(i, 0L)).toArray
    val offCol = element_at(
      array(offsets.take(b).map(lit): _*), col("bkt2") + 1)
    val w = Window.partitionBy(col("bkt2"))
      .orderBy(col("key"), col("source"), col("doc_id"))
    // near-equal contiguous shards (exact NTILE arithmetic); when
    // n < shards the first branch covers every position, so the
    // guarded else-divisor is unreachable — both engines agree
    val sz0 = n / shards
    val sz = math.max(sz0, 1L)
    val big = n % shards
    val cut = big * (sz0 + 1)
    val agg = bucketed2
      .withColumn("pos", row_number().over(w).cast("long") + offCol)
      .withColumn("shard",
        when(col("pos") <= cut,
          floor((col("pos") - 1) / (sz0 + 1)).cast("long"))
          .otherwise(lit(big) +
            floor((col("pos") - cut - 1) / sz).cast("long")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        sum(col("doc_id")).as("id_sum"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("shard"))
    val rows = agg.collect().toIndexedSeq
    bucketed2.unpersist(blocking = false)
    pinned.unpersist(blocking = false)
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, agg.schema)
  }

  /** PACKED-WINDOW DOCUMENT SPANS — the attention-mask metadata a
    * packer ships next to the id streams: context windows hold tokens
    * from MULTIPLE documents, and the trainer masks cross-document
    * attention from exactly this artifact (block-diagonal masks /
    * position-id resets), so every window carries its ordered
    * `local_offset:token_count` span list. Same B-way pack skeleton
    * as [[packWindowsBpe]] (real BPE token counts, bucketed running
    * sums); a spilling doc's span records its full length from its
    * window-local start — the mask generator clips at the window
    * edge. The comma-joined span string rides the hash gate, so the
    * oracle pins every boundary at every position. */
  def packSpans(s: SparkSession, dir: String,
      buckets: Int = 8, windowTokens: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextAnalysis.bpeEncode(s, dir)
      .select(col("doc_id"), col("n_tokens").as("tok"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("win", expr(s"start div ${windowTokens}L"))
      .withColumn("off", col("start") - col("win") * lit(windowTokens))
      .groupBy(col("bucket"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        expr("concat_ws(',', transform(array_sort(" +
          "collect_list(struct(doc_id, off, tok))), " +
          "x -> concat(cast(x.off AS string), ':', cast(x.tok AS string))))")
          .as("spans"))
      .orderBy(col("bucket"), col("win"))
  }

  /** BEST-FIT-DECREASING context packing (`pipeline_pack_bfd`) — the
    * boundary-spill killer production packers ship next to greedy
    * concat-and-spill ([[packWindows]]): within each FIXED-SIZE
    * packing unit (contiguous `doc_id div bucketDocs` blocks — so
    * per-unit state and work stay BOUNDED regardless of corpus
    * scale, and units parallelize perfectly), docs sort by (token
    * count DESC, doc_id) and each places into the open window with
    * the LEAST remaining capacity that still fits (ties → the
    * earliest-opened window); a doc longer than the window opens its
    * own oversize window (negative slack flags it). The whole fold
    * is a deterministic integer recurrence — best-fit selection is
    * `min((W - fill)·100000 + index)` over the fitting windows, the
    * same arithmetic the DuckDB oracle replays via a recursive CTE,
    * so every window's (count, fill, first doc) hashes exactly.
    *
    * Scale shape: one narrow scan (doc_id + token count — text never
    * rides), ONE shuffle (groupBy unit), then a per-unit Catalyst
    * `aggregate` higher-order fold over ≤`bucketDocs` collected
    * structs — no UDF, no driver loop, no window function at all. */
  def packBfd(s: SparkSession, dir: String, bucketDocs: Long = 256L,
      windowTokens: Long = 2048L): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"),
        expr(s"doc_id div ${bucketDocs}L").as("bucket"))
    // sort key: struct(-tok, doc_id) ascending = (tok DESC, doc_id)
    val lists = docs
      .groupBy(col("bucket"))
      .agg(expr("sort_array(collect_list(struct(-tok AS ntk, doc_id)))")
        .as("ds"))
    val W = windowTokens
    val fold =
      s"""aggregate(
         |  ds,
         |  CAST(array() AS ARRAY<STRUCT<fill: BIGINT, n: BIGINT, first: BIGINT>>),
         |  (st, d) -> CASE
         |    WHEN size(filter(st, w -> w.fill - d.ntk <= ${W}L)) = 0
         |      THEN concat(st, array(struct(-d.ntk AS fill,
         |        CAST(1 AS BIGINT) AS n, d.doc_id AS first)))
         |    ELSE transform(st, (w, i) -> IF(i = CAST(
         |        array_min(transform(filter(transform(st,
         |            (w2, i2) -> struct(w2.fill AS fill, i2 AS i)),
         |          c -> c.fill - d.ntk <= ${W}L),
         |          c -> (${W}L - c.fill) * 100000L + c.i)) % 100000L AS INT),
         |      struct(w.fill - d.ntk AS fill, w.n + 1L AS n,
         |        w.first AS first), w))
         |  END)""".stripMargin
    lists
      .select(col("bucket"), posexplode(expr(fold)).as(Seq("win", "w")))
      .select(col("bucket"), col("win").cast("long").as("win"),
        col("w.n").as("n_docs"), col("w.fill").as("fill_tokens"),
        col("w.first").as("first_doc"),
        (lit(W) - col("w.fill")).as("slack"))
      .orderBy(col("bucket"), col("win"))
  }

  /** DATASET CARD — the per-source datasheet a curated corpus ships
    * with (datasheets-for-datasets / dataset-card practice), composed
    * from the library's own oracle-green signals in ONE census row per
    * source: doc and whitespace-token counts, exact-duplicate count
    * (docs that are not their text group's keeper — dedup_exact's
    * min-doc_id rule), contamination count (non-eval docs sharing ≥1
    * 5-gram with the eval slice — contamination's machinery),
    * train/val/test split counts (pipeline_split's hash), and the
    * quality-gate pass count (text_quality's formula at corpusFilter's
    * 0.22 threshold). Every flag is a per-doc narrow map or one
    * bounded join; the card is one groupBy — the audit query a 100 TB
    * curation run prints before shipping. */
  def datasetCard(s: SparkSession, dir: String,
      minScore: Double = 0.22): DataFrame = {
    val docs = Tables.spread(Tables(s, dir, "documents"))
    // exact-dup flag: keeper = min doc_id of the text group
    val keeper = org.apache.spark.sql.expressions.Window.partitionBy(col("text"))
    val flagged = TextAnalysis.qualityFrame(docs)
      .withColumn("is_dup",
        (col("doc_id") =!= min(col("doc_id")).over(keeper)).cast("long"))
      .withColumn("split", splitCol(col("doc_id")))
      .select(col("doc_id"), col("source"), col("n_words"),
        col("is_dup"), col("split"), col("score"))
    // contamination flag: non-eval docs sharing >= 1 eval 5-gram
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.WordShingles
        .wordShingles(split(col("text"), " "), 5)).as("gh"))
    val evalGrams = grams.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("gh")).distinct()
    val contaminated = grams.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .join(broadcast(evalGrams), Seq("gh"))
      .select(col("doc_id")).distinct()
      .withColumn("is_contam", lit(1L))
    flagged.join(contaminated, Seq("doc_id"), "left")
      .na.fill(0L, Seq("is_contam"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("ws_tokens"),
        sum(col("is_dup")).cast("long").as("n_dups"),
        sum(col("is_contam")).cast("long").as("n_contaminated"),
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .cast("long").as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L))
          .cast("long").as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L))
          .cast("long").as("n_test"),
        sum(when(col("score") >= minScore, 1L).otherwise(0L))
          .cast("long").as("n_quality"))
      .orderBy(col("source"))
  }

  /** REPETITION PLANNING — the data-constrained-scaling step (how many
    * EPOCHS of each source a token budget buys): when a run wants more
    * tokens from a source than the source holds, it repeats the source
    * for multiple epochs — but repeated data stops helping after a few
    * passes, so the plan caps epochs (the data-constrained-scaling
    * result; 4 here) and reports the shortfall instead of pretending.
    * Each source's AVAILABLE tokens come from the corpus census; the
    * run's global budget splits equally across live sources (integer
    * div — the remainder is deliberately unallocated); epochs =
    * ceil(share / available) capped, effective = min(share,
    * epochs·available), shortfall = share − effective. All-integer →
    * engine-exact. One map-side-combined census, O(sources) rows after
    * — scales to any corpus. */
  def epochPlan(s: SparkSession, dir: String, budget: Long = 200000L,
      maxEpochs: Long = 4L): DataFrame = {
    val avail = Tables(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy(col("source"))
      .agg(sum(col("tok")).cast("long").as("available_tokens"))
    val nSrc = avail.agg(count(lit(1)).as("n_src"))
    avail.crossJoin(broadcast(nSrc))
      .withColumn("share", expr(s"${budget}L div n_src"))
      .withColumn("epochs",
        least(lit(maxEpochs),
          expr("(share + available_tokens - 1) div available_tokens")))
      .withColumn("effective_tokens",
        least(col("share"), col("epochs") * col("available_tokens")))
      .withColumn("shortfall", col("share") - col("effective_tokens"))
      .select(col("source"), col("available_tokens"), col("epochs"),
        col("effective_tokens"), col("shortfall"))
      .orderBy(col("source"))
  }

  /** END-TO-END TOKENIZE — the full preprocessing chain a training run
    * actually ships, composed from the library's own oracle-green
    * stages: the line-dedup REWRITE produces the cleaned corpus
    * ([[Dedup.cleanLines]] — boilerplate lines survive only at their
    * first global occurrence), a BPE tokenizer TRAINS on that CLEANED
    * text (training on text the model never sees would skew the
    * merges), every cleaned doc ENCODES with it, and the real token
    * counts PACK into 2048-token context windows ([[packWindows]]'s
    * skeleton). Newlines collapse to spaces before tokenization (the
    * whitespace tokenizer's contract; reassembled docs carry them).
    *
    * Scale: the O(vocab) training rounds + one dict join + the B-way
    * pack — every stage individually proven; this query oracle-checks
    * their COMPOSITION (the DuckDB form chains the same CTEs). The
    * cleaned corpus is deliberately NOT cached here, so the cleanLines
    * rewrite executes twice (vocab census + encode pass) — the
    * stateless-plan trade; a production run materializes the cleaned
    * corpus as a table between the stages (LogTable ingest, the
    * pipeline_ingest_dedup shape) and both passes read it back, which
    * is the same two reads without holding corpus-scale cache. Docs
    * whose every line was boilerplate clean to '' and drop out of
    * packing on both sides (no encodable word). */
  def tokenizePipeline(s: SparkSession, dir: String, buckets: Int = 8,
      windowTokens: Long = 2048L, rounds: Int = 5): DataFrame = {
    val cleaned = cleanedDocs(s, dir)
    tokenizeFrom(cleanedVocab(s, dir, rounds), cleaned,
      buckets, windowTokens)
  }

  /** [[tokenizePipeline]] one inch further — the packed token-id
    * SEQUENCES themselves, the artifact a training run actually
    * consumes: every context window carries its ordered id stream
    * (comma-joined, so the oracle hash pins every id at every
    * position), assembled from the cleaned corpus by the same
    * clean → train → encode → pack chain. Whole docs assign to the
    * window their running-sum start falls in (pipeline_pack's
    * skeleton; a spilling doc's ids stay with its window — the pack
    * census counts the spills).
    *
    * Scale: per-word ordered id lists live on the O(vocab) dict; the
    * corpus crosses the wire once as (doc_id, ids)
    * ([[TextAnalysis.bpeEncodeIds]] — the O(corpus) floor for any
    * pass whose output is the token stream); windows are
    * windowTokens-bounded, so each per-(bucket, win) reassembly holds
    * ~2048 longs, never a corpus-scale collect. */
  def tokenizeIds(s: SparkSession, dir: String, buckets: Int = 8,
      windowTokens: Long = 2048L, rounds: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextAnalysis
      .bpeEncodeIds(cleanedVocab(s, dir, rounds), cleanedDocs(s, dir))
      .select(col("doc_id"), col("ids"),
        size(col("ids")).cast("long").as("tok"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("win", expr(s"start div ${windowTokens}L"))
      .groupBy(col("bucket"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        expr("concat_ws(',', transform(flatten(transform(" +
          "array_sort(collect_list(struct(doc_id, ids))), x -> x.ids)), " +
          "t -> cast(t AS string)))").as("ids"))
      .orderBy(col("bucket"), col("win"))
  }

  /** Bench warm-up hook: trains the cleaned-corpus tokenizer once so
    * timed tokenize-chain samples measure warm encodes, not the
    * one-time training (the ann_* index warm-up's twin). */
  private[graft] def warmTokenizer(s: SparkSession, dir: String,
      rounds: Int = 5): Unit = {
    cleanedVocab(s, dir, rounds)
    ()
  }

  private def cleanedDocs(s: SparkSession, dir: String): DataFrame =
    Dedup.cleanLines(s, dir).select(col("doc_id"),
      replace(col("clean_text"), lit("\n"), lit(" ")).as("text"))

  private val cleanedVocabCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), DataFrame]()

  /** The tokenizer trained on the CLEANED corpus, cached per
    * (corpus dir, rounds) — the train-once shape shared by the
    * stateless and materialized tokenize forms (the cleaned corpus is
    * a deterministic function of the raw one, so one training serves
    * both). */
  private def cleanedVocab(s: SparkSession, dir: String,
      rounds: Int): DataFrame =
    cleanedVocabCache.computeIfAbsent((dir, rounds),
      _ => TextAnalysis.bpeTrainDf(cleanedDocs(s, dir), rounds)._2)

  /** [[tokenizePipeline]] with the cleaned corpus MATERIALIZED into a
    * LogTable between the stages — the production shape the stateless
    * form's docstring names: the rewrite runs ONCE and commits (an
    * auditable, time-travelable artifact of the curation run), then
    * tokenizer training and encoding both read the table back. Same
    * answer by construction, so it shares pipeline_tokenize's oracle —
    * which makes the hash gate prove the LAKE ROUNDTRIP preserves the
    * rewrite byte-for-byte (a lossy text write/read would diverge the
    * token counts). */
  def tokenizePipelineTbl(s: SparkSession, dir: String, buckets: Int = 8,
      windowTokens: Long = 2048L, rounds: Int = 5): DataFrame = {
    import graft.sources.LogTable
    val table = LogTable(s, graft.Scratch.dir("graft_pipe_clean_").toString)
    table.append(cleanedDocs(s, dir))
    // training shares the cached cleaned-corpus vocab (identical
    // content either way); the ENCODE pass reads the TABLE — which is
    // what makes the shared oracle prove the lake roundtrip preserves
    // the rewrite
    tokenizeFrom(cleanedVocab(s, dir, rounds), table.read(),
      buckets, windowTokens)
  }

  /** The train→encode→pack tail over an already-cleaned (doc_id, text)
    * frame — shared by the stateless and the materialized forms. */
  private def tokenizeFrom(vocab: DataFrame, cleaned: DataFrame,
      buckets: Int, windowTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextAnalysis.bpeEncodeWith(vocab, cleaned)
      .select(col("doc_id"), col("n_tokens").as("tok"),
        pmod(col("doc_id"), lit(buckets)).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("win", expr(s"start div ${windowTokens}L"))
      .withColumn("spill",
        (expr(s"(start + tok - 1) div ${windowTokens}L") =!= col("win")).cast("long"))
      .groupBy(col("bucket"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"),
        sum(col("spill")).cast("long").as("n_spill"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("bucket"), col("win"))
  }

  /** DECONTAMINATION — the benchmark-hygiene gate every training run
    * needs: drop from the training corpus every document sharing ANY
    * 5-gram with the held-out eval set, then report what survives per
    * source. Composes the library's own pieces: the eval-gram set and
    * hit detection are [[Dedup.contamination]]'s exact machinery (the
    * distinct 5-gram hashes broadcast — at 100 TB the eval set is
    * tiny and the scan stays one broadcast-join pass), the survivor
    * census is an anti-join on doc_id. Docs too short to carry a
    * 5-gram cannot be contaminated and survive on both engines. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.spread(Tables(s, dir, "documents"))
      .select(col("doc_id"), explode(graft.functions.WordShingles
        .wordShingles(split(col("text"), " "), 5)).as("gh"))
    val evalGrams = grams.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("gh")).distinct()
    val contaminated = grams.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .join(broadcast(evalGrams), Seq("gh"))
      .select(col("doc_id")).distinct()
    Tables(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("source"))
  }

  /** INGEST-TIME dedup — the continuous-corpus production loop: each
    * arriving batch dedupes (a) within itself and (b) against the
    * ALREADY-COMMITTED corpus, and only the survivors append; the
    * dedup state IS the table (digests ride as a column — no side
    * index to keep consistent with the data). Batches are a
    * deterministic integer split (doc_id % 3 = arrival order) so the
    * oracle rebuilds every doc's fate: a text's keeper is its first
    * (batch, doc_id) occurrence.
    *
    * Scale shape — ZERO CORPUS SCAN per batch: the committed digest
    * set is an incrementally-maintained MATERIALIZED VIEW over the
    * corpus table (digest → count; [[graft.sources.MaterializedView]]),
    * refreshed O(batch) after every append under the MV's exactly-once
    * watermark. The cross-batch probe BROADCASTS the batch's digest
    * set (the small side — a batch is hours of data, the corpus is
    * 100 TB) against the MV's digest-ONLY files and anti-joins the
    * found set back: no corpus data file is ever opened by a probe
    * (plan-contract-pinned in PipelineSpec), and probe I/O is
    * O(distinct digests) of 32-hex bytes instead of O(corpus files)
    * opens. Only digests ever shuffle, never text. */
  def ingestDedup(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Scratch.dir("graft_ingest_dedup_")
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
    val (table, _) = ingestDedupLoop(s, d, work)
    table.read()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).cast("long").as("first_id"),
        max(col("doc_id")).cast("long").as("last_id"))
      .orderBy(col("source"))
  }

  /** The ingest loop itself, factored so the spec can pin its I/O
    * contract: folds `d` (doc_id, source, digest) in three
    * deterministic batches into a fresh corpus table under `work`,
    * maintaining the digest MV alongside. Returns (corpus, digest MV). */
  private[graft] def ingestDedupLoop(s: SparkSession, d: DataFrame,
      work: java.nio.file.Path)
      : (graft.sources.LogTable, graft.sources.MaterializedView) = {
    val table = graft.sources.LogTable(s, work.resolve("t").toString)
    val mv = graft.sources.MaterializedView(s, table,
      work.resolve("mv").toString, keyCols = Seq("digest"),
      aggs = Seq(graft.sources.MvAgg.Count("n")))
    // ONE corpus pass total (the near loop's r20 treatment): the
    // (doc_id, source, digest) frame pins for the whole loop, so each
    // batch's probe-broadcast subtree and append read the cache
    // instead of re-hashing the corpus per consumer per batch.
    val dp = d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dp.count()
    (0L until 3L).foreach { b =>
      val batch = dp.filter(pmod(col("doc_id"), lit(3L)) === b)
      // cross-batch exact probe builds from the BATCH's digest set —
      // identical to the keeper's (keeper selection never drops a
      // digest), so the broadcast-build job skips the keeper window
      val survivors0 = ingestSurvivors(table, mv, batch)
      // within-batch keeper: the digest's min doc_id, as a window min
      // over ONE digest exchange — the old groupBy+join paid the same
      // shuffle PLUS a broadcast build of the aggregate per batch
      // (guide §2.4: operations keyed alike share one exchange)
      val survivors = survivors0.withColumn("min_id",
          min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("digest"))))
        .filter(col("doc_id") === col("min_id"))
      // coalesce on the cached read: an un-coalesced append writes one
      // tiny parquet per shuffle partition per batch and the footer
      // pass dominates the loop
      table.append(survivors
        .select(col("doc_id"), col("digest"), col("source")).coalesce(4))
      // O(batch) fold into the digest MV — the probe structure stays
      // consistent with the corpus inside the MV's watermark contract
      mv.refresh()
      ()
    }
    dp.unpersist()
    (table, mv)
  }

  /** Cross-batch survivor frame for one within-batch-deduped `keep`:
    * digests the corpus already holds are probed against the digest
    * MV (never the corpus table), batch side broadcast both ways. */
  private[graft] def ingestSurvivors(table: graft.sources.LogTable,
      mv: graft.sources.MaterializedView, keep: DataFrame): DataFrame =
    if (table.currentVersion == 0L) keep
    else {
      val found = mv.read().select(col("digest"))
        .join(broadcast(keep.select(col("digest")).distinct()),
          Seq("digest"), "left_semi").distinct()
      keep.join(broadcast(found), Seq("digest"), "left_anti")
    }

  /** INGEST-TIME NEAR DEDUP — [[ingestDedup]]'s continuous-crawl loop
    * extended from the exact-digest MV to LSH BANDS: alongside the
    * digest MV the loop maintains a BAND INDEX (band key → stripe
    * signature, incrementally appended like the MV, laid out by
    * `mbucket(k1)` so a batch's probe opens ONLY its own bucket
    * footprint — [[nearProbe]]), every new batch probes it by
    * band-key join with the batch side broadcast, candidates verify
    * by exact stripe count (mm_dedup_near's ≥6-of-8 rule), and
    * near-dups QUARANTINE instead of appending. Near pairs arriving
    * in the SAME batch are caught too — the within-batch
    * smaller-id-sibling rule in [[nearFates]] (the r19 intra-batch
    * blind spot, closed). Every document's fate lands in an
    * auditable fate log — 'kept' | 'exact_dup' | 'near_dup' — the
    * artifact a curation run audits, and [[requeueStep]] is the
    * reviewed-release path back out of quarantine.
    *
    * The banded probe is EXACT by pigeonhole, not approximate: ≥6 of
    * 8 matching stripes leaves ≤2 mismatches, which can break at most
    * 2 of the 4 two-stripe bands — at least one band survives intact,
    * so every ≥6/8 pair IS a band candidate. The band join is purely
    * the scale device (only (band key, sig) rows shuffle — never
    * all-pairs, never text), while the oracle replays the plain
    * ∃-state-doc-with-≥6-matching-stripes rule.
    *
    * Near checks apply to docs of ≥64 chars (8 stripes of ≥8 chars);
    * shorter docs share empty tail stripes and would all collide, so
    * they dedup exactly only. A planted mutated slice (doc_id%7 docs
    * with the last 4 chars rewritten, landing in a DIFFERENT batch by
    * construction: +1000000 ≡ +1 mod 3) keeps the near gate
    * non-vacuous. */
  def ingestDedupNear(s: SparkSession, dir: String): DataFrame = {
    val work = graft.Scratch.dir("graft_ingest_near_")
    ingestDedupNearLoop(s, nearSigFrame(s, dir), work)._1
      .orderBy(col("doc_id"))
  }

  /** QUARANTINE LIFECYCLE as an ORACLE query (`pipeline_requeue`) —
    * the full audit loop a curation run needs on top of
    * [[ingestDedupNear]]: the three-batch near-dedup ingest, then a
    * CURATION DELETE of every planted-pair member still in state
    * (the `doc_id % 7 = 0` originals and the `+1000000` mutants —
    * a takedown of both sides of every near pair), then
    * [[requeueStep]]: every doc whose latest fate is 'near_dup'
    * re-probes against the post-delete state and — its twin now
    * gone — re-enters as 'requeued'. Output: the per-(source, fate)
    * census of the COMPLETE audit trail (loop verdicts + requeue
    * verdicts — a near_dup row AND its later requeued row both
    * count, the point of an append-only audit log). The DuckDB
    * oracle replays the whole lifecycle: loop, deletion, re-probe
    * with the same exact-keeper / state-near / within-batch rules. */
  def requeueNear(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val work = graft.Scratch.dir("graft_requeue_")
    val st = nearDedupState(s, work)
    val dp = nearSigFrame(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    dp.count()
    (0L until 3L).foreach { b =>
      ingestNearStep(st, dp.filter(pmod(col("doc_id"), lit(3L)) === b))
    }
    dp.unpersist()
    nearDelete(st,
      pmod(col("doc_id"), lit(7L)) === 0L || col("doc_id") >= 1000000L)
    requeueStep(st)
    st.fateLog.read()
      .groupBy(col("source"), col("fate"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("fate"))
  }

  /** The planted corpus's narrow signature frame
    * (doc_id, source, digest, sigs, len) — shared by the batch ingest
    * and the streaming form (stream_dedup_near). */
  private[graft] def nearSigFrame(s: SparkSession, dir: String): DataFrame = {
    // the planted mutants GENERATE from the same scan via explode —
    // one corpus pass, no Union node (a union here trips Spark's
    // Union-constraint rewrite — NoSuchElementException in
    // rewriteConstraints — once the loop's probe joins stack up)
    val all = Tables.spread(Tables(s, dir, "documents"))
      .select(col("source"), explode(expr(
        "CASE WHEN doc_id % 7 = 0 AND length(text) >= 64 THEN array(" +
          "struct(doc_id, text), " +
          "struct(doc_id + 1000000L AS doc_id, " +
          "concat(substring(text, 1, length(text) - 4), 'XXXX') AS text)) " +
          "ELSE array(struct(doc_id, text)) END")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("source"),
        col("r.text").as("text"))
    val stride = greatest(expr("(length(text) + 7) div 8"), lit(1L))
    val sigsCol = transform(sequence(lit(0L), lit(7L)), i =>
      pmod(conv(substring(md5(col("text").substr(i * stride + lit(1L),
        stride)), 1, 15), 16, 10).cast("long"), lit(1000000007L)))
    all.select(col("doc_id"), col("source"),
      md5(col("text")).as("digest"), sigsCol.as("sigs"),
      length(col("text")).cast("long").as("len"))
  }

  /** The near-dedup ingest loop, factored so the spec can pin its I/O
    * contract: folds `d` (doc_id, source, digest, sigs, len) in three
    * deterministic batches, maintaining the digest MV and the band
    * index alongside the corpus table. Returns (per-doc fate frame,
    * corpus table, band index). Probes read ONLY the MV and the band
    * index — never a corpus data file. */
  /** The per-corpus dedup state the near-ingest maintains: corpus
    * table, band index, fate log, digest MV — shared by the batch
    * loop and the streaming sink (stream_dedup_near). */
  private[graft] final case class NearDedupState(
      table: graft.sources.LogTable, bands: graft.sources.LogTable,
      fateLog: graft.sources.LogTable, mv: graft.sources.MaterializedView)

  /** Band-index bucket fan-out: the bands LogTable lays out by
    * `mbucket(k1)` into this many directories, so an arriving
    * batch's probe opens ONLY the buckets its own band keys hash
    * into ([[graft.sources.LogTable.readBuckets]]) instead of
    * streaming the whole index — the per-batch probe I/O bound a
    * steady-state 100 TB crawl needs. At cluster scale this is a
    * table property (hundreds of buckets); 8 keeps the harness's
    * file counts sane while proving the prune. */
  private[graft] val NearBandBuckets = 8

  private[graft] def nearDedupState(s: SparkSession,
      work: java.nio.file.Path): NearDedupState = {
    val table = graft.sources.LogTable(s, work.resolve("t").toString)
    NearDedupState(table,
      graft.sources.LogTable(s, work.resolve("bands").toString,
        hiddenBy = Seq(graft.sources.Transform.mbucket(NearBandBuckets, "k1"))),
      graft.sources.LogTable(s, work.resolve("fates").toString),
      graft.sources.MaterializedView(s, table,
        work.resolve("mv").toString, keyCols = Seq("digest"),
        aggs = Seq(graft.sources.MvAgg.Count("n"))))
  }

  private[graft] def nearBandRows(df: DataFrame): DataFrame = df
    .filter(col("len") >= 64L)
    .select(col("doc_id"), col("sigs"), explode(expr(
      "transform(sequence(0, 3), b -> " +
        "struct(b AS band, sigs[b * 2] AS k1, sigs[b * 2 + 1] AS k2))"))
      .as("bd"))
    .select(col("bd.band").as("band"), col("bd.k1").as("k1"),
      col("bd.k2").as("k2"), col("doc_id"), col("sigs"))

  private[graft] def ingestDedupNearLoop(s: SparkSession, d: DataFrame,
      work: java.nio.file.Path)
      : (DataFrame, graft.sources.LogTable, graft.sources.LogTable) = {
    import org.apache.spark.storage.StorageLevel
    val st = nearDedupState(s, work)
    // ONE corpus pass total: the narrow signature frame (never text)
    // pins for the whole loop, so the per-batch probe subtrees — each
    // broadcast build is its own job — read the cache instead of
    // re-deriving 8 stripe digests per doc per subtree. At production
    // scale batches arrive already materialized; this is the harness's
    // equivalent.
    val dp = d.persist(StorageLevel.MEMORY_AND_DISK)
    dp.count()
    (0L until 3L).foreach { b =>
      ingestNearStep(st, dp.filter(pmod(col("doc_id"), lit(3L)) === b))
    }
    dp.unpersist()
    (st.fateLog.read().select(col("doc_id"), col("source"), col("fate")),
      st.table, st.bands)
  }

  /** The bucket-pruned BAND-INDEX probe: the batch's band rows
    * (renamed new_id/new_sigs, broadcast) band-key-join ONLY the
    * index files whose `mbucket(k1)` directory is in the batch's own
    * bucket footprint — a bounded ≤[[NearBandBuckets]]-row collect of
    * the batch's derived bucket ids routes the read through
    * [[graft.sources.LogTable.readBuckets]], so per-batch probe I/O
    * scales with the BATCH's key spread, never with the steady-state
    * index size (the first thing a 100 TB continuous crawl asks
    * for). Candidates verify by the exact ≥6/8 stripe count. */
  private[graft] def nearProbe(st: NearDedupState,
      probeBands: DataFrame): DataFrame = {
    val bt = graft.sources.Transform.mbucket(NearBandBuckets, "k1")
    val ids = probeBands
      .select(bt.columnFor(org.apache.spark.sql.types.LongType).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    st.bands.readBuckets("k1", ids)
      .join(broadcast(probeBands
          .select(col("band"), col("k1"), col("k2"),
            col("doc_id").as("new_id"), col("sigs").as("new_sigs"))),
        Seq("band", "k1", "k2"))
      .filter(col("doc_id") =!= col("new_id"))
      .filter(expr("aggregate(zip_with(sigs, new_sigs, " +
        "(x, y) -> CAST(x = y AS INT)), 0, (acc, v) -> acc + v) >= 6"))
  }

  /** ONE pass decides every fate for an arriving batch (shared by the
    * ingest loop, the streaming sink, and the quarantine requeue):
    * the within-batch keeper id joins on as min(doc_id) per digest
    * (narrow rows — text never rides), the cross-state probes come
    * back as flag frames left-joined on — exact via the digest MV,
    * near via the bucket-pruned band probe — plus the WITHIN-BATCH
    * near rule: a doc is a near-dup of a SMALLER-id batch sibling
    * with ≥6/8 matching stripes (non-recursive — the sibling's own
    * fate does not matter — so the rule is a plain band self-join
    * the oracle replays verbatim; two near-duplicates arriving in
    * the SAME batch quarantine the younger instead of both slipping
    * in). A single when-chain names the fate, exact precedence over
    * near. Returns the batch + fate ∈ kept|exact_dup|near_dup
    * (UNPINNED — callers persist before mutating state) and a
    * release thunk for the probe-band pin, to call AFTER the fates
    * materialize. */
  private[graft] def nearFates(st: NearDedupState,
      batch0: DataFrame): (DataFrame, () => Unit) = {
    val (table, bands, mv) = (st.table, st.bands, st.mv)
    val shape = Seq("doc_id", "source", "digest", "sigs", "len").map(col)
    // PINNED: the keeper-ranked batch feeds the exact-probe build,
    // the flag chain AND (via probeBands) both near probes — each a
    // separate broadcast-build job that would otherwise re-run the
    // keeper shuffle (streaming micro-batches arrive unpersisted, so
    // this pin matters doubly there); caches fill lazily under the
    // caller's pre-mutation materialization. The keeper id is a
    // window min over ONE digest exchange — the old groupBy+join
    // shape paid the same shuffle PLUS a broadcast build of the
    // aggregate per batch (guide §2.4: operations keyed alike share
    // one exchange).
    val batch = batch0.withColumn("min_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("digest"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = batch.filter(col("doc_id") === col("min_id"))
    // cross-batch EXACT probe: the digest MV, never the corpus.
    // PINNED: two consumers (the band-frame anti-join and the exact
    // flag join) would otherwise each re-run the MV semi-join inside
    // their own broadcast build.
    val foundExact =
      if (table.currentVersion == 0L) None
      else Some(mv.read().select(col("digest"))
        .join(broadcast(keep.select(col("digest")).distinct()),
          Seq("digest"), "left_semi").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val afterExact = foundExact.fold(keep)(f =>
      keep.join(broadcast(f), Seq("digest"), "left_anti"))
    // PINNED: three consumers (the bucket-footprint collect, the
    // index probe's broadcast build, both sides of the within-batch
    // self join) — unpinned, each broadcast job would re-derive the
    // whole exact-probe subtree (the multi-consumer re-scan pitfall).
    // The bucket-footprint collect is the first action and fills the
    // cache — no separate count needed.
    val probeBands = nearBandRows(afterExact)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearIds =
      if (bands.currentVersion == 0L) None
      else Some(nearProbe(st, probeBands)
        .select(col("new_id").as("doc_id")))
    // within-batch near: band self-join, smaller-id sibling ≥6/8.
    // The broadcast side is the IDENTICAL projection nearProbe
    // broadcasts (band, k1, k2, new_id, new_sigs), so the physical
    // broadcast builds ONCE and is REUSED across both probes
    // (ReuseExchange dedupes on the canonical plan).
    val selfNear = probeBands
      .join(broadcast(probeBands.select(col("band"), col("k1"), col("k2"),
          col("doc_id").as("new_id"), col("sigs").as("new_sigs"))),
        Seq("band", "k1", "k2"))
      .filter(col("new_id") < col("doc_id"))
      .filter(expr("aggregate(zip_with(new_sigs, sigs, " +
        "(x, y) -> CAST(x = y AS INT)), 0, (acc, v) -> acc + v) >= 6"))
      .select(col("doc_id"))
    // ONE near flag: the state probe's hits and the within-batch hits
    // union into a single distinct id set, so the fate chain attaches
    // ONE broadcast join instead of two (both verdicts read
    // 'near_dup'; the union is semantics-neutral) — one fewer
    // distinct + broadcast build + join per batch (guide §2.4)
    val nearAny = nearIds.fold(selfNear)(n => n.unionByName(selfNear))
      .distinct()
    val withX = foundExact
      .fold(batch.withColumn("x", lit(null).cast("int")))(f =>
        batch.join(broadcast(f.withColumn("x", lit(1))),
          Seq("digest"), "left"))
    val fates = withX
      .join(broadcast(nearAny.withColumn("nr", lit(1))),
        Seq("doc_id"), "left")
      .withColumn("fate",
        when(col("doc_id") =!= col("min_id"), lit("exact_dup"))
          .when(col("x") === 1, lit("exact_dup"))
          .when(col("nr") === 1, lit("near_dup"))
          .otherwise(lit("kept")))
      .select(shape :+ col("fate"): _*)
    (fates, () => {
      probeBands.unpersist(blocking = false)
      foundExact.foreach(_.unpersist(blocking = false))
      batch.unpersist(blocking = false)
      ()
    })
  }

  /** The fate-log row shape: near-dup rows carry their signature
    * payload (digest, sigs, len) so the QUARANTINE lives inside the
    * audit log itself — [[requeueStep]] re-probes straight from it,
    * no separate quarantine table, no extra per-batch commit. Kept /
    * exact rows stay narrow (nulls). `withPayload` widens the
    * carried set (requeue rows keep payload on every row so replay
    * can rebuild survivors). */
  private[graft] def fateLogRows(fate: DataFrame,
      payloadFates: Seq[String]): DataFrame =
    fate.select(col("doc_id"), col("source"), col("fate"),
      when(col("fate").isin(payloadFates: _*), col("digest")).as("digest"),
      when(col("fate").isin(payloadFates: _*), col("sigs")).as("sigs"),
      when(col("fate").isin(payloadFates: _*), col("len")).as("len"))

  /** ONE arrival batch of the near-dedup ingest — the step both the
    * batch loop and the streaming foreachBatch sink run. `batch0` is
    * the batch's (doc_id, source, digest, sigs, len) frame. */
  private[graft] def ingestNearStep(st: NearDedupState,
      batch0: DataFrame, tag: String = ""): Unit = {
    import org.apache.spark.storage.StorageLevel
    val (table, bands, fateLog, mv) = (st.table, st.bands, st.fateLog, st.mv)
    // EXACTLY-ONCE under streaming replay: the FATE LOG commits first
    // and is the authoritative record of this batch's probe verdicts.
    // A replayed batch whose fates are already recorded must NOT
    // re-probe (the state tables may have advanced past the crash
    // point — a re-probe could see this batch's own band rows); it
    // reads its verdicts back and only replays the idempotent state
    // appends (per-tag skip) and the watermark-idempotent MV fold.
    if (tag.nonEmpty && fateLog.hasTag(tag)) {
      val recorded = fateLog.read().select(col("doc_id"), col("fate"))
        .join(batch0.select(col("doc_id"), col("source"), col("digest"),
          col("sigs"), col("len")), Seq("doc_id"))
      val survivors = recorded.filter(col("fate") === "kept")
        .persist(StorageLevel.MEMORY_AND_DISK)
      survivors.count()
      // independent tables commit CONCURRENTLY off the pinned frame
      // (guide §2.6 — the replays are per-tag idempotent either way)
      parallelStateCommit(
        () => {
          table.append(survivors
            .select(col("doc_id"), col("digest"), col("source")).coalesce(4),
            tag = tag)
          mv.refresh() // folds the table append — stays on its chain
          ()
        },
        () => { bands.append(nearBandRows(survivors).coalesce(4), tag = tag); () })
      survivors.unpersist()
      return
    }
    // PIN the batch's fates BEFORE any state mutation: three appends
    // consume this frame, and an unpinned lineage would re-probe
    // after the MV/band/table commits moved the state under it
    val (fates0, release) = nearFates(st, batch0)
    val fate = fates0.persist(StorageLevel.MEMORY_AND_DISK)
    fate.count() // materialize against the pre-mutation state
    release()
    // appends COALESCE on the cached read (upstream probe
    // parallelism untouched): an un-coalesced append writes one
    // tiny parquet file per shuffle partition per table per batch —
    // the footer-stats pass alone then dominates the loop
    val survivors = fate.filter(col("fate") === "kept")
    // the FATE LOG still commits FIRST — it is the authoritative
    // replay record (see the exactly-once note above); only the
    // INDEPENDENT state tables behind it commit concurrently
    // (guide §2.6: overlap independent jobs — the corpus-table chain
    // carries the MV fold, the band index rides its own thread; all
    // consume the pinned fate frame, already materialized above)
    fateLog.append(fateLogRows(fate, Seq("near_dup")).coalesce(4), tag = tag)
    parallelStateCommit(
      () => {
        table.append(survivors
          .select(col("doc_id"), col("digest"), col("source")).coalesce(4),
          tag = tag)
        mv.refresh()
        ()
      },
      () => { bands.append(nearBandRows(survivors).coalesce(4), tag = tag); () })
    fate.unpersist()
    ()
  }

  /** Dedicated bounded pool for [[parallelStateCommit]] — blocking
    * Spark actions must not ride the global fork-join pool (its
    * parallelism is CPU-count-shared with every other user, and a
    * blocked-forever branch there starves unrelated work). Daemon
    * threads, so a hung commit never blocks JVM exit. */
  private lazy val stateCommitPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, r => {
        val t = new Thread(r, "graft-state-commit")
        t.setDaemon(true)
        t
      }))

  /** Run independent state commits concurrently and propagate the
    * first failure — the guide §2.6 thread-pool shape for a lifecycle
    * loop whose per-table commits have no mutual ordering. The await
    * is FINITE: a branch hung past 30 minutes fails the step loudly
    * instead of hanging the lifecycle query forever. */
  private def parallelStateCommit(branches: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext = stateCommitPool
    Await.result(
      Future.sequence(branches.map(b => Future(b()))), 30.minutes)
    ()
  }

  /** Remove documents from the near-dedup state — corpus table, band
    * index, digest MV — the curation delete a quarantine review (or
    * a takedown) runs before [[requeueStep]] frees the docs the
    * deleted ones were holding hostage. COW deletes on both
    * LogTables; the MV follows through its retraction-or-full path. */
  private[graft] def nearDelete(st: NearDedupState,
      cond: org.apache.spark.sql.Column): Unit = {
    // MERGE-ON-READ marks, not COW rewrites: a takedown touches a
    // slice of (usually) every file — a COW path would rewrite the
    // whole corpus and band index for one curation op, while marks
    // are O(matched rows) and every probe read is delete-aware
    // anyway. Compaction folds the debt later on its own schedule.
    // The two tables are independent — their mark passes run
    // concurrently (guide §2.6); the MV fold follows its base.
    parallelStateCommit(
      () => {
        st.table.deleteMor(cond)
        st.mv.refreshOrFull()
        ()
      },
      () => { st.bands.deleteMor(cond); () })
    ()
  }

  /** QUARANTINE REQUEUE — the reviewed-release path the fate log's
    * 'near_dup' verdicts need to be more than a dead letter: every
    * doc whose LATEST fate is still 'near_dup' re-probes against
    * CURRENT state with the full arriving-batch semantics
    * ([[nearFates]]: exact keeper, MV probe, bucket-pruned band
    * probe, within-batch smaller-id rule) and the survivors are
    * admitted — a false-positive near-dup, or one whose twin was
    * since [[nearDelete]]d, re-enters instead of being dropped
    * forever. The audit trail APPENDS ('requeued' | 'requeue_exact'
    * | 'requeue_near' — payload kept on every row so replay can
    * rebuild survivors); exactly-once under replay via the same
    * fate-log tag contract as the ingest step. */
  private[graft] def requeueStep(st: NearDedupState,
      tag: String = ""): Unit = {
    import org.apache.spark.storage.StorageLevel
    val (table, bands, fateLog, mv) = (st.table, st.bands, st.fateLog, st.mv)
    val requeueFates = Seq("requeued", "requeue_exact", "requeue_near")
    if (tag.nonEmpty && fateLog.hasTag(tag)) {
      val survivors = fateLog.read().filter(col("fate") === "requeued")
        .persist(StorageLevel.MEMORY_AND_DISK)
      survivors.count()
      parallelStateCommit(
        () => {
          table.append(survivors
            .select(col("doc_id"), col("digest"), col("source")).coalesce(4),
            tag = tag)
          mv.refresh()
          ()
        },
        () => { bands.append(nearBandRows(survivors).coalesce(4), tag = tag); () })
      survivors.unpersist()
      return
    }
    val fl = fateLog.read()
    // RESOLVED = admitted ('requeued') or exact-dup at re-probe
    // ('requeue_exact' — exact dups drop forever, like the loop's).
    // 'requeue_near' does NOT resolve: the doc stays quarantined and
    // every later generation re-examines it (its twin may be deleted
    // between generations — the whole point of the lifecycle).
    val resolved = fl
      .filter(col("fate").isin("requeued", "requeue_exact"))
      .select(col("doc_id"))
    val q = fl.filter(col("fate") === "near_dup")
      .join(resolved, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("digest"), col("sigs"),
        col("len"))
    val (fates0, release) = nearFates(st, q)
    val fate = fates0
      .withColumn("fate",
        when(col("fate") === "kept", lit("requeued"))
          .when(col("fate") === "exact_dup", lit("requeue_exact"))
          .otherwise(lit("requeue_near")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    fate.count() // materialize against the pre-mutation state
    release()
    val survivors = fate.filter(col("fate") === "requeued")
    // fate log first (the replay record), then the independent state
    // tables concurrently — same shape as the ingest step
    fateLog.append(fateLogRows(fate, requeueFates).coalesce(4), tag = tag)
    parallelStateCommit(
      () => {
        table.append(survivors
          .select(col("doc_id"), col("digest"), col("source")).coalesce(4),
          tag = tag)
        mv.refresh()
        ()
      },
      () => { bands.append(nearBandRows(survivors).coalesce(4), tag = tag); () })
    fate.unpersist()
    ()
  }

  /** CURRICULUM ordering — anneal training data easy→hard: every doc
    * gets the text-quality score (the exact formula `text_quality`
    * oracle-pins), the corpus ranks by the total order (score, doc_id),
    * and standard NTILE(8) arithmetic cuts it into curriculum tiers
    * (first n%8 tiers take the extra row), summarized per tier. A
    * training run then feeds tiers in order (or reweights by tier).
    *
    * Scale shape — NO global-sort window: rows range-partition by the
    * rank key into B buckets, the global rank is each bucket's offset
    * (a B-row driver collect, the log_latency_pcts census pattern)
    * plus the within-bucket row_number, and the tier is integer
    * arithmetic on that rank — B-way parallel end to end; the result
    * is exact regardless of where sampling put the bucket boundaries. */
  def curriculum(s: SparkSession, dir: String, tiers: Int = 8,
      buckets: Option[Int] = None): DataFrame = {
    val scored = TextAnalysis
      .qualityFrame(Tables.spread(Tables(s, dir, "documents")))
      .select(col("doc_id"), col("score"))
    // B is pure parallelism policy (the plan is exact for any B):
    // session-derived via Tables.sliceCount so it scales with the
    // cluster — 64 on local[32], ~2000 on a 1000-core cluster — and
    // the data is read once into the pinned bucket
    // assignment; census + ranked aggregation read the cache.
    // `buckets` is a spec hook proving boundary-independence (B=3
    // and B=64 must hash identically).
    val b = buckets.getOrElse(Tables.sliceCount(s))
    // PINNED before the census: RangePartitioner seeds boundary
    // sampling with the RDD id, so unpersisted census + final passes
    // would draw different bucket boundaries at any SF where
    // partitions exceed the sampler's budget (the log_latency_pcts
    // doctrine) — the offsets would then disagree with the final
    // pass's bucket contents. Released after the eager tier collect.
    val bucketed = scored
      .repartitionByRange(b, col("score"), col("doc_id"))
      .withColumn("bkt", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // census: per-bucket counts → global rank offsets AND n (B rows)
    val counts = bucketed.groupBy(col("bkt")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val offsets = (0 until b).scanLeft(0L)((acc, i) =>
      acc + counts.getOrElse(i, 0L)).toArray
    val offCol = element_at(
      array(offsets.take(b).map(lit): _*), col("bkt") + 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("score"), col("doc_id"))
    // exact NTILE arithmetic over the exact global rank: the first
    // n%tiers tiers take ceil(n/tiers) rows, the rest floor(n/tiers)
    val sz = n / tiers
    val big = n % tiers
    val cut = big * (sz + 1)
    val ranked = bucketed
      .withColumn("r", row_number().over(w).cast("long") + offCol)
      .withColumn("tier",
        when(col("r") <= cut,
          floor((col("r") - 1) / (sz + 1)).cast("long") + 1)
          .otherwise(lit(big) +
            floor((col("r") - cut - 1) / sz).cast("long") + 1))
    val agg = ranked.groupBy(col("tier"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("tier"))
    // materialize the ≤tiers-row result NOW so the pinned bucket
    // assignment can release before returning (the q_ntile lifecycle)
    val rows = agg.collect().toIndexedSeq
    bucketed.unpersist(blocking = false)
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, agg.schema)
  }

  /** TOKEN-BUDGETED quality selection — the "fit the best N tokens of
    * each source into the mixture" step of corpus curation (every
    * data-mixing recipe caps a source at a token budget and wants the
    * highest-quality docs under the cap): docs rank per source by the
    * text-quality score (the formula oracle-pinned in `text_quality`),
    * and a doc is kept iff the per-source running token total THROUGH
    * it stays within the budget — a prefix cut of the quality-ordered
    * stream, deterministic and engine-replayable (ties fall to
    * doc_id). Output: per-source selection census (docs kept, tokens
    * kept, the score at the cut line).
    *
    * Scale shape: a per-source running sum needs a total order WITHIN
    * each source — but partitioning the window by raw `source` would
    * put each source on ONE task (sources are few and huge at 100 TB:
    * the skew worst-case). Instead the bucketed-census trick of
    * `pipeline_curriculum`/`pipeline_shard`: range-partition by
    * (source, score desc, doc_id) into B session-derived buckets, one
    * tiny (bkt, source) token census to the driver (≤ B·|sources|
    * rows), per-source prefix offsets broadcast back, and the running
    * sum is a B-way-parallel window WITHIN (bkt, source) plus the
    * bucket's offset — exact for ANY B (`buckets` is the spec hook
    * proving B=3 ≡ B=64); the corpus is read once into the pinned
    * assignment, census + final read the cache. */
  def budgetSelect(s: SparkSession, dir: String, budget: Long = 50000L,
      buckets: Option[Int] = None, realTokens: Boolean = false): DataFrame = {
    val (bucketed, agg) = budgetSelectPlanned(s, dir, budget, buckets, realTokens)
    // materialize the <=|sources|-row census NOW, release the pin
    val rows = agg.collect().toIndexedSeq
    bucketed.unpersist(blocking = false)
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, agg.schema)
  }

  /** The distributed plan behind [[budgetSelect]], exposed un-collected
    * so PlanContractSpec can assert its shape (the public operator
    * returns a driver-materialized census frame). Returns (pinned
    * bucket assignment to unpersist, result plan). */
  private[graft] def budgetSelectPlanned(s: SparkSession, dir: String,
      budget: Long = 50000L, buckets: Option[Int] = None,
      realTokens: Boolean = false): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis
      .qualityFrame(Tables.spread(Tables(s, dir, "documents")))
      .select(col("doc_id"), col("source"), col("n_words"), col("score"))
      // a NULL source would silently vanish from the census (NULL join
      // keys never match the broadcast offset frame, and the oracle's
      // GROUP BY would keep the NULL group) — fail loudly inline in
      // the scoring scan instead of dropping rows
      .withColumn("source",
        when(assert_true(col("source").isNotNull,
            lit("budgetSelect: NULL source — the bucket census and the " +
              "offset join key on source; repair the corpus upstream"))
          .isNull, col("source")))
      // realTokens: the budget denominates in the TRAINED tokenizer's
      // output (text_bpe_encode's n_tokens) instead of the whitespace
      // proxy — what a production mixing recipe actually caps. Docs
      // with no encodable word carry no tokens and drop from the
      // census on both sides (the encoder's inner-join rule).
      .transform(df =>
        if (!realTokens) df
        else df.drop("n_words").join(
          TextAnalysis.bpeEncode(s, dir)
            .select(col("doc_id"), col("n_tokens").as("n_words")),
          Seq("doc_id")))
    val b = buckets.getOrElse(Tables.sliceCount(s))
    // PINNED before the census — same rationale as curriculum/q_ntile:
    // unpersisted repartitionByRange re-samples boundaries per action
    // (RangePartitioner seeds with the RDD id), so the offset census
    // and the final pass must read ONE materialized assignment.
    val bucketed = scored
      .repartitionByRange(b, col("source"), col("score").desc, col("doc_id"))
      .withColumn("bkt", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // census: per-(bucket, source) token totals → per-source offsets
    // (range partitioning keeps each source's buckets contiguous and
    // score-ordered, so "earlier bucket" = "higher-scored prefix")
    val sums = bucketed.groupBy(col("bkt"), col("source"))
      .agg(sum(col("n_words")).as("toks"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // per-source prefix sums over bucket order — O(B·S log B) driver
    // work (B session-derived, S = live sources; both bounded)
    val offRows = sums.keys.toSeq.groupBy(_._2).toSeq.flatMap {
      case (src, ks) =>
        val ordered = ks.map(_._1).sorted
        val offs = ordered.map(b => sums((b, src))).scanLeft(0L)(_ + _)
        ordered.zip(offs).map { case (b, off) => (b, src, off) }
    }
    import s.implicits._
    val offDf = offRows.toDF("bkt", "source", "off")
    val w = Window.partitionBy(col("bkt"), col("source"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = bucketed.join(broadcast(offDf), Seq("bkt", "source"))
      .withColumn("run_toks", sum(col("n_words")).over(w) + col("off"))
      .withColumn("keep", col("run_toks") <= budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"),
        sum(when(col("keep"), col("n_words")).otherwise(0L))
          .cast("long").as("kept_tokens"),
        min(when(col("keep"), col("score"))).as("cut_score"))
      .orderBy(col("source"))
    (bucketed, agg)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curriculum" -> ((s, dir) => curriculum(s, dir)),
    "pipeline_ingest_dedup" -> (ingestDedup _),
    "pipeline_corpus" -> ((s, dir) => corpusFilter(s, dir)),
    "pipeline_split" -> ((s, dir) => splitAssign(s, dir)),
    "pipeline_shard" -> ((s, dir) => shardPack(s, dir)),
    "pipeline_mix" -> ((s, dir) => mixtureSample(s, dir)),
    "pipeline_temper" -> ((s, dir) => temperatureSample(s, dir)),
    "pipeline_pack" -> ((s, dir) => packWindows(s, dir)),
    "pipeline_pack_bpe" -> ((s, dir) => packWindowsBpe(s, dir)),
    "pipeline_tokenize" -> ((s, dir) => tokenizePipeline(s, dir)),
    "pipeline_tokenize_tbl" -> ((s, dir) => tokenizePipelineTbl(s, dir)),
    "pipeline_tokenize_ids" -> ((s, dir) => tokenizeIds(s, dir)),
    "pipeline_ingest_near" -> (ingestDedupNear _),
    "pipeline_requeue" -> (requeueNear _),
    "pipeline_pack_bfd" -> ((s, dir) => packBfd(s, dir)),
    "pipeline_pack_spans" -> ((s, dir) => packSpans(s, dir)),
    "pipeline_interleave" -> ((s, dir) => interleave(s, dir)),
    "pipeline_interleave_full" -> ((s, dir) => interleaveSchedule(s, dir)),
    "pipeline_select_bpe" -> ((s, dir) => budgetSelect(s, dir, realTokens = true)),
    "pipeline_epochs" -> ((s, dir) => epochPlan(s, dir)),
    "pipeline_card" -> ((s, dir) => datasetCard(s, dir)),
    "pipeline_decontaminate" -> (decontaminate _),
    "pipeline_shuffle" -> ((s, dir) => shuffleShard(s, dir)),
    "pipeline_select" -> ((s, dir) => budgetSelect(s, dir)),
  )

  /** The dedup_clean rewrite as a DuckDB CTE prefix ending in a
    * `cleaned(doc_id, text)` relation — shared by every oracle that
    * chains the tokenizer over the CLEANED corpus. */
  private val CleanedCte: String =
    """WITH l AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, chr(10))) AS line,
      |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS ord
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, line, ord,
      |    CASE WHEN length(line) >= 30 THEN
      |      row_number() OVER (PARTITION BY line ORDER BY doc_id, ord) = 1
      |    ELSE TRUE END AS keep
      |  FROM l),
      |cleaned AS (
      |  SELECT doc_id,
      |    replace(COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
      |      ORDER BY ord), ''), chr(10), ' ') AS text
      |  FROM m GROUP BY doc_id),
      |""".stripMargin

  /** Shared CTE prefix of the near-ingest oracle (planted corpus →
    * signatures → the three-batch state evolution with exact-keeper,
    * state-near and within-batch-near rules, ending at surv0/1/2) —
    * `pipeline_ingest_near` appends the loop-fate select,
    * `pipeline_requeue` appends the curation-delete + re-probe
    * extension on top. */
  private val nearLoopCte: String =
      """WITH pl AS (
        |  SELECT doc_id + 1000000 AS doc_id, source,
        |    substring(text, 1, length(text) - 4) || 'XXXX' AS text
        |  FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 64),
        |alld AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT doc_id, source, text FROM pl),
        |sg AS (
        |  SELECT doc_id, source, md5(text) AS digest,
        |    doc_id % 3 AS b, CAST(length(text) AS BIGINT) AS len,
        |    list_transform(range(0, 8), i ->
        |      ('0x' || substr(md5(substring(text,
        |          CAST(i * greatest((length(text) + 7) // 8, 1) + 1 AS BIGINT),
        |          greatest((length(text) + 7) // 8, 1))), 1, 15))::BIGINT
        |        % 1000000007) AS sigs
        |  FROM alld),
        |k AS (SELECT *, min(doc_id) OVER (PARTITION BY b, digest) AS keeper FROM sg),
        |w0 AS (SELECT * FROM k WHERE b = 0 AND doc_id = keeper),
        |nw0 AS (SELECT DISTINCT a.doc_id, a.source FROM w0 a JOIN w0 o
        |  ON o.doc_id < a.doc_id AND a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |    i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6),
        |surv0 AS (SELECT * FROM w0
        |  WHERE doc_id NOT IN (SELECT doc_id FROM nw0)),
        |w1 AS (SELECT * FROM k WHERE b = 1 AND doc_id = keeper),
        |e1 AS (SELECT * FROM w1 WHERE digest IN (SELECT digest FROM surv0)),
        |r1 AS (SELECT * FROM w1 WHERE digest NOT IN (SELECT digest FROM surv0)),
        |n1 AS (SELECT DISTINCT a.doc_id, a.source FROM r1 a JOIN surv0 o
        |  ON a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6
        |  UNION
        |  SELECT a.doc_id, a.source FROM r1 a JOIN r1 o
        |  ON o.doc_id < a.doc_id AND a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6),
        |surv1 AS (SELECT * FROM r1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM n1)),
        |st1 AS (SELECT * FROM surv0 UNION ALL SELECT * FROM surv1),
        |w2 AS (SELECT * FROM k WHERE b = 2 AND doc_id = keeper),
        |e2 AS (SELECT * FROM w2 WHERE digest IN (SELECT digest FROM st1)),
        |r2 AS (SELECT * FROM w2 WHERE digest NOT IN (SELECT digest FROM st1)),
        |n2 AS (SELECT DISTINCT a.doc_id, a.source FROM r2 a JOIN st1 o
        |  ON a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6
        |  UNION
        |  SELECT a.doc_id, a.source FROM r2 a JOIN r2 o
        |  ON o.doc_id < a.doc_id AND a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6),
        |surv2 AS (SELECT * FROM r2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM n2))""".stripMargin

  /** The loop's per-doc fate rows (the UNION body shared by the
    * ingest oracle's select and the requeue oracle's audit census). */
  private val nearLoopFates: String =
      """  SELECT doc_id, source, 'exact_dup' AS fate FROM k WHERE doc_id <> keeper
        |  UNION ALL SELECT doc_id, source, 'exact_dup' FROM e1
        |  UNION ALL SELECT doc_id, source, 'exact_dup' FROM e2
        |  UNION ALL SELECT doc_id, source, 'near_dup' FROM nw0
        |  UNION ALL SELECT doc_id, source, 'near_dup' FROM n1
        |  UNION ALL SELECT doc_id, source, 'near_dup' FROM n2
        |  UNION ALL SELECT doc_id, source, 'kept' FROM surv0
        |  UNION ALL SELECT doc_id, source, 'kept' FROM surv1
        |  UNION ALL SELECT doc_id, source, 'kept' FROM surv2""".stripMargin

  val oracles: Map[String, String] = Map(
    // the BFD fold replayed step-for-step: same (tok DESC, doc_id)
    // order, same min((W-fill)*100000+i) best-fit selection, via a
    // recursive CTE advancing every packing unit one doc per step
    "pipeline_pack_bfd" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |    doc_id // 256 AS bucket FROM documents),
        |o AS (SELECT *, CAST(row_number() OVER (PARTITION BY bucket
        |    ORDER BY tok DESC, doc_id) AS BIGINT) AS r FROM t),
        |nb AS (SELECT bucket, max(r) AS mx FROM o GROUP BY bucket),
        |f AS (
        |  SELECT bucket, CAST(0 AS BIGINT) AS r,
        |    CAST([] AS STRUCT(fill BIGINT, n BIGINT, first BIGINT)[]) AS st
        |  FROM (SELECT DISTINCT bucket FROM o)
        |  UNION ALL
        |  -- `best` hoists to a derived-table scalar: DuckDB binds a
        |  -- lambda WITHIN another lambda's body to the outer lambda's
        |  -- parameters, so the best-fit min must be computed outside
        |  -- the update lambda (the chained calls below are fine —
        |  -- no lambda body contains another lambda)
        |  SELECT bucket, r,
        |    CASE WHEN best IS NULL
        |      THEN list_append(st0, {'fill': tok,
        |        'n': CAST(1 AS BIGINT), 'first': did})
        |      ELSE list_transform(st0, (w, i) -> CASE WHEN i = best % 100000
        |        THEN {'fill': w.fill + tok, 'n': w.n + 1,
        |          'first': w.first} ELSE w END)
        |    END AS st
        |  FROM (
        |    SELECT f.bucket AS bucket, o.r AS r, f.st AS st0,
        |      o.tok AS tok, o.doc_id AS did,
        |      list_min(list_transform(list_filter(list_transform(f.st,
        |          (w2, i2) -> {'fill': w2.fill, 'i': i2}),
        |        c -> c.fill + o.tok <= 2048),
        |        c -> (2048 - c.fill) * 100000 + c.i)) AS best
        |    FROM f JOIN o ON o.bucket = f.bucket AND o.r = f.r + 1) s),
        |fin AS (SELECT f.bucket, f.st FROM f
        |  JOIN nb ON nb.bucket = f.bucket AND f.r = nb.mx)
        |SELECT bucket, CAST(e.win AS BIGINT) AS win,
        |  CAST(e.n AS BIGINT) AS n_docs,
        |  CAST(e.fill AS BIGINT) AS fill_tokens,
        |  CAST(e.first AS BIGINT) AS first_doc,
        |  CAST(2048 - e.fill AS BIGINT) AS slack
        |FROM (SELECT bucket, unnest(list_transform(st, (w, i) ->
        |    {'win': i - 1, 'n': w.n, 'fill': w.fill, 'first': w.first})) AS e
        |  FROM fin)
        |ORDER BY bucket, win""".stripMargin,
    "pipeline_requeue" ->
      (nearLoopCte + """,
        |allsurv AS (SELECT * FROM surv0
        |  UNION ALL SELECT * FROM surv1 UNION ALL SELECT * FROM surv2),
        |corpus2 AS (SELECT * FROM allsurv
        |  WHERE NOT (doc_id % 7 = 0 OR doc_id >= 1000000)),
        |q AS (SELECT k.* FROM k JOIN (
        |    SELECT doc_id FROM nw0 UNION SELECT doc_id FROM n1
        |    UNION SELECT doc_id FROM n2) nn USING (doc_id)),
        |qk AS (SELECT q.*, min(doc_id) OVER (PARTITION BY digest) AS rkeeper
        |  FROM q),
        |rqe AS (SELECT * FROM qk WHERE doc_id <> rkeeper
        |  OR digest IN (SELECT digest FROM corpus2)),
        |rqr AS (SELECT * FROM qk
        |  WHERE doc_id NOT IN (SELECT doc_id FROM rqe)),
        |rqn AS (SELECT DISTINCT a.doc_id, a.source FROM rqr a JOIN corpus2 o
        |  ON a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6
        |  UNION
        |  SELECT a.doc_id, a.source FROM rqr a JOIN rqr o
        |  ON o.doc_id < a.doc_id AND a.len >= 64 AND o.len >= 64
        |  AND list_sum(list_transform(range(1, 9),
        |      i -> CASE WHEN a.sigs[i] = o.sigs[i] THEN 1 ELSE 0 END)) >= 6),
        |rqk AS (SELECT * FROM rqr
        |  WHERE doc_id NOT IN (SELECT doc_id FROM rqn))
        |SELECT source, fate, CAST(count(*) AS BIGINT) AS n FROM (
        |""".stripMargin + nearLoopFates + """
        |  UNION ALL SELECT doc_id, source, 'requeue_exact' FROM rqe
        |  UNION ALL SELECT doc_id, source, 'requeue_near' FROM rqn
        |  UNION ALL SELECT doc_id, source, 'requeued' FROM rqk)
        |GROUP BY source, fate ORDER BY source, fate""".stripMargin),
    // curriculum tiers: the text_quality score formula (oracle-pinned
    // there) ranked by (score, doc_id) and cut by standard NTILE —
    // bucketed-rank arithmetic on the Spark side must equal the
    // engine's own window function
    // budget selection: the text_quality score formula ranked per
    // source by (score DESC, doc_id) with a running-token prefix cut —
    // the Spark side's bucketed offsets must equal the engine's own
    // per-source window
    "pipeline_select" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars_m,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS stop_hits
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words_l,
        |    CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
        |    CAST(stop_hits AS DOUBLE) / n_words AS stop_ratio, n_words
        |  FROM f),
        |sc AS (
        |  SELECT doc_id, source, n_words_l,
        |    stop_ratio * 0.5
        |      + least(1.0, CAST(n_words AS DOUBLE) / 200.0) * 0.3
        |      + least(1.0, avg_word_len / 8.0) * 0.2 AS score
        |  FROM g),
        |r AS (
        |  SELECT doc_id, source, n_words_l, score,
        |    sum(n_words_l) OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS run_toks
        |  FROM sc)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN run_toks <= 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN run_toks <= 50000 THEN n_words_l ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  min(CASE WHEN run_toks <= 50000 THEN score END) AS cut_score
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_curriculum" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars_m,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS stop_hits
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
        |    CAST(stop_hits AS DOUBLE) / n_words AS stop_ratio, n_words
        |  FROM f),
        |sc AS (
        |  SELECT doc_id,
        |    stop_ratio * 0.5
        |      + least(1.0, CAST(n_words AS DOUBLE) / 200.0) * 0.3
        |      + least(1.0, avg_word_len / 8.0) * 0.2 AS score
        |  FROM g),
        |r AS (
        |  SELECT doc_id, score,
        |    ntile(8) OVER (ORDER BY score, doc_id) AS tier
        |  FROM sc)
        |SELECT tier, count(*) AS n_docs,
        |  min(score) AS min_score, max(score) AS max_score,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM r GROUP BY tier ORDER BY tier""".stripMargin,
    // every doc's fate replays from the arrival order: a text's keeper
    // is its first (batch, doc_id) occurrence — md5 hex is identical
    // in both engines
    "pipeline_ingest_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) AS digest, doc_id % 3 AS b
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY digest ORDER BY b, doc_id) AS rn
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS first_id,
        |  CAST(max(doc_id) AS BIGINT) AS last_id
        |FROM k WHERE rn = 1
        |GROUP BY source ORDER BY source""".stripMargin,
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
    "pipeline_split" ->
      """WITH a AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < 3435973836
        |           THEN 'train'
        |         WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < 3865470566
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc
        |FROM a GROUP BY split ORDER BY split""".stripMargin,
    "pipeline_shard" ->
      """WITH a AS (
        |  SELECT doc_id, n_chars, doc_id % 8 AS bucket,
        |    CAST(coalesce(sum(n_chars) OVER (
        |      PARTITION BY doc_id % 8 ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM documents)
        |SELECT bucket, start_off // 65536 AS shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS first_doc
        |FROM a GROUP BY 1, 2 ORDER BY bucket, shard""".stripMargin,
    "pipeline_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS bucket,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, bucket, tok,
        |    CAST(coalesce(sum(tok) OVER (
        |      PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT bucket, start // 2048 AS win, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN (start + tok - 1) // 2048 <> start // 2048
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spill,
        |  min(doc_id) AS first_doc
        |FROM o GROUP BY 1, 2 ORDER BY bucket, win""".stripMargin,
    // the BPE-token pack: the full tokenizer-training CTE chain
    // (TextAnalysis.bpeEncodeCte) supplies per-word token counts, the
    // per-doc fold replaces the whitespace tok, the pack math is
    // pipeline_pack's verbatim
    "pipeline_pack_bpe" ->
      (TextAnalysis.bpeEncodeCte(5) + """,
        |t AS (
        |  SELECT doc_id, doc_id % 8 AS bucket,
        |    CAST(sum(n_toks) AS BIGINT) AS tok
        |  FROM d JOIN wt USING (word) GROUP BY doc_id),
        |o AS (
        |  SELECT doc_id, bucket, tok,
        |    CAST(coalesce(sum(tok) OVER (
        |      PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT bucket, start // 2048 AS win, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN (start + tok - 1) // 2048 <> start // 2048
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spill,
        |  min(doc_id) AS first_doc
        |FROM o GROUP BY 1, 2 ORDER BY bucket, win""".stripMargin),
    // the dataset card: every flag recomputed from first principles —
    // min-doc_id keeper rule, 5-gram eval contamination, the md5 split
    // hash, the quality formula at the 0.22 gate
    "pipeline_card" ->
      """WITH f AS (
        |  SELECT doc_id, source, text,
        |    length(text) AS n_chars_m,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS stop_hits,
        |    CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY text)
        |      THEN 1 ELSE 0 END AS is_dup,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, source, n_words, is_dup,
        |    CASE WHEN h < 3435973836 THEN 'train'
        |         WHEN h < 3865470566 THEN 'val' ELSE 'test' END AS split,
        |    (CAST(stop_hits AS DOUBLE) / n_words) * 0.5
        |      + least(1.0, CAST(n_words AS DOUBLE) / 200.0) * 0.3
        |      + least(1.0, (CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words) / 8.0) * 0.2
        |      AS score
        |  FROM f),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS grams
        |  FROM w WHERE len(ws) >= 5),
        |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        |ev AS (SELECT DISTINCT gram FROM e WHERE doc_id % 10 = 0),
        |bad AS (
        |  SELECT DISTINCT e.doc_id FROM e JOIN ev USING (gram)
        |  WHERE e.doc_id % 10 <> 0)
        |SELECT sc.source, count(*) AS n_docs,
        |  CAST(sum(sc.n_words) AS BIGINT) AS ws_tokens,
        |  CAST(sum(sc.is_dup) AS BIGINT) AS n_dups,
        |  CAST(sum(CASE WHEN bad.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST(sum(CASE WHEN sc.split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN sc.split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |  CAST(sum(CASE WHEN sc.split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN sc.score >= 0.22 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
        |FROM sc LEFT JOIN bad ON bad.doc_id = sc.doc_id
        |GROUP BY sc.source ORDER BY sc.source""".stripMargin,
    // integer epoch arithmetic over the per-source token census
    "pipeline_epochs" ->
      """WITH a AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
        |  FROM documents GROUP BY source),
        |n AS (SELECT count(*) AS n_src FROM a),
        |p AS (
        |  SELECT source, available_tokens, 200000 // n_src AS share,
        |    least(4, (200000 // n_src + available_tokens - 1) // available_tokens) AS epochs
        |  FROM a, n)
        |SELECT source, available_tokens, epochs,
        |  least(share, epochs * available_tokens) AS effective_tokens,
        |  share - least(share, epochs * available_tokens) AS shortfall
        |FROM p ORDER BY source""".stripMargin,
    // the BPE-token budget select: tokenizer CTEs give per-doc real
    // token counts (dt), scoring stays the whitespace-feature quality
    // formula, the per-source prefix cut runs over dt.tok
    "pipeline_select_bpe" ->
      (TextAnalysis.bpeEncodeCte(5) + """,
        |dt AS (
        |  SELECT doc_id, CAST(sum(n_toks) AS BIGINT) AS tok
        |  FROM d JOIN wt USING (word) GROUP BY doc_id),
        |f AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars_m,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS stop_hits
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
        |    CAST(stop_hits AS DOUBLE) / n_words AS stop_ratio, n_words
        |  FROM f),
        |sc AS (
        |  SELECT doc_id, source,
        |    stop_ratio * 0.5
        |      + least(1.0, CAST(n_words AS DOUBLE) / 200.0) * 0.3
        |      + least(1.0, avg_word_len / 8.0) * 0.2 AS score
        |  FROM g),
        |r AS (
        |  SELECT sc.doc_id, sc.source, dt.tok, sc.score,
        |    sum(dt.tok) OVER (PARTITION BY sc.source
        |      ORDER BY sc.score DESC, sc.doc_id
        |      ROWS UNBOUNDED PRECEDING) AS run_toks
        |  FROM sc JOIN dt USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN run_toks <= 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN run_toks <= 50000 THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  min(CASE WHEN run_toks <= 50000 THEN score END) AS cut_score
        |FROM r GROUP BY source ORDER BY source""".stripMargin),
    // the end-to-end chain: dedup_clean's rewrite CTEs produce the
    // cleaned relation, the tokenizer-training/encode CTEs run OVER it
    // (rel = "cleaned"), the pack tail is pipeline_pack's verbatim
    "pipeline_tokenize" ->
      (CleanedCte +
        TextAnalysis.bpeEncodeCte(5, "cleaned").stripPrefix("WITH ") + """,
        |t AS (
        |  SELECT doc_id, doc_id % 8 AS bucket,
        |    CAST(sum(n_toks) AS BIGINT) AS tok
        |  FROM d JOIN wt USING (word) GROUP BY doc_id),
        |o AS (
        |  SELECT doc_id, bucket, tok,
        |    CAST(coalesce(sum(tok) OVER (
        |      PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT bucket, start // 2048 AS win, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN (start + tok - 1) // 2048 <> start // 2048
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spill,
        |  min(doc_id) AS first_doc
        |FROM o GROUP BY 1, 2 ORDER BY bucket, win""".stripMargin),
    // the interleave replays exactly: per-source 0-based ranks by
    // doc_id, the (2i+1)/(2n) low-discrepancy key (exact-integer
    // inputs under one IEEE double divide), total order
    // (key, source, doc_id), first 100 positions
    "pipeline_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source,
        |    CAST(i * 2 + 1 AS DOUBLE) / CAST(n_s * 2 AS DOUBLE) AS key
        |  FROM r)
        |SELECT CAST(row_number() OVER (ORDER BY key, source, doc_id) AS BIGINT) AS pos,
        |  source, doc_id
        |FROM k ORDER BY key, source, doc_id LIMIT 100""".stripMargin,
    // the FULL schedule: global interleave position + near-equal
    // contiguous shard blocks (exact NTILE arithmetic), reduced to
    // the per-shard conservation census
    "pipeline_interleave_full" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS BIGINT) AS i,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source,
        |    CAST(i * 2 + 1 AS DOUBLE) / CAST(n_s * 2 AS DOUBLE) AS key
        |  FROM r),
        |p AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (ORDER BY key, source, doc_id) AS BIGINT) AS pos,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM k),
        |sh AS (
        |  SELECT *, CASE WHEN pos <= (n % 8) * (n // 8 + 1)
        |    THEN (pos - 1) // (n // 8 + 1)
        |    ELSE (n % 8) + (pos - 1 - (n % 8) * (n // 8 + 1))
        |      // greatest(n // 8, 1) END AS shard
        |  FROM p)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(pos) AS first_pos, max(pos) AS last_pos,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    // the span artifact: pipeline_pack_bpe's exact CTEs with the
    // window-local offset carried through; string_agg in doc order
    // pins every document boundary in every window
    "pipeline_pack_spans" ->
      (TextAnalysis.bpeEncodeCte(5) + """,
        |t AS (
        |  SELECT doc_id, doc_id % 8 AS bucket,
        |    CAST(sum(n_toks) AS BIGINT) AS tok
        |  FROM d JOIN wt USING (word) GROUP BY doc_id),
        |o AS (
        |  SELECT doc_id, bucket, tok,
        |    CAST(coalesce(sum(tok) OVER (
        |      PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT bucket, start // 2048 AS win, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc,
        |  string_agg(CAST(start - (start // 2048) * 2048 AS VARCHAR)
        |    || ':' || CAST(tok AS VARCHAR), ',' ORDER BY doc_id) AS spans
        |FROM o GROUP BY 1, 2 ORDER BY bucket, win""".stripMargin),
    // the packed-sequence artifact: the clean-rewrite CTEs + the full
    // tokenizer chain + the SEQUENCE stages (per-word ordered id
    // lists, per-doc flattened streams), packed by pipeline_pack's
    // verbatim skeleton; the comma-joined id stream per window makes
    // the hash gate pin every id at every position
    "pipeline_tokenize_ids" ->
      (CleanedCte +
        TextAnalysis.bpeIdsCte(5, "cleaned").stripPrefix("WITH ") + """,
        |t AS (SELECT doc_id, doc_id % 8 AS bucket,
        |    CAST(len(dids) AS BIGINT) AS tok, dids FROM dd),
        |o AS (SELECT doc_id, bucket, tok, dids,
        |    CAST(coalesce(sum(tok) OVER (
        |      PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT bucket, start // 2048 AS win, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc,
        |  array_to_string(flatten(list(dids ORDER BY doc_id)), ',') AS ids
        |FROM o GROUP BY 1, 2 ORDER BY bucket, win""".stripMargin),
    // the near-dedup ingest replay: three sequential batches unrolled
    // as CTE stages (the BPE pattern), each probing the state built by
    // its predecessors — within-batch keeper rule, cross-batch digest
    // probe, then the ∃-state-doc-with-≥6-matching-stripes rule (the
    // banded Spark plan is exact for it by pigeonhole: ≤2 mismatches
    // can break at most 2 of the 4 two-stripe bands)
    "pipeline_ingest_near" ->
      (nearLoopCte + """
        |SELECT doc_id, source, fate FROM (
        |""".stripMargin + nearLoopFates + """
        |) ORDER BY doc_id""".stripMargin),
    // gram generation mirrors the contamination oracle exactly; a doc
    // survives iff NONE of its distinct 5-grams appears in the eval set
    "pipeline_decontaminate" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS grams
        |  FROM w WHERE len(ws) >= 5),
        |e AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g),
        |ev AS (
        |  SELECT DISTINCT gram FROM e WHERE doc_id % 10 = 0),
        |bad AS (
        |  SELECT DISTINCT e.doc_id FROM e JOIN ev USING (gram)
        |  WHERE e.doc_id % 10 <> 0)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc
        |FROM documents
        |WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_mix" ->
      """WITH a AS (
        |  SELECT doc_id, source, n_chars,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT AS h,
        |    CASE TRY_CAST(substring(source, 4, 10) AS INTEGER) % 4
        |      WHEN 0 THEN 4294967296 WHEN 1 THEN 3221225472
        |      WHEN 2 THEN 2147483648 ELSE 1073741824 END AS keep_below
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM a WHERE h < keep_below
        |GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_temper" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        |mx AS (SELECT max(n_src) AS n_max FROM counts),
        |rates AS (
        |  SELECT source, CAST(floor(sqrt(CAST(n_src AS DOUBLE) /
        |    CAST(n_max AS DOUBLE)) * 4294967296.0) AS BIGINT) AS keep_below
        |  FROM counts, mx)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars
        |FROM documents d JOIN rates r ON d.source = r.source
        |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8))::BIGINT
        |  < r.keep_below
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "pipeline_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5('epoch1' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, h % 8 AS shard,
        |  row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
  ).pipe(m =>
    // the MATERIALIZED tokenize computes the identical answer through
    // a LogTable roundtrip of the cleaned corpus — binding the SAME
    // oracle makes the hash gate prove the lake write/read preserves
    // the rewrite byte-for-byte
    m.updated("pipeline_tokenize_tbl", m("pipeline_tokenize")))
}
