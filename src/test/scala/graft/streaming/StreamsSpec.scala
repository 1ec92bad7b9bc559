package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sources.LogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Streaming specs run file-source micro-batches over the sf0.001
  * events corpus (the public file source is also the closest analog to
  * the reference's flush-directory ingest). */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  /** FileStreamSource needs an explicit schema; take it from the real
    * file (corpus generations differ: int64-ns Long vs timestamp[us]),
    * with the same reader confs the batch loader sets, and project to
    * the shared shape via the same adaptive ts_us conversion. */
  private lazy val eventsSchema: StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  private def tsUs = Tables.tsToUs(eventsSchema("ts").dataType)

  private def shape(df: DataFrame): DataFrame =
    df.withColumn("ts_us", tsUs)
      .select(timestamp_micros(col("ts_us")).as("event_time"),
        col("event_type"), col("value"), col("user_id"), col("ts_us"))

  /** FileStreamSource wants a DIRECTORY to watch (the reference's flush
    * directory); stage the single events.parquet file into one. */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("events_stream_src")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def eventsStream(): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    shape(spark.readStream.schema(eventsSchema).parquet(eventsDir))
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation",
        Files.createTempDirectory(s"ckpt_$name").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "query did not finish in time")
  }

  test("stream_window: watermarked tumbling agg equals the batch query") {
    runToMemory(Streams.streamWindow(eventsStream()), "sw", "complete")
    val streamed = spark.table("sw")
      .orderBy(col("w_start"), col("event_type"))
      .collect().toSeq
    val batch = Streams.eventsTumbling(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("stream_ingest: each micro-batch is one atomic LogTable commit") {
    val table = LogTable(spark,
      Files.createTempDirectory("stream_ingest_").toString)
    val ckpt = Files.createTempDirectory("ckpt_ingest").toString
    val q = Streams.streamIngest(eventsStream(), table, ckpt)
    assert(q.awaitTermination(120000), "ingest query did not finish in time")

    val expected = Tables.events(spark, sfDir).count()
    assert(table.read().count() === expected)
    // every commit is an append from exactly one micro-batch
    assert(table.versions.nonEmpty)
    assert(table.versions === (1L to table.currentVersion))
    assert(table.snapshot().operation === "append")
    // restart from the same checkpoint: no new input → no new commits
    val preVersion = table.currentVersion
    val q2 = Streams.streamIngest(eventsStream(), table, ckpt)
    assert(q2.awaitTermination(120000), "restarted query did not finish in time")
    assert(table.currentVersion === preVersion)
    assert(table.read().count() === expected)
    // exactly-once under re-delivery: a crash after commit but before
    // the checkpoint advances re-runs the same batchId — the tagged
    // append must drop it instead of double-ingesting
    val batch = Tables.events(spark, sfDir).limit(10)
    val dupTag = table.snapshot().tag
    assert(dupTag.startsWith("stream-batch-"), s"commit missing batch tag: '$dupTag'")
    table.append(batch, tag = dupTag)
    assert(table.currentVersion === preVersion, "re-delivered batch must not commit")
    assert(table.read().count() === expected)
  }

  test("stream rollup: batches land and fold into the materialized view; restart changes nothing") {
    import graft.sources.{MaterializedView, MvAgg}
    val base = LogTable(spark,
      Files.createTempDirectory("stream_mv_base_").toString)
    val mv = MaterializedView(spark, base,
      Files.createTempDirectory("stream_mv_view_").toString,
      Seq("event_type"),
      Seq(MvAgg.Count("n"), MvAgg.Sum("total", graft.Cols.money(col("value")))))
    val ckpt = Files.createTempDirectory("ckpt_mv").toString
    val q = Streams.streamRollup(eventsStream(), mv, ckpt)
    assert(q.awaitTermination(120000), "rollup query did not finish in time")

    // view contents equal the from-scratch aggregate (decimal sums:
    // exact under any fold order)
    val batchShaped = shape(spark.read.schema(eventsSchema).parquet(eventsDir))
    val expected = batchShaped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(graft.Cols.money(col("value"))).as("total"))
      .orderBy(col("event_type")).collect().toSeq
    def viewRows() = mv.read()
      .select(col("event_type"), col("n"), col("total"))
      .orderBy(col("event_type")).collect().toSeq
    assert(viewRows() === expected)
    assert(mv.refreshedVersion === base.currentVersion)

    // restart from the same checkpoint: no new input → no base commit,
    // no view commit, identical contents
    val (baseV, viewV) = (base.currentVersion, mv.table.currentVersion)
    val q2 = Streams.streamRollup(eventsStream(), mv, ckpt)
    assert(q2.awaitTermination(120000), "restarted query did not finish in time")
    assert(base.currentVersion === baseV)
    assert(mv.table.currentVersion === viewV)
    assert(viewRows() === expected)
  }

  test("stream rollup with SKETCH state: HLL distinct-users folds across micro-batches, exactly-once") {
    import graft.sources.{MaterializedView, MvAgg}
    val base = LogTable(spark,
      Files.createTempDirectory("stream_hll_base_").toString)
    val mv = MaterializedView(spark, base,
      Files.createTempDirectory("stream_hll_view_").toString,
      Seq("event_type"),
      Seq(MvAgg.Count("n"),
        // bounded user domain: HLL sparse mode stays EXACT, so the
        // streaming-folded sketch must equal the true distinct count
        MvAgg.ApproxDistinct("users", col("user_id") % 200L),
        MvAgg.Avg("avg_cents",
          (graft.Cols.money(col("value")) * 100).cast("long"))))
    val ckpt = Files.createTempDirectory("ckpt_hll").toString
    val q = Streams.streamRollup(eventsStream(), mv, ckpt)
    assert(q.awaitTermination(120000), "rollup query did not finish in time")

    val batchShaped = shape(spark.read.schema(eventsSchema).parquet(eventsDir))
    val expected = batchShaped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id") % 200L).as("users"),
        (sum((graft.Cols.money(col("value")) * 100).cast("long")).cast("double") /
          count(lit(1))).as("avg_cents"))
      .orderBy(col("event_type")).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def viewRows() = mv.read()
      .select(col("event_type"), col("n"), col("users"), col("avg_cents"))
      .orderBy(col("event_type")).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viewRows() === expected,
      "per-batch sketch unions must converge to the exact distinct counts")

    // restart: nothing re-folds, sketches unchanged
    val (baseV, viewV) = (base.currentVersion, mv.table.currentVersion)
    val q2 = Streams.streamRollup(eventsStream(), mv, ckpt)
    assert(q2.awaitTermination(120000), "restarted query did not finish in time")
    assert(base.currentVersion === baseV && mv.table.currentVersion === viewV)
    assert(viewRows() === expected)
  }

  test("stream ingest composes with incremental reads: a consumer sees only new commits") {
    val table = LogTable(spark,
      Files.createTempDirectory("stream_incr_").toString)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // initial commit: even-user events, batch-shaped identically to
    // what the stream will append
    val batchShaped = shape(spark.read.schema(eventsSchema).parquet(eventsDir))
    table.append(batchShaped.filter(col("user_id") % 2 === 0))
    val consumerCursor = table.currentVersion
    // continuous ingest lands the odd-user events after the cursor
    val q = Streams.streamIngest(
      eventsStream().filter(col("user_id") % 2 === 1),
      table, Files.createTempDirectory("ckpt_incr").toString)
    assert(q.awaitTermination(120000), "ingest did not finish in time")
    // the incremental consumer reads EXACTLY what streamed in after
    // its cursor — never the initial batch
    val delta = table.readChanges(consumerCursor)
    assert(delta.count() === batchShaped.filter(col("user_id") % 2 === 1).count())
    assert(delta.filter(col("user_id") % 2 === 0).count() === 0L)
    assert(table.read().count() === batchShaped.count())
  }

  test("table tail: continuous ingest + concurrent tail delivers every row exactly once, across compaction") {
    val src = LogTable(spark, Files.createTempDirectory("tail_src_").toString)
    val sink = LogTable(spark, Files.createTempDirectory("tail_sink_").toString)
    val tail = Streams.tableTail(src,
      Files.createTempDirectory("tail_ckpt_").toString)

    src.append((0 until 40).map(i => (i.toLong, s"a$i")).toDF("id", "v").coalesce(1))
    src.append((40 until 70).map(i => (i.toLong, s"b$i")).toDF("id", "v").coalesce(1))
    assert(Streams.tailInto(tail, sink) === 1) // one catch-up batch spans both commits
    assert(sink.read().count() === 70L)

    // in-loop maintenance between polls: compaction rewrites delivered
    // rows but the tail must NOT re-deliver them
    src.compact()
    src.append((70 until 100).map(i => (i.toLong, s"c$i")).toDF("id", "v"))
    Streams.tailInto(tail, sink)
    assert(sink.read().count() === 100L)
    assert(sink.read().select("id").distinct().count() === 100L)
    // nothing new → no-op poll
    assert(Streams.tailInto(tail, sink) === 0)
    assert(tail.cursor === src.currentVersion)
  }

  test("table tail: a crashed batch replays PINNED and the tagged sink dedups — exactly-once across restart") {
    val src = LogTable(spark, Files.createTempDirectory("tailr_src_").toString)
    val sink = LogTable(spark, Files.createTempDirectory("tailr_sink_").toString)
    val ckpt = Files.createTempDirectory("tailr_ckpt_").toString
    src.append((0 until 30).map(i => (i.toLong, "x")).toDF("id", "v"))

    // crash AFTER the sink committed but BEFORE the cursor advanced —
    // the window where at-least-once systems double-deliver
    val tail = Streams.tableTail(src, ckpt)
    intercept[RuntimeException] {
      tail.poll() { (df, from, to) =>
        sink.append(df, tag = tail.tag(from, to))
        throw new RuntimeException("consumer crashed before checkpoint")
      }
    }
    assert(tail.cursor === 0L) // cursor never advanced
    // the table moves on while the consumer is down
    src.append((30 until 50).map(i => (i.toLong, "y")).toDF("id", "v"))

    // restart: the pinned intent replays the IDENTICAL range first, so
    // the sink's batch tag matches and the re-delivery drops
    val tail2 = Streams.tableTail(src, ckpt)
    Streams.tailInto(tail2, sink)
    assert(sink.read().count() === 50L)
    assert(sink.read().select("id").distinct().count() === 50L)
    assert(tail2.cursor === src.currentVersion)
  }

  test("table tail fails loudly when the range contains a row-changing operation") {
    val src = LogTable(spark, Files.createTempDirectory("tailx_src_").toString)
    val tail = Streams.tableTail(src,
      Files.createTempDirectory("tailx_ckpt_").toString)
    src.append((0 until 10).map(i => (i.toLong, "x")).toDF("id", "v"))
    src.delete(col("id") < 3L)
    val e = intercept[IllegalStateException] {
      tail.poll() { (df, _, _) => df.count(); () }
    }
    assert(e.getMessage.contains("changes rows"))
  }

  test("stream_window sliding: streamed 30m/15m windows equal the batch sliding query") {
    runToMemory(Streams.streamWindow(eventsStream(),
      dur = "30 minutes", slide = "15 minutes"), "ssl", "complete")
    val streamed = spark.table("ssl")
      .orderBy(col("w_start"), col("event_type")).collect().toSeq
    val batch = Streams.eventsSliding(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("stream_dedup: duplicated input collapses to the distinct event set") {
    // stage the events file TWICE → every event arrives duplicated
    val d = Files.createTempDirectory("events_dup_src")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("a.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("b.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dup = spark.readStream.schema(eventsSchema).parquet(d.toString)
      .withColumn("ts_us", tsUs)
      .select(timestamp_micros(col("ts_us")).as("event_time"), col("event_id"))
    runToMemory(Streams.streamDedup(dup, Seq("event_id")), "sd", "append")
    val expected = Tables.events(spark, sfDir).count()
    assert(spark.table("sd").count() === expected)
    assert(spark.table("sd").select("event_id").distinct().count() === expected)
  }

  test("stream ingest with periodic maintenance: compaction bounds files, loses nothing") {
    // split events across several files so AvailableNow makes multiple batches
    val src = Files.createTempDirectory("events_multi_src")
    val parts = 4
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.schema(eventsSchema).parquet(s"$sfDir/events.parquet")
      .repartition(parts).write.parquet(src.toString + "/data")
    val stream = shape(spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString + "/data"))
    val table = LogTable(spark, Files.createTempDirectory("ingest_maint_").toString)
    val q = Streams.streamIngestWithMaintenance(stream, table,
      Files.createTempDirectory("ckpt_maint").toString, compactEvery = 2)
    assert(q.awaitTermination(180000), "maintenance ingest did not finish in time")
    assert(table.read().count() === Tables.events(spark, sfDir).count())
    assert(table.read().distinct().count() === table.read().count())
    // maintenance actually ran: the history shows compact commits
    val ops = table.history().select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("compact"), s"expected compact commits in $ops")
  }

  test("stream_ingest into a partitioned table: pruned reads see only their partition") {
    val table = LogTable(spark,
      Files.createTempDirectory("stream_ingest_part_").toString,
      partitionBy = Seq("event_type"))
    val q = Streams.streamIngest(eventsStream(), table,
      Files.createTempDirectory("ckpt_ingest_part").toString)
    assert(q.awaitTermination(120000), "partitioned ingest did not finish in time")
    val expected = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").count()
    val pruned = table.readWhere(_.get("event_type").contains("click"))
    assert(pruned.count() === expected)
    assert(table.snapshot().files.forall(_.partitions.contains("event_type")))
  }

  test("stream_enrich: stream-static broadcast join equals the batch join") {
    val dim = Tables(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = Streams.streamEnrich(
      eventsStream(), dim, "user_id", "c_custkey")
      .groupBy(col("c_mktsegment")).count()
    runToMemory(enriched, "se", "complete")
    val streamed = spark.table("se").orderBy(col("c_mktsegment")).collect().toSeq
    val batch = Tables.events(spark, sfDir)
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment")).count()
      .orderBy(col("c_mktsegment")).collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("stream_join: watermarked stream-stream join equals the batch interval join") {
    val clicks = eventsStream().filter(col("event_type") === "click")
    val purchases = eventsStream().filter(col("event_type") === "purchase")
    runToMemory(Streams.streamStreamJoin(clicks, purchases), "ssj", "append")
    val key = Seq("user_id", "click_time", "purchase_time", "value")
    val streamed = spark.table("ssj").orderBy(key.head, key.tail: _*)
      .collect().toSeq
    val ev = Streams.eventsShaped(spark, sfDir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("event_time").as("ct"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_time").as("pt"), col("value"))
    val batch = c.join(p, col("u") === col("pu") &&
        col("pt") >= col("ct") &&
        col("pt") <= col("ct") + expr("interval 30 minutes"))
      .select(col("u").as("user_id"), col("ct").as("click_time"),
        col("pt").as("purchase_time"), col("value"))
      .orderBy(key.head, key.tail: _*).collect().toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("stream_join outer: unmatched purchases emit with nulls once the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val clicksIn = MemoryStream[(Long, Long)](spark, 1)
    val purchasesIn = MemoryStream[(Long, Long, Double)](spark, 1)
    val clicks = clicksIn.toDF().toDF("t_s", "user_id")
      .select(timestamp_seconds(col("t_s")).as("event_time"), col("user_id"))
    val purchases = purchasesIn.toDF().toDF("t_s", "user_id", "value")
      .select(timestamp_seconds(col("t_s")).as("event_time"),
        col("user_id"), col("value"))
    val q = Streams.streamStreamJoinOuter(clicks, purchases)
      .writeStream.format("memory").queryName("ssjo").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_ssjo").toString)
      .start()
    try {
      // hour 0: user 1 purchase 500s after their click (matched);
      // user 2 purchase with no click at all (unmatched)
      clicksIn.addData((1000L, 1L))
      purchasesIn.addData((1500L, 1L, 10.0), (2000L, 2L, 20.0))
      q.processAllAvailable()
      // matched row emits immediately; the unmatched one must WAIT —
      // a click for user 2 could still arrive within the watermark
      val early = spark.table("ssjo").collect()
      assert(early.length === 1 && early.head.getLong(0) === 1L,
        s"only the matched purchase may emit before the watermark moves")
      // sentinel pair far in the future pushes the watermark on BOTH
      // streams past user 2's match window
      clicksIn.addData((100000L, 99L))
      purchasesIn.addData((100000L, 99L, 0.0))
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch applies the new watermark
      val rows = spark.table("ssjo").filter(col("user_id") < 10)
        .orderBy(col("user_id"))
        .select(col("user_id"), col("click_time").isNull.as("no_click"),
          col("value")).collect()
      assert(rows.map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).toSeq ===
        Seq((1L, false, 10.0), (2L, true, 20.0)))
    } finally q.stop()
  }

  test("stream heavy hitters equals the exact batch top-k under capacity") {
    runToMemory(
      Streams.streamHeavyHitters(eventsStream(), k = 10, capacity = 4096),
      "shh", "update")
    // update-mode memory sink keeps one row set per micro-batch; the
    // final estimate per user is the max (counts grow monotonically)
    val streamed = spark.table("shh")
      .groupBy(col("user_id")).agg(max(col("est_count")).as("est_count"))
      .select("user_id", "est_count").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(10)
      .select(col("user_id").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    // capacity 4096 >> distinct users at sf0.001 → sketch is exact:
    // identical keys AND identical counts
    assert(streamed === exact)
  }

  test("stream WAP: audited batches publish atomically; main's lineage is publish-only") {
    val table = LogTable(spark, Files.createTempDirectory("wap_").toString)
    val ckpt = Files.createTempDirectory("ckpt_wap").toString
    var audited = 0L
    val q = Streams.streamIngestWAP(eventsStream(), table, ckpt,
      audit = batch => {
        val n = batch.count()
        assert(n > 0, "audit saw an empty batch")
        audited += n
      })
    assert(q.awaitTermination(120000), "WAP ingest did not finish in time")

    val expected = Tables.events(spark, sfDir).count()
    assert(table.read().count() === expected)
    assert(audited === expected) // the audit saw exactly what published
    // main's history holds ONLY publish commits — no append ever
    // touched it, so no reader could have seen unaudited rows
    assert(table.versions.map(v => table.snapshot(v).operation).toSet === Set("publish"))
    assert(table.branches.isEmpty) // throwaway branches cleaned up
    // restart from the same checkpoint: tag dedup → no new commits
    val pre = table.currentVersion
    val q2 = Streams.streamIngestWAP(eventsStream(), table, ckpt, _ => ())
    assert(q2.awaitTermination(120000))
    assert(table.currentVersion === pre)
  }

  test("stream WAP: a vetoed batch publishes NOTHING and fails the query loudly") {
    val table = LogTable(spark, Files.createTempDirectory("wap_veto_").toString)
    val q = Streams.streamIngestWAP(eventsStream(), table,
      Files.createTempDirectory("ckpt_wapv").toString,
      audit = _ => throw new RuntimeException("synthetic audit failure"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(e.getMessage.contains("audit vetoed") ||
      Option(e.getCause).exists(_.getMessage.contains("audit vetoed")))
    assert(table.currentVersion === 0L) // main never moved
    assert(table.read().count() === 0L)
    assert(table.branches.isEmpty) // the vetoed branch was dropped
  }

  test("stream heavy hitters under capacity pressure: keys >> capacity still pin the planted talker") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[Long](spark, 4)
    val hh = Streams.streamHeavyHitters(in.toDS().toDF("user_id"), k = 10, capacity = 16)
    val q = hh.writeStream.format("memory").queryName("shhp")
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_shhp").toString)
      .start()
    try {
      // two micro-batches, 150 distinct background keys each + a
      // planted key appearing 200× per batch — 301 keys through a
      // 16-counter sketch, so batch 2 merges into already-evicting state
      in.addData((1000L until 1150L) ++ Seq.fill(200)(7L))
      q.processAllAvailable()
      in.addData((2000L until 2150L) ++ Seq.fill(200)(7L))
      q.processAllAvailable()
    } finally q.stop()
    val est = spark.table("shhp")
      .groupBy(col("user_id")).agg(max(col("est_count")).as("est"))
      .filter(col("user_id") === "7")
      .as[(String, Long)].collect()
    // n = 700, capacity 16 → undercount bound n/(c+1) = 41: the planted
    // talker survives eviction with est in [true - bound, true]
    assert(est.nonEmpty, "planted heavy hitter evicted from the sketch")
    assert(est.head._2 <= 400L && est.head._2 >= 400L - 41L,
      s"estimate ${est.head._2} outside the Misra-Gries bound [359, 400]")
  }

  test("stream_sessions: stateful sessionization equals batch lag-window sessions") {
    import Streams.{SessionEvent, SessionSummary}
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us")).as[SessionEvent]
    // run the SAME stateful logic through a memory-sink streaming query
    val streamIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent](
      spark, 1)
    streamIn.addData(evs.collect().toSeq)
    val q = Streams.sessionize(streamIn.toDS()).toDF()
      .writeStream.format("memory").queryName("ss").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_ss").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "query did not finish in time")

    val streamed = spark.table("ss")
      .orderBy(col("user_id")).collect().toSeq
    val batch = graft.operators.LogAnalytics.logSessions(spark, sfDir)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("streaming ingest with a continuously-current Iceberg mirror: every batch refreshes a foreign-readable view") {
    import graft.sources.{IcebergExport, IcebergRead}
    // three flush files → three micro-batches (maxFilesPerTrigger=1)
    val src = Files.createTempDirectory("mirror_src_")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
      .limit(3000).cache()
    (0 until 3).foreach { i =>
      val stage = Files.createTempDirectory(s"mirror_stage_$i")
      ev.filter(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.walk(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(s"flush-$i.parquet"))
      ()
    }
    val table = LogTable(spark,
      Files.createTempDirectory("mirror_tbl_").toString)
    val mirror = Files.createTempDirectory("mirror_ice_").toString
    val schema = spark.read.parquet(src.resolve("flush-0.parquet").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = Streams.streamIngestWithIcebergMirror(stream, table,
      Files.createTempDirectory("mirror_ckpt_").toString, mirror.toString)
    assert(q.awaitTermination(120000), "mirror ingest did not finish")

    // three batches → three commits → three mirror refreshes, each a
    // NEW metadata version with a bumped hint (HadoopTables shape)
    assert(table.currentVersion === 3L)
    val metaDir = java.nio.file.Paths.get(mirror).resolve("metadata")
    assert(new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim === "3")
    (1 to 3).foreach(v => assert(
      Files.exists(metaDir.resolve(s"v$v.metadata.json")), s"v$v missing"))
    // the mirror's CURRENT view equals the table
    val back = IcebergRead.read(spark, mirror)
    assert(back.count() === table.read().count())
    assert(back.agg(sum(col("event_id"))).head().getLong(0) ===
      table.read().agg(sum(col("event_id"))).head().getLong(0))
    ev.unpersist()
    ()
  }

  test("stream_dedup_near: micro-batch state evolution is byte-identical to the batch loop") {
    // the stream replays the same three arrival batches (one
    // micro-batch per source commit via maxVersionsPerTrigger=1), so
    // every doc's fate must match the batch loop's exactly
    val batch = graft.operators.Pipeline.ingestDedupNear(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val stream = Streams.streamDedupNearQ(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(stream === batch)
    assert(stream.nonEmpty)
    assert(stream.exists(_._3 == "near_dup"),
      "the planted mutants must be quarantined on the stream path too")
  }
}
