package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** E17 batch-equivalence: the same EventStreams transforms, replayed
  * through MemoryStream micro-batches, must reproduce the batch plans
  * the DuckDB oracle checks (SURVEY.md §5: streaming anchors on batch
  * equivalence — there are no reference streaming semantics to copy).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val allEvents: Seq[Event] =
    Tables.load(spark, sf0001, "events").as[Event]
      .collect().sortBy(_.ts.getTime).toSeq

  /** run a streaming transform over the events in `chunks` micro-batches */
  private def replay(
      transform: DataFrame => DataFrame,
      mode: String,
      chunks: Int = 3,
      extra: Seq[Event] = Nil): DataFrame = {
    val ms = MemoryStream[Event]
    val q = transform(ms.toDF())
      .writeStream.format("memory").outputMode(mode)
      .queryName("replay_sink").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val size = math.max(1, allEvents.size / chunks)
      allEvents.grouped(size).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      if (extra.nonEmpty) { ms.addData(extra); q.processAllAvailable() }
      spark.table("replay_sink")
    } finally q.stop()
  }

  private def canon(df: DataFrame, cols: String*): Set[String] =
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map {
        case d: Double => f"$d%.6g"
        case x => String.valueOf(x)
      }.mkString("|")).toSet

  test("tumbling window: streaming complete-mode == batch") {
    val batch = EventStreams.tumblingCounts(
      Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
    val stream = replay(EventStreams.tumblingCounts(_), "complete")
    assert(canon(stream, "w_start", "event_type", "n", "sum_value")
      == canon(batch, "w_start", "event_type", "n", "sum_value"))
  }

  test("sliding window: streaming complete-mode == batch") {
    val batch = EventStreams.slidingCounts(
      Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
    val stream = replay(EventStreams.slidingCounts(_), "complete")
    assert(canon(stream, "w_start", "n", "avg_value")
      == canon(batch, "w_start", "n", "avg_value"))
  }

  test("OHLC bars: streaming complete-mode == batch (q123 twin)") {
    val batch = EventStreams.ohlcBars(
      Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
    val stream = replay(EventStreams.ohlcBars(_), "complete")
    assert(canon(stream, "bar_start", "event_type", "open", "high",
        "low", "close", "n", "volume")
      == canon(batch, "bar_start", "event_type", "open", "high",
        "low", "close", "n", "volume"))
  }

  test("session window: streaming complete-mode == batch gaps-and-islands") {
    val batch = EventStreams.sessionCounts(
      Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
    val stream = replay(EventStreams.sessionCounts(_), "complete")
    assert(canon(stream, "user_id", "s_start", "s_end", "n", "sum_value")
      == canon(batch, "user_id", "s_start", "s_end", "n", "sum_value"))
  }

  test("append mode + watermark: late-closed windows are emitted and exact") {
    val maxTs = allEvents.last.ts.getTime
    val sentinel = Event(999999L,
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), 0L, "sentinel", 0.0, "{}")
    val stream = replay(EventStreams.tumblingCounts(_), "append", extra = Seq(sentinel))
      .filter(col("event_type") =!= "sentinel")
    val batch = EventStreams.tumblingCounts(
      Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
    // sentinel pushed the watermark past every real window → append
    // output must equal the batch result exactly
    assert(canon(stream, "w_start", "event_type", "n", "sum_value")
      == canon(batch, "w_start", "event_type", "n", "sum_value"))
  }

  test("file-source streaming (readStream.parquet) matches batch") {
    // real file source, not MemoryStream: events.parquet replayed via
    // Trigger.AvailableNow against the same tumbling transform
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("part-0.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(dir.toString).schema
    // same ts-generation normalization as the batch reader (the copied
    // file carries whatever physical type this corpus generation uses)
    val stream = Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").outputMode("complete")
      .queryName("file_sink").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val batch = EventStreams.tumblingCounts(
        Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
      assert(canon(spark.table("file_sink"), "w_start", "event_type", "n", "sum_value")
        == canon(batch, "w_start", "event_type", "n", "sum_value"))
    } finally q.stop()
  }

  test("the reference's enrich job runs as a streaming service (E17 × E18)") {
    // readStream of records → the SAME EnrichJob.run transform inside
    // foreachBatch (batch = unit of the good/dead split, so the LLM
    // stage executes once per record) → batchId-keyed parquet. The
    // fake backend is deterministic, so streamed output ≡ the one-shot
    // batch run of the identical job.
    val records = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id").cast("string").as("id"),
        map(lit("content"), col("text")).as("texts"),
        array().cast("array<string>").as("images"))
      .as[(String, Map[String, String], Seq[String])].collect().toSeq
    val cfg = graft.core.JobConfig(
      id = "stream-enrich",
      erbTemplate = "summarize: <%= texts[:content] %>",
      backendEndpoint = "http://fake", model = "fake",
      outputLabel = "summary", systemErbTemplate = None,
      params = Map.empty, useImages = false, responseFormat = None)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-senrich").toString + "/good"

    val ms = MemoryStream[(String, Map[String, String], Seq[String])]
    val q = ms.toDF().toDF("id", "texts", "images").writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.pipeline.EnrichJob
          .run(batch, cfg, new graft.llm.FakeLlmClient(),
            graft.pipeline.EnrichOptions(concurrency = 8))
          .good
          .write.mode("overwrite").parquet(s"$outDir/b$id")
        ()
      }.start()
    try {
      records.grouped(math.max(1, records.size / 3)).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read
      .option("recursiveFileLookup", "true").parquet(outDir)
      .select(col("id"), element_at(col("texts"), "summary").as("s"))
      .as[(String, String)].collect().toSet
    val batch = graft.pipeline.EnrichJob
      .run(records.toDF("id", "texts", "images"), cfg,
        new graft.llm.FakeLlmClient(),
        graft.pipeline.EnrichOptions(concurrency = 8))
      .good
      .select(col("id"), element_at(col("texts"), "summary").as("s"))
      .as[(String, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == records.size)
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    val ms = MemoryStream[Event]
    val dim = Seq((0L, "control"), (1L, "treatment")).toDF("bucket", "cohort")
    val joined = ms.toDF()
      .withColumn("bucket", col("user_id") % 2)
      .join(dim, "bucket") // static side broadcast into every micro-batch
      .groupBy("cohort").agg(count(lit(1)).as("n"))
    val q = joined.writeStream.format("memory").outputMode("complete")
      .queryName("dim_sink").start()
    try {
      allEvents.grouped(400).foreach { c => ms.addData(c); q.processAllAvailable() }
      val got = spark.table("dim_sink").as[(String, Long)].collect().toMap
      val want = Tables.load(spark, sf0001, "events")
        .withColumn("bucket", col("user_id") % 2)
        .join(dim, "bucket").groupBy("cohort").count()
        .as[(String, Long)].collect().toMap
      assert(got == want)
      assert(got.values.sum == allEvents.size)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = EventStreams.clickErrorJoin(clicks.toDF(), errors.toDF())
      .writeStream.format("memory").outputMode("append")
      .queryName("ssj_sink").start()
    try {
      val (cs, es) = (allEvents.filter(_.event_type == "click"),
        allEvents.filter(_.event_type == "error"))
      // feed both sides in interleaved micro-batches — matches must
      // form across batch boundaries from the join's buffered state
      val chunks = 4
      val cg = cs.grouped(math.max(1, cs.size / chunks)).toSeq
      val eg = es.grouped(math.max(1, es.size / chunks)).toSeq
      cg.zipAll(eg, Seq.empty[Event], Seq.empty[Event]).foreach { case (cc, ec) =>
        clicks.addData(cc); errors.addData(ec); q.processAllAvailable()
      }
      val batch = EventStreams.clickErrorJoin(
        Tables.load(spark, sf0001, "events").filter(col("event_type") === "click"),
        Tables.load(spark, sf0001, "events").filter(col("event_type") === "error"))
      val cols = Seq("err_id", "click_id", "user_id", "err_us", "click_us")
      assert(canon(spark.table("ssj_sink"), cols: _*) == canon(batch, cols: _*))
      assert(spark.table("ssj_sink").count() > 0)
    } finally q.stop()
  }

  /** outer stream-stream joins hold null-padded rows until the
    * watermark passes the interval end; a far-future sentinel on BOTH
    * streams pushes the watermark past every real event so the final
    * streaming table can be compared to the batch join exactly.
    */
  private def outerJoinReplay(joinType: String): Unit = {
    val clicks = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val q = EventStreams.clickErrorJoin(clicks.toDF(), errors.toDF(), joinType)
      .writeStream.format("memory").outputMode("append")
      .queryName(s"ssj_${joinType}_sink").start()
    try {
      val (cs, es) = (allEvents.filter(_.event_type == "click"),
        allEvents.filter(_.event_type == "error"))
      val chunks = 4
      val cg = cs.grouped(math.max(1, cs.size / chunks)).toSeq
      val eg = es.grouped(math.max(1, es.size / chunks)).toSeq
      cg.zipAll(eg, Seq.empty[Event], Seq.empty[Event]).foreach { case (cc, ec) =>
        clicks.addData(cc); errors.addData(ec); q.processAllAvailable()
      }
      val far = new java.sql.Timestamp(allEvents.last.ts.getTime + 24L * 3600 * 1000)
      clicks.addData(Event(999998L, far, -1L, "click", 0.0, "{}"))
      errors.addData(Event(999999L, far, -1L, "error", 0.0, "{}"))
      q.processAllAvailable()
      val stream = spark.table(s"ssj_${joinType}_sink")
        .filter(!coalesce(col("err_id"), lit(0L)).isin(999999L) &&
                !coalesce(col("click_id"), lit(0L)).isin(999998L))
      val batch = EventStreams.clickErrorJoin(
        Tables.load(spark, sf0001, "events").filter(col("event_type") === "click"),
        Tables.load(spark, sf0001, "events").filter(col("event_type") === "error"),
        joinType)
      val cols = Seq("err_id", "click_id", "user_id", "err_us", "click_us")
      assert(canon(stream, cols: _*) == canon(batch, cols: _*))
      // the outer side really contributes: null-padded rows exist
      assert(stream.filter(col("click_id").isNull).count() > 0,
        "expected at least one unmatched error emitted with nulls")
      if (joinType == "full_outer")
        assert(stream.filter(col("err_id").isNull).count() > 0,
          "expected at least one unmatched click emitted with nulls")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join matches batch incl. null padding") {
    outerJoinReplay("left_outer")
  }

  test("stream-stream FULL OUTER interval join matches batch incl. null padding") {
    outerJoinReplay("full_outer")
  }

  test("dropDuplicatesWithinWatermark suppresses redelivered event_ids") {
    val ms = MemoryStream[Event]
    val q = EventStreams.dedupedEvents(ms.toDF())
      .writeStream.format("memory").outputMode("append")
      .queryName("dedup_sink").start()
    try {
      val first = allEvents.take(50)
      ms.addData(first); q.processAllAvailable()
      ms.addData(first.take(20)); q.processAllAvailable() // redelivery
      assert(spark.table("dedup_sink").count() == 50)
    } finally q.stop()
  }

  test("composed pipeline: streaming dedup feeds a continuously-updated verdict snapshot") {
    // END-TO-END composition of the two streaming maintenance pieces:
    //   docs stream → IncrementalDedup.streamingDedup → per-batch pair
    //   files → (file-source stream) → SnapshotSink (PARTITIONED) →
    //   doc_id → best-match-jaccard snapshot, continuously upserted.
    // The final snapshot must equal the one-shot q26 derivation: for
    // every duplicate doc (doc2 side of a pair), its max jaccard.
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    import graft.pipeline.{IncrementalDedup, SnapshotSink}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)

    val idx = java.nio.file.Files.createTempDirectory("graft-comp-idx").toString
    val pairsDir = java.nio.file.Files.createTempDirectory("graft-comp-p").toString + "/pairs"
    val snapDir = java.nio.file.Files.createTempDirectory("graft-comp-s").toString + "/snap"
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft-comp-c1").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-comp-c2").toString
    new java.io.File(pairsDir).mkdirs()

    val ms = MemoryStream[(Long, String)]
    val q1 = IncrementalDedup.streamingDedup(
      ms.toDF().toDF("doc_id", "text"), idx, pairsDir, ckpt1).start()
    val pairSchema = new StructType()
      .add("doc1", LongType).add("doc2", LongType).add("jaccard", DoubleType)
    // doc2 is always the newer doc, so each doc's verdict arrives in
    // its own batch; seq = jaccard makes keep-last keep the best match
    // (ties carry identical payloads — deterministic snapshot)
    val verdicts = spark.readStream.schema(pairSchema)
      .parquet(s"$pairsDir/*")
      .select(col("doc2").as("doc_id"), col("jaccard"),
        col("jaccard").as("seq"),
        pmod(col("doc2"), lit(4)).cast("int").as("p"))
    val q2 = SnapshotSink.run(
      verdicts, Seq("doc_id"), "seq", None, snapDir, ckpt2,
      partitionCol = Some("p")).start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        ms.addData(chunk)
        q1.processAllAvailable()
        q2.processAllAvailable()
      }
    } finally { q1.stop(); q2.stop() }

    val snap = spark.read.parquet(snapDir)
      .select("doc_id", "jaccard").as[(Long, Double)].collect().toSet
    val oneShot = graft.queries.Dedup.queries("q26_dedup_ngram_jaccard")
      .fn(spark, sf0001)
      .groupBy(col("doc2").as("doc_id"))
      .agg(max(col("jaccard")).as("jaccard"))
      .as[(Long, Double)].collect().toSet
    assert(snap == oneShot,
      s"missing=${oneShot.diff(snap).take(5)} extra=${snap.diff(oneShot).take(5)}")
    // the snapshot really is partitioned storage (the 100 TB path)
    assert(new java.io.File(snapDir).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("p=")))
  }

  test("foreachBatch idempotent sink: batchId-keyed writes survive replay") {
    // the exactly-once-to-external-systems pattern: foreachBatch gets
    // (df, batchId); writing to a batchId-keyed path makes redelivery
    // of a batch overwrite itself instead of duplicating — the sink
    // contract a real warehouse loader uses
    val ms = MemoryStream[Event]
    val outDir = java.nio.file.Files.createTempDirectory("graft-fbatch").toString
    def writeBatch(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        batchId: Long): Unit =
      df.groupBy("event_type").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    val q = ms.toDF().writeStream
      .foreachBatch(writeBatch _)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      allEvents.grouped(500).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    // simulate a replayed batch: re-running batch 0's writer must not
    // double its rows (overwrite-by-batchId is the idempotency);
    // materialize before rewriting the same path
    val batch0 = spark.read.parquet(s"$outDir/batch=0")
    val rows = batch0.collect().toList
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        batch0.schema)
      .write.mode("overwrite").parquet(s"$outDir/batch=0")
    val total = spark.read.option("basePath", outDir).parquet(s"$outDir/batch=*")
      .agg(sum("n")).head.getLong(0)
    assert(total == allEvents.size,
      s"batchId-keyed sink must stay exactly-once under replay: $total")
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val ms = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("state_sink").start()
    try {
      allEvents.grouped(300).foreach { c => ms.addData(c); q.processAllAvailable() }
      // last emitted update per user == batch aggregate
      val last = spark.table("state_sink")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.total_value"))
      val batch = Tables.load(spark, sf0001, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      assert(canon(last, "user_id", "n_events", "total_value")
        == canon(batch, "user_id", "n_events", "total_value"))
    } finally q.stop()
  }

  test("streaming reservoir: final per-key sample equals batch q164 " +
    "regardless of batch split, and redelivery is a no-op") {
    val ms = MemoryStream[Event]
    val q = EventStreams.reservoirPerUser(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("reservoir_sink").start()
    try {
      // deliberately unordered chunks + a full redelivery of chunk 2:
      // the sample is a pure function of the event SET
      val chunks = allEvents.sortBy(_.event_id).reverse.grouped(300).toSeq
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      ms.addData(chunks(math.min(1, chunks.length - 1)))
      q.processAllAvailable()
      val emitted = spark.table("reservoir_sink")
        .select("user_id", "event_id", "samp_rank", "rn", "ver")
        .as[(Long, Long, Long, Long, Long)].collect()
      val maxVer = emitted.groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(_._5).max
      }
      val got = emitted.filter(r => r._5 == maxVer(r._1))
        .map(r => (r._1, r._2, r._3, r._4)).toSet
      val want = graft.queries.Streaming
        .queries("q164_reservoir_sample").fn(spark, sf0001)
        .select("user_id", "event_id", "samp_rank", "rn")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"missing=${want.diff(got).take(5)} extra=${got.diff(want).take(5)}")
    } finally q.stop()
  }

  test("streaming EWMA replay is bit-identical to the batch q114 series") {
    // sequential keyed state across micro-batch boundaries: a
    // ts-ordered replay must reproduce the batch secondary-sort scan
    // EXACTLY (same literals, same fold order ⇒ same doubles)
    val ms = MemoryStream[Event]
    val q = EventStreams.ewmaPerUser(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("ewma_sink").start()
    try {
      val ordered = allEvents
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      ordered.grouped(300).foreach { c => ms.addData(c); q.processAllAvailable() }
      val got = spark.table("ewma_sink")
        .select("user_id", "rn", "ewma").as[(Long, Long, Double)].collect()
        .map { case (u, rn, s) => (u, rn) -> s }.toMap
      val want = graft.queries.Analytics
        .queries("q114_ewma_smoothing").fn(spark, sf0001)
        .select("user_id", "rn", "ewma").as[(Long, Long, Double)].collect()
        .map { case (u, rn, s) => (u, rn) -> s }.toMap
      assert(got.size == want.size, s"got ${got.size} want ${want.size}")
      for ((k, w) <- want) assert(got(k) == w, s"$k: got ${got.get(k)} want $w")
    } finally q.stop()
  }

  test("state-v2 timers: hand-rolled sessionization equals batch session_window") {
    // gap-closed sessions emit inline; each key's dangling session
    // emits from handleExpiredTimer once the sentinel pushes the
    // event-time watermark past every timer. Must equal q39's batch
    // gaps-and-islands row-for-row.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    val q = EventStreams.sessionsViaTimers(ms.toDS())
      .writeStream.format("memory").outputMode("append")
      .queryName("sess_timer_sink").start()
    try {
      val ordered = allEvents
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      ordered.grouped(300).foreach { c => ms.addData(c); q.processAllAvailable() }
      val sentinel = Event(999999L,
        new java.sql.Timestamp(ordered.last.ts.getTime + 24L * 3600 * 1000),
        999999L, "sentinel", 0.0, "{}")
      ms.addData(Seq(sentinel)); q.processAllAvailable()
      val got = spark.table("sess_timer_sink")
        .filter(col("user_id") =!= 999999L)
      val batch = EventStreams.sessionCounts(
        Tables.load(spark, sf0001, "events"), withWatermarkCol = false)
      assert(canon(got, "user_id", "s_start", "s_end", "n", "sum_value")
        == canon(batch, "user_id", "s_start", "s_end", "n", "sum_value"))
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("state-v2 timers: an event at EXACTLY last + gap merges (inclusive " +
    "touch), one second past splits — matching session_window") {
    // the boundary case the continuous corpus never produces: batch
    // session_window merges a window that exactly touches the open
    // session (proven by q153's boundary spec), so the timer replay
    // must too — the processor's former >=/< convention split here
    def ev(id: Long, sec: Long) = Event(id,
      java.sql.Timestamp.from(
        java.sql.Timestamp.valueOf("2024-03-01 10:00:00").toInstant
          .plusSeconds(sec)),
      7L, "click", 1.0, "{}")
    val fixture = Seq(ev(1, 0), ev(2, 300), ev(3, 601))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    val q = EventStreams.sessionsViaTimers(ms.toDS())
      .writeStream.format("memory").outputMode("append")
      .queryName("sess_edge_sink").start()
    try {
      ms.addData(fixture); q.processAllAvailable()
      ms.addData(Seq(Event(99L,
        java.sql.Timestamp.valueOf("2024-03-02 10:00:00"), 999999L,
        "sentinel", 0.0, "{}")))
      q.processAllAvailable()
      val got = spark.table("sess_edge_sink")
        .filter(col("user_id") =!= 999999L)
      val batch = EventStreams.sessionCounts(
        fixture.toDS().toDF(), withWatermarkCol = false)
      assert(canon(got, "user_id", "s_start", "s_end", "n", "sum_value")
        == canon(batch, "user_id", "s_start", "s_end", "n", "sum_value"))
      // and the shape itself: exactly two sessions, sized 2 + 1
      val ns = got.select("n").as[Long].collect().sorted.toSeq
      assert(ns == Seq(1L, 2L),
        s"exact-touch must merge, past-gap must split: $ns")
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("state-v2 timers: watermark-admitted late events merge or split like batch") {
    // the two late-arrival branches an in-order replay never reaches:
    // an event one gap BEFORE the open session's start is its own
    // completed session (batch session_window would also split), and
    // an event just before the start chains in (batch would merge)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ev(id: Long, sec: Long): Event =
      Event(id, new java.sql.Timestamp(sec * 1000), 1L, "t", 1.0, "{}")
    val ms = MemoryStream[Event]
    val q = EventStreams.sessionsViaTimers(ms.toDS())
      .writeStream.format("memory").outputMode("append")
      .queryName("sess_late_sink").start()
    try {
      ms.addData(Seq(ev(1, 1000))); q.processAllAvailable() // watermark 400s
      // far-late (500s): a whole gap before [1000,1000] -> own session
      // near-late (997s): inside one gap before start -> merges
      ms.addData(Seq(ev(2, 500), ev(3, 997))); q.processAllAvailable()
      val sentinel = Event(99, new java.sql.Timestamp(100000L * 1000), 9L, "s", 0.0, "{}")
      ms.addData(Seq(sentinel)); q.processAllAvailable()
      val got = spark.table("sess_late_sink").filter(col("user_id") === 1L)
        .select("s_start", "s_end", "n").as[(Long, Long, Long)]
        .collect().toSet
      assert(got == Set(
        (500000000L, 800000000L, 1L),     // far-late singleton [500, 500+300)
        (997000000L, 1300000000L, 2L)),   // merged [997 .. 1000+300)
        s"got $got")
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("transformWithState (state v2) EWMA equals the GroupState version and batch q114") {
    // the Spark 4 arbitrary-state API: typed ValueState handles in the
    // RocksDB store (which state v2 requires — set for this query,
    // restored after). Same recurrence, same fold order ⇒ the three
    // implementations must agree double-for-double.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Event]
    val q = EventStreams.ewmaPerUserV2(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("ewma_v2_sink").start()
    try {
      val ordered = allEvents
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      ordered.grouped(300).foreach { c => ms.addData(c); q.processAllAvailable() }
      val got = spark.table("ewma_v2_sink")
        .select("user_id", "rn", "ewma").as[(Long, Long, Double)].collect()
        .map { case (u, rn, s) => (u, rn) -> s }.toMap
      val want = graft.queries.Analytics
        .queries("q114_ewma_smoothing").fn(spark, sf0001)
        .select("user_id", "rn", "ewma").as[(Long, Long, Double)].collect()
        .map { case (u, rn, s) => (u, rn) -> s }.toMap
      assert(got.size == want.size, s"got ${got.size} want ${want.size}")
      for ((k, w) <- want) assert(got(k) == w, s"$k: got ${got.get(k)} want $w")
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("streaming CUSUM equals the batch q194 detector row for row") {
    // the batch query derives k = mu + mu/20 and h = 2*mu from the
    // pre-cut window; rebuild the same reference from its own output
    // (x is emitted per row) and feed the daily series as CusumRows in
    // day-ordered chunks — the keyed two-long state must reproduce the
    // closed-form s and alarm on every (type, day)
    val batch = graft.queries.Analytics
      .queries("q194_cusum_drift").fn(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(batch.nonEmpty)
    val allD = batch.map(_._2)
    val cut = (allD.min + allD.max) / 2
    val ref = batch.groupBy(_._1).map { case (et, rs) =>
      val pre = rs.filter(_._2 < cut)
      val mu = pre.map(_._3).sum / pre.length
      et -> (mu + mu / 20, 2 * mu)
    }
    val rows = batch.sortBy(r => (r._2, r._1)).map { case (et, d, x, _, _) =>
      EventStreams.CusumRow(et, d, x, ref(et)._1, ref(et)._2)
    }
    val ms = MemoryStream[EventStreams.CusumRow]
    val q = EventStreams.cusumPerKey(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("cusum_sink").start()
    try {
      rows.grouped(50).foreach { c => ms.addData(c); q.processAllAvailable() }
      val got = spark.table("cusum_sink")
        .as[EventStreams.CusumPoint].collect()
        .map(pt => (pt.key, pt.d) -> (pt.s, pt.alarm)).toMap
      assert(got.size == batch.length)
      batch.foreach { case (et, d, _, s, alarm) =>
        assert(got((et, d)) == ((s, alarm)),
          s"($et,$d): streamed ${got((et, d))} vs batch ($s,$alarm)")
      }
    } finally q.stop()
  }

  test("q199: the registered streaming-CUSUM replay equals batch q194 " +
    "row for row (the service form carries the batch detector's gate)") {
    val got = graft.queries.Streaming.queries("q199_streaming_cusum")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    val want = graft.queries.Analytics.queries("q194_cusum_drift")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq,
      s"streaming replay diverged: ${got.length} vs ${want.length} rows")
  }

  test("q212: the registered streaming EWMA chart equals batch q207 " +
    "double-for-double, with state carried across chunk boundaries") {
    val got = graft.queries.Streaming.queries("q212_streaming_ewma_chart")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._2))
    val want = graft.queries.Analytics.queries("q207_ewma_control_chart")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.length == want.length,
      s"row counts: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      // z must be BIT-identical (same recurrence, same fold order) —
      // any drift means the chunked state carry broke the seeding or
      // the limit-factor recurrence
      assert(g == w, s"streamed $g vs batch $w")
    }
    // non-vacuity: the replay genuinely crosses chunk boundaries (the
    // 50-row chunks split every key's series across micro-batches)
    assert(want.length > 50,
      s"fixture too small to exercise a chunk boundary: ${want.length}")
    // and the chart state is genuinely sequential: some alarm fires
    // only after the planted cut (inherited q207 fixture contract)
    assert(got.exists(_._5 == 1L), "no alarm in the replay")
  }

  test("q217: the registered streaming Holt-Winters equals batch q213 " +
    "double-for-double, with the seed week split across micro-batches") {
    val got = graft.queries.Streaming.queries("q217_streaming_holt_winters")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    val want = graft.queries.Analytics.queries("q213_holt_winters_backtest")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.length == want.length,
      s"row counts: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"streamed $g vs batch $w")
    }
    // non-vacuity: the 20-row chunks (4 days × 5 types) guarantee
    // every key's 7-row seed week spans at least two micro-batches —
    // the partial-seed state carry is genuinely exercised
    assert(want.map(_._1).distinct.length > 2,
      "too few keys to split seed weeks across chunks")
  }

  test("q223: the registered streaming rolling z-score equals batch q149 " +
    "row for row, with the ring carried across chunk boundaries") {
    val got = graft.queries.Streaming.queries("q223_streaming_rolling_zscore")
      .fn(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    val want = graft.queries.Analytics.queries("q149_rolling_zscore")
      .fn(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty && got.length == want.length,
      s"row counts: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"streamed $g vs batch $w")
    }
    // non-vacuity: the 8-chunk replay cuts every user's interleaved
    // event history across micro-batches (users arrive time-ordered,
    // so no user's series fits one chunk), and enough rows exist past
    // the 10-row warmup for the ring to be exercised cross-chunk
    assert(want.length > 50, s"fixture too small: ${want.length}")
  }

  test("q229: the registered streaming next-event builder equals batch " +
    "q176 row for row, with sessions split across micro-batches") {
    val got = graft.queries.Streaming.queries("q229_streaming_next_event")
      .fn(spark, sf0001)
      .as[(Long, Long, Long, String, String, String)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    val want = graft.queries.Streaming.queries("q176_next_event_examples")
      .fn(spark, sf0001)
      .as[(Long, Long, Long, String, String, String)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(got.nonEmpty && got.length == want.length,
      s"row counts: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    // non-vacuity: users carry MANY sessions (sid far past 1) and
    // multi-event sessions exist, so the time-interleaved 8-chunk
    // replay necessarily spans users' session state across
    // micro-batch boundaries
    assert(want.exists(_._3 >= 3) && want.exists(_._2 >= 10),
      "fixture too shallow to exercise cross-chunk session carry")
  }

  test("rolling z-score ring drops redelivered events instead of " +
    "double-folding — a replayed chunk is a no-op (self-enforcing order)") {
    val feed = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3))
      .map { case (uid, us, eid, c) => EventStreams.ZRow(uid, us, eid, c) }
      .toSeq
    // state v2 requires the RocksDB provider — set for this query,
    // restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[EventStreams.ZRow]
    val q = EventStreams.rollingZscorePerUser(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("zring_redeliver_sink").start()
    try {
      val chunks = feed.grouped(math.max(1, (feed.size + 3) / 4)).toList
      ms.addData(chunks.head); q.processAllAvailable()
      // at-least-once delivery: the whole first chunk arrives AGAIN —
      // every row is at or before the last folded (us, id), so the
      // ring must not move and nothing may be emitted
      ms.addData(chunks.head); q.processAllAvailable()
      chunks.tail.foreach { c => ms.addData(c); q.processAllAvailable() }
      // and a single far-late straggler after everything
      ms.addData(Seq(feed.head)); q.processAllAvailable()
      val got = spark.table("zring_redeliver_sink")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val want = graft.queries.Analytics.queries("q149_rolling_zscore")
        .fn(spark, sf0001)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == want.length,
        s"redelivery leaked emissions: ${got.length} vs ${want.length}")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("EWMA chart and Holt-Winters drop redelivered/late rows instead " +
    "of folding them as newest (ADVICE r13: last-day guard in state)") {
    // state v2 requires the RocksDB provider — set for this test,
    // restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    // --- chart: rebuild q207's feed (reference from the pre-cut window)
    val batch = graft.queries.Analytics.queries("q207_ewma_control_chart")
      .fn(spark, sf0001)
      .as[(String, Long, Long, Double, Long)].collect()
    val allD = batch.map(_._2)
    val cut = (allD.min + allD.max) / 2
    val ref = batch.groupBy(_._1).map { case (et, rs) =>
      val pre = rs.filter(_._2 < cut).map(_._3)
      val n0 = pre.length.toLong
      et -> (pre.sum / n0,
        n0 * pre.map(x => x * x).sum - pre.sum * pre.sum, n0)
    }
    val chartRows = batch.sortBy(r => (r._2, r._1)).map { case (et, d, x, _, _) =>
      val (mu, varnum, n0) = ref(et)
      EventStreams.ChartRow(et, d, x, mu, varnum, n0)
    }.toSeq
    val ms = MemoryStream[EventStreams.ChartRow]
    val q = EventStreams.ewmaChartPerKey(ms.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("chart_redeliver_sink").start()
    try {
      val chunks = chartRows.grouped(50).toList
      ms.addData(chunks.head); q.processAllAvailable()
      ms.addData(chunks.head); q.processAllAvailable() // redelivered batch
      chunks.tail.foreach { c => ms.addData(c); q.processAllAvailable() }
      ms.addData(Seq(chartRows.head)); q.processAllAvailable() // late row
      val got = spark.table("chart_redeliver_sink")
        .as[(String, Long, Long, Double, Long)].collect()
        .sortBy(r => (r._1, r._2))
      val want = batch.sortBy(r => (r._1, r._2))
      assert(got.length == want.length,
        s"redelivery corrupted the chart: ${got.length} vs ${want.length}")
      got.zip(want.toSeq).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    } finally q.stop()

    // --- Holt-Winters: rebuild q217's planted feed; redeliver the
    // chunk that SPLITS the seed week (the n-counter is the fragile
    // state a double-fold would corrupt)
    val daily0 = Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        expr("unix_micros(date_trunc('day', ts))").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("x0"))
    val refHw = daily0.groupBy(col("event_type"))
      .agg(expr("sum(x0) DIV count(1)").as("mu"))
    val hwRows = daily0.join(broadcast(refHw), "event_type")
      .select(col("event_type"), col("d"),
        (col("x0") + when(
          (col("d") / lit(86400000000L) + 4) % 7 === 6, col("mu") * 2)
          .otherwise(0L)).as("x"))
      .as[(String, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
      .map { case (et, day, x) => EventStreams.HwRow(et, day, x) }
      .toSeq
    val msHw = MemoryStream[EventStreams.HwRow]
    val qHw = EventStreams.holtWintersPerKey(msHw.toDS())
      .writeStream.format("memory").outputMode("update")
      .queryName("hw_redeliver_sink").start()
    try {
      val chunks = hwRows.grouped(20).toList // seed weeks span chunks
      msHw.addData(chunks.head); qHw.processAllAvailable()
      msHw.addData(chunks.head); qHw.processAllAvailable() // mid-seed redelivery
      chunks.tail.foreach { c => msHw.addData(c); qHw.processAllAvailable() }
      val got = spark.table("hw_redeliver_sink")
        .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val want = graft.queries.Analytics.queries("q213_holt_winters_backtest")
        .fn(spark, sf0001)
        .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.length == want.length,
        s"mid-seed redelivery corrupted the smoother: " +
          s"${got.length} vs ${want.length}")
      got.zip(want.toSeq).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    } finally qHw.stop()
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("q242: the registered streaming attribution equals batch q153 " +
    "row for row, with sessions split across micro-batches (r15)") {
    val cols = Seq("user_id", "s_start", "first_click_id",
      "n_purchases", "attributed_value")
    val got = canon(graft.queries.Streaming
      .queries("q242_streaming_session_attribution").fn(spark, sf0001),
      cols: _*)
    val want = canon(graft.queries.Streaming
      .queries("q153_session_attribution").fn(spark, sf0001), cols: _*)
    assert(want.nonEmpty, "empty attribution report — fixture broken")
    assert(got == want,
      s"service diverged from batch: only-in-q242 ${(got -- want).take(3)}, " +
        s"only-in-q153 ${(want -- got).take(3)}")
    // non-vacuity: qualifying (click+purchase) sessions are rare by
    // construction, but the carry is exercised by ALL sessions — the
    // session-seam chunk schedule cuts mid-session by construction
    // (r16), so assert the underlying session count dwarfs the cuts
    assert(want.size >= 2, s"fixture too shallow: ${want.size} sessions")
    val allSessions = graft.queries.Streaming
      .queries("q39_session_window").fn(spark, sf0001).count()
    assert(allSessions > 50,
      s"session fixture too shallow for cross-chunk carry: $allSessions")
  }

  test("q242 attribution drops redelivered events instead of double-" +
    "counting a purchase (self-enforcing order)") {
    def at(sec: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime + sec * 1000)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[EventStreams.AtRow]
    val q = EventStreams.sessionAttributionPerUser(ms.toDS())
      .writeStream.format("memory").outputMode("append")
      .queryName("attr_redeliver_sink").start()
    try {
      val b1 = Seq(
        EventStreams.AtRow(7L, at(0), 1L, "click", 0.0),
        EventStreams.AtRow(7L, at(60), 2L, "purchase", 10.0))
      ms.addData(b1); q.processAllAvailable()
      // at-least-once: the whole first batch arrives AGAIN — every row
      // is at or before the last folded (us, id), so the state must
      // treat it as a no-op (no extra purchase, no re-attribution)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(Seq(
        EventStreams.AtRow(7L, at(120), 3L, "purchase", 5.0)))
      q.processAllAvailable()
      // watermark-advancing sentinel flushes the dangling session
      ms.addData(Seq(
        EventStreams.AtRow(999L, at(24 * 3600), 99L, "sentinel", 0.0)))
      q.processAllAvailable()
      val got = spark.table("attr_redeliver_sink")
        .filter(col("user_id") === 7L)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(got == Seq((7L,
        at(0).getTime * 1000L, 1L, 2L, 15.0)),
        s"redelivery must be a no-op: $got")
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("q256: the buffered attribution equals batch q153 on the " +
    "session-swapped feed, and the disorder is real — per-key " +
    "arrival inversions the in-order guard would drop (r16)") {
    val cols = Seq("user_id", "s_start", "first_click_id",
      "n_purchases", "attributed_value")
    val want = canon(graft.queries.Streaming
      .queries("q153_session_attribution").fn(spark, sf0001), cols: _*)
    val got = canon(graft.queries.Streaming
      .queries("q256_streaming_attribution_unordered").fn(spark, sf0001),
      cols: _*)
    assert(want.nonEmpty, "empty attribution report — fixture broken")
    assert(got == want,
      s"buffered service diverged from batch: only-in-q256 " +
        s"${(got -- want).take(3)}, only-in-batch ${(want -- got).take(3)}")
    // non-vacuity: the shuffled feed must contain REAL per-key
    // disorder — arrival-order inversions the in-order guard would
    // drop and the buffer must reorder. (The output-level divergence
    // of the two processors is proven on the deterministic unit
    // fixture below; it is NOT asserted corpus-wide because the
    // emitted report filters to click-led purchase sessions — rare at
    // sf0.001 — so drops on non-qualifying sessions are invisible in
    // the output even though the carry they exercise is real.)
    val feed = graft.queries.Streaming
      .attributionShuffledFeed(spark, sf0001, 999999999L)
    def usOf(r: EventStreams.AtRow): Long = EventStreams.usOf(r.ts)
    val lastSeen = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    var inversions = 0
    feed.foreach { r =>
      lastSeen.get(r.user_id).foreach { case (us, id) =>
        if (usOf(r) < us || (usOf(r) == us && r.event_id < id))
          inversions += 1
      }
      lastSeen(r.user_id) = (usOf(r), r.event_id)
    }
    // 18 swappable session-internal pairs exist at sf0.001 (measured);
    // greedy disjoint pairing lands 10+ swaps = 10+ inversions
    assert(inversions > 8,
      s"swapped feed must carry real per-key disorder for the buffer " +
        s"to reorder: only $inversions arrival inversions")
  }

  test("q256 buffering folds an intra-watermark out-of-order event at " +
    "its TIMESTAMP position — where the in-order guard drops it") {
    def at(sec: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime + sec * 1000)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def run(pipe: org.apache.spark.sql.Dataset[EventStreams.AtRow] =>
        org.apache.spark.sql.Dataset[EventStreams.AttrOut],
        sink: String): Seq[(Long, Long, Long, Long, Double)] = {
      val ms = MemoryStream[EventStreams.AtRow]
      val q = pipe(ms.toDS())
        .writeStream.format("memory").outputMode("append")
        .queryName(sink).start()
      try {
        // the purchase ARRIVES first; the click is 2 min out of order
        // — well inside the 10-min watermark, 1 session by the 5-min
        // gap (120 s between them)
        ms.addData(Seq(EventStreams.AtRow(5L, at(120), 11L, "purchase", 7.5)))
        q.processAllAvailable()
        ms.addData(Seq(EventStreams.AtRow(5L, at(0), 10L, "click", 0.0)))
        q.processAllAvailable()
        ms.addData(Seq(
          EventStreams.AtRow(999L, at(24 * 3600), 99L, "sentinel", 0.0)))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(sink).filter(col("user_id") === 5L)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
    }
    try {
      val buffered = run(EventStreams.sessionAttributionUnordered(_),
        "q256_ooo_buf_sink")
      assert(buffered == Seq((5L, at(0).getTime * 1000L, 10L, 1L, 7.5)),
        s"buffered must fold the click at its timestamp: $buffered")
      val inOrder = run(EventStreams.sessionAttributionPerUser(_),
        "q256_ooo_inorder_sink")
      assert(inOrder.isEmpty,
        s"in-order guard should drop the out-of-order click (clickless " +
          s"session never emits): $inOrder")
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("q256 buffering dedupes redelivery on exact (us, id) identity — " +
    "a purchase never double-credits") {
    def at(sec: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime + sec * 1000)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[EventStreams.AtRow]
    val q = EventStreams.sessionAttributionUnordered(ms.toDS())
      .writeStream.format("memory").outputMode("append")
      .queryName("q256_redeliver_sink").start()
    try {
      val b1 = Seq(
        EventStreams.AtRow(7L, at(0), 1L, "click", 0.0),
        EventStreams.AtRow(7L, at(60), 2L, "purchase", 10.0))
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b1); q.processAllAvailable() // whole-batch redelivery
      ms.addData(Seq(
        EventStreams.AtRow(7L, at(120), 3L, "purchase", 5.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        EventStreams.AtRow(999L, at(24 * 3600), 99L, "sentinel", 0.0)))
      q.processAllAvailable()
      val got = spark.table("q256_redeliver_sink")
        .filter(col("user_id") === 7L)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(got == Seq((7L, at(0).getTime * 1000L, 1L, 2L, 15.0)),
        s"redelivery must be a no-op under the buffer too: $got")
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("q241: a redelivered micro-batch never re-asks the backend — " +
    "the idempotency cache absorbs at-least-once delivery (r15)") {
    val docs = (0L until 30L).map(i => (i, s"text body number $i"))
    val runDir = java.nio.file.Files
      .createTempDirectory("graft_q241spec_").toFile
    val cacheDir = new java.io.File(runDir, "cache").getAbsolutePath
    val outDir = new java.io.File(runDir, "out").getAbsolutePath
    val cfg = graft.core.JobConfig(
      id = "stream-enrich-spec",
      erbTemplate = "<%= id %>|<%= texts[:content] %>",
      backendEndpoint = "http://fake", model = "fake",
      outputLabel = "summary", systemErbTemplate = None,
      params = Map.empty, useImages = false, responseFormat = None)
    StreamingSpec.calls.set(0L)
    val counting = new graft.llm.LlmClient {
      override def chat(ms: Seq[graft.llm.Msg],
          c: graft.core.JobConfig): String = {
        StreamingSpec.calls.incrementAndGet()
        s"R:${ms.last.text.length}"
      }
    }
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val records = batch.select(
          col("doc_id").cast("string").as("id"),
          map(lit("content"), col("text")).as("texts"),
          array().cast("array<string>").as("images"))
        graft.pipeline.EnrichJob
          .runCached(records, cfg, counting, cacheDir)
          .good
          .select(col("id").cast("long").as("doc_id"),
            element_at(col("texts"), "summary").as("summary"))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      val chunks = docs.grouped(10).toSeq
      chunks.zipWithIndex.foreach { case (c, i) =>
        ms.addData(c); q.processAllAvailable()
        if (i == 1) { ms.addData(c); q.processAllAvailable() }
      }
    } finally q.stop()
    // exactly one backend ask per distinct prompt despite the
    // redelivered micro-batch — the service's frugality contract
    assert(StreamingSpec.calls.get() == docs.size,
      s"expected ${docs.size} calls, got ${StreamingSpec.calls.get()}")
    // and the sink's merge-on-read fold is exactly-once per doc
    val folded = spark.read.parquet(outDir)
      .groupBy(col("doc_id")).agg(min(col("summary")).as("summary"))
    assert(folded.count() == docs.size)
    val raw = spark.read.parquet(outDir).count()
    assert(raw == docs.size + 10,
      s"the redelivered batch must appear in the raw sink (got $raw rows)" +
        " — otherwise the fold gate is vacuous")
    // reclaim the fixture dirs — repeated test runs must not grow /tmp
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(runDir)
  }
}

object StreamingSpec {
  /** shared JVM-wide so executor tasks and the spec see one counter
    * (local[*] — the EnrichJobSpec.calls idiom)
    */
  val calls = new java.util.concurrent.atomic.AtomicLong(0L)
}
