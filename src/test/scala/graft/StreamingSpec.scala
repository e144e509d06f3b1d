package graft

import graft.sources.DocsisFixtures
import graft.streaming.{DocsisStream, EventsStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  /** Fixture scrapes as a MemoryStream-backed raw frame (the socket-less
    * stand-in for the HNAP poller source, SURVEY.md §7 step 5).
    */
  private def scrapeStream() = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double, String)]
    val raw = mem.toDF()
      .toDF("payload", "modem_name", "scrape_latency", "ts")
      .withColumn("timestamp", to_timestamp($"ts")).drop("ts")
    (mem, raw)
  }

  test("docsis scrape stream: parse + checkpointed micro-batch sink") {
    val (mem, raw) = scrapeStream()
    val parsed = DocsisStream.parseStream(raw)
    val q = parsed.writeStream.format("memory").queryName("docsis_mem")
      .outputMode("append").start()
    try {
      mem.addData(DocsisFixtures.scrapes)
      q.processAllAvailable()
      val out = spark.table("docsis_mem")
      assert(out.count() == 4) // non-OK dropped inside the stream
      val r = out.filter($"modem_name" === "attic").select($"modem_uptime")
        .as[Long].head()
      assert(r == 45L)
    } finally q.stop()
  }

  test("fact-table stream writer: day-partitioned parquet + checkpoint") {
    val (mem, raw) = scrapeStream()
    val base = java.nio.file.Files.createTempDirectory("fact_stream").toString
    val q = DocsisStream
      .factTableWriter(DocsisStream.parseStream(raw), s"$base/data", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()) // test override of the 10s trigger
      .start()
    try {
      mem.addData(DocsisFixtures.scrapes)
      q.awaitTermination(60000)
      val back = spark.read.parquet(s"$base/data")
      assert(back.count() == 4)
      // physical layout: one directory per day (tables.sql:30 parity)
      val days = new java.io.File(s"$base/data").listFiles()
        .filter(_.getName.startsWith("date=")).map(_.getName).sorted
      assert(days.toSeq == Seq("date=2024-03-01", "date=2024-03-02"))
    } finally q.stop()
  }

  test("docsis windowed SNR agg emits after watermark passes") {
    val (mem, raw) = scrapeStream()
    val agg = DocsisStream.snrWindowed(DocsisStream.parseStream(raw))
    val q = agg.writeStream.format("memory").queryName("snr_mem")
      .outputMode("append").start()
    try {
      mem.addData(DocsisFixtures.scrapes)
      q.processAllAvailable()
      // advance event time far enough to close the 00:00 window
      mem.addData(Seq((DocsisFixtures.scrapes.head._1, "MB8600", 0.1,
        "2024-03-02 01:00:00")))
      q.processAllAvailable()
      val out = spark.table("snr_mem")
      assert(out.count() >= 3) // 3 channels × closed windows for 03-01
      val ofdm = out.filter($"channel_id" === 33 && $"modem_name" === "MB8600")
        .select($"avg_snr").as[Double].head()
      assert(math.abs(ofdm - 40.0) < 1e-6) // corrected OFDM PLC snr
    } finally q.stop()
  }

  test("scrape replay dedup within watermark") {
    val (mem, raw) = scrapeStream()
    val dedup = DocsisStream.dedupScrapes(DocsisStream.parseStream(raw))
    val q = dedup.writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    try {
      mem.addData(DocsisFixtures.scrapes) // contains 4 OK scrapes
      mem.addData(DocsisFixtures.scrapes) // full replay (source retry)
      q.processAllAvailable()
      assert(spark.table("dedup_mem").count() == 4)
    } finally q.stop()
  }

  test("watermark late-drop: a real stream drops exactly the q90-model rows") {
    // q90's model: watermark during trigger t = max event time over
    // triggers < t minus the delay; a row is dropped iff ts <= watermark
    // (the boundary row AT the watermark drops — WatermarkSupport's <=
    // eviction predicate, which row 9 below exists to pin).
    // Replay the same trigger schedule through a REAL watermarked
    // operator (dropDuplicates applies the late-row filter on the event
    // time column directly) and assert the survivors are the model's.
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def at(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    // (event_id, minutes): batch 2's 20' is behind wm=30' (max 60' - 30'),
    // 40' and 31' survive; batch 3's 25' and 39' are behind wm=40' and
    // the boundary row AT 40' drops too (<=), 95' survives
    val batches = Seq(
      Seq((1L, 0L), (2L, 10L), (3L, 60L)),
      Seq((4L, 20L), (5L, 40L), (6L, 31L), (7L, 70L)),
      Seq((8L, 25L), (9L, 40L), (10L, 95L), (11L, 39L)))
    val keptModel = {
      var wmMin = Long.MinValue
      var seenMax = Long.MinValue
      batches.flatMap { b =>
        val kept = b.collect { case (id, m) if wmMin == Long.MinValue || m > wmMin => id }
        seenMax = math.max(seenMax, b.map(_._2).max)
        wmMin = seenMax - 30L
        kept
      }.toSet
    }
    assert(keptModel == Set(1L, 2L, 3L, 5L, 6L, 7L, 10L),
      s"fixture self-check: $keptModel")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("wm_drop_mem")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (id, m) => (id, at(m)) })
        q.processAllAvailable()
      }
      val got = spark.table("wm_drop_mem").select($"event_id")
        .as[Long].collect().toSet
      assert(got == keptModel, s"stream kept $got, model kept $keptModel")
    } finally q.stop()
  }

  test("events file stream: windowed counts match the batch equivalent") {
    val stream = EventsStream.windowedCounts(
      EventsStream.readStream(spark, sfDir))
    val q = stream.writeStream.format("memory").queryName("ev_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_mem")
        .select($"window.start".as("ws"), $"event_type", $"n")
      val want = Tables.events(spark, sfDir)
        .groupBy(window($"ts", "15 minutes").getField("start").as("ws"),
          $"event_type")
        .agg(count(lit(1)).as("n"))
      assert(got.count() == want.count())
      assert(got.except(want).isEmpty && want.except(got).isEmpty)
    } finally q.stop()
  }

  test("sliding windows: every event lands in exactly 3 overlapping buckets") {
    val stream = EventsStream.slidingCounts(EventsStream.readStream(spark, sfDir))
    val q = stream.writeStream.format("memory").queryName("slide_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val total = spark.table("slide_mem").agg(sum($"n")).head().getLong(0)
      val nEvents = Tables.events(spark, sfDir).count()
      assert(total == 3 * nEvents)
    } finally q.stop()
  }

  test("stream-static join enriches each event from a broadcast dimension") {
    val dim = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(min($"ts").as("first_seen"))
    val joined = EventsStream.enrichWithStatic(
      EventsStream.readStream(spark, sfDir), dim)
    val q = joined.writeStream.format("memory").queryName("enrich_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("enrich_mem")
      assert(out.count() == Tables.events(spark, sfDir).count())
      assert(out.filter($"first_seen".isNull).count() == 0)
    } finally q.stop()
  }

  test("stream-stream join matches the batch range join") {
    val joined = EventsStream.purchaseSignupJoin(
      EventsStream.readStream(spark, sfDir))
    val q = joined.writeStream.format("memory").queryName("ss_join_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join_mem")
      val ev = Tables.events(spark, sfDir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
      val s = ev.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), $"ts".as("s_ts"))
      val want = p.join(s, $"user_id" === $"s_user" &&
          $"s_ts" <= $"p_ts" && $"s_ts" >= $"p_ts" - expr("INTERVAL '7' DAY"))
        .select($"p_id", $"user_id", $"p_ts", $"s_ts")
      // inner stream-stream join emits matches as they arrive; with all
      // data in one batch the result must equal the batch join
      assert(got.count() == want.count())
      assert(got.except(want).isEmpty && want.except(got).isEmpty)
    } finally q.stop()
  }

  test("stream-stream left outer join evicts unmatched purchases by watermark") {
    val joined = EventsStream.purchaseSignupLeftJoin(
      EventsStream.readStream(spark, sfDir))
    val q = joined.writeStream.format("memory").queryName("ss_loj_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_loj_mem")
      val ev = Tables.events(spark, sfDir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
      val s = ev.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), $"ts".as("s_ts"))
      val cond = $"user_id" === $"s_user" &&
        $"s_ts" <= $"p_ts" && $"s_ts" >= $"p_ts" - expr("INTERVAL '7' DAY")
      val batchLeft = p.join(s, cond, "left_outer")
        .select($"p_id", $"user_id", $"p_ts", $"s_ts")
      // everything emitted must appear in the batch left join
      assert(got.except(batchLeft).isEmpty)
      // matched rows = exactly the batch inner join
      val wantInner = p.join(s, cond).select($"p_id", $"user_id", $"p_ts", $"s_ts")
      val gotMatched = got.filter($"s_ts".isNotNull)
      assert(gotMatched.count() == wantInner.count())
      assert(gotMatched.except(wantInner).isEmpty)
      // eviction really ran: every unmatched purchase whose match window
      // is safely below the final watermark (max ts - 1h delay, 1 min
      // margin) must have been emitted with a null s_ts
      val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
      val horizon = new java.sql.Timestamp(maxTs.getTime - (60 + 1) * 60 * 1000L)
      val evictable = batchLeft.filter($"s_ts".isNull && $"p_ts" < lit(horizon))
      val gotNulls = got.filter($"s_ts".isNull)
      assert(evictable.except(gotNulls).isEmpty)
    } finally q.stop()
  }

  test("events session windows produce per-user sessions") {
    val stream = EventsStream.sessions(EventsStream.readStream(spark, sfDir))
    val q = stream.writeStream.format("memory").queryName("sess_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sess_mem")
      assert(sessions.count() > 0)
      // session windows must not overlap per user
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"session_window.start")
      val overlaps = sessions
        .withColumn("prev_end", lag($"session_window.end", 1).over(w))
        .filter($"prev_end".isNotNull && $"session_window.start" < $"prev_end")
      assert(overlaps.count() == 0)
    } finally q.stop()
  }

  test("JDBC external sink e2e: streamed batches land, retries stay exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val db = java.nio.file.Files.createTempDirectory("jdbc_sink").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val sink = new graft.streaming.JdbcBatchSink(url, "docsis_snap")
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = mem.toDF().toDF("modem_name", "ts", "uptime")
      .writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.addBatch(df, id))
      .start()
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "docsis_snap").load()
    try {
      mem.addData(("m1", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1L),
        ("m2", java.sql.Timestamp.valueOf("2024-03-01 00:00:10"), 2L))
      q.processAllAvailable()
      mem.addData(("m3", java.sql.Timestamp.valueOf("2024-03-01 00:00:20"), 3L))
      q.processAllAvailable()
      assert(readBack().count() == 3)
      // a foreachBatch RETRY of an already-landed batch (checkpoint replay
      // after a crash) must converge, not duplicate: the sink deletes its
      // own _batch_id debris before re-inserting
      val replay = Seq(("m3", java.sql.Timestamp.valueOf("2024-03-01 00:00:20"), 3L))
        .toDF("modem_name", "ts", "uptime")
      sink.addBatch(replay, 1L)
      assert(readBack().count() == 3, "batch replay must not duplicate rows")
      assert(readBack().groupBy($"modem_name").count()
        .filter($"count" > 1).count() == 0)
      // at-least-once mode appends without the delete guard
      val alo = new graft.streaming.JdbcBatchSink(url, "docsis_snap",
        exactlyOnce = false)
      alo.addBatch(replay, 1L)
      assert(readBack().count() == 4)
    } finally q.stop()
  }

  test("streaming ingest dedup equals the d20 batch fold; replay converges") {
    import graft.operators.DedupQueries
    import graft.storage.FactTable
    implicit val sqlCtx = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val docs = DedupQueries.corpus(spark, sfDir)
    val batches = (0 to 2).map(k =>
      docs.filter($"doc_id" % 3 === k).select($"doc_id", $"text")
        .as[(Long, String)].collect().toSeq)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val bandsT = new FactTable(tmp("dd_bands_s"), spark)
    val setsT = new FactTable(tmp("dd_sets_s"), spark)
    val decsT = new FactTable(tmp("dd_decs_s"), spark)
    val live = new graft.streaming.DedupIngest(bandsT, setsT, decsT)
    val q = live.start(stream, tmp("dd_ckpt"))
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = decsT.read()
        .select($"new_id", $"batch", $"dup_of", $"is_dup")
        .as[(Long, Int, Option[Long], Boolean)].collect().sortBy(_._1)
      val folded = DedupQueries.sequentialDedupDecisions(
        (0 to 2).map(k => docs.filter($"doc_id" % 3 === k)))
        .as[(Long, Int, Option[Long], Boolean)].collect().sortBy(_._1)
      assert(streamed.length == folded.length && streamed.sameElements(folded),
        "streaming decisions diverged from the d20 batch fold")
      assert(streamed.count(_._4) > 0, "expected cross-batch dups to be flagged")
      // crash-replay of the LAST batch (checkpoint rollback): decisions
      // must not change even though its survivors are already indexed —
      // the anti-join shield restores the pre-append view, and the
      // txn-idempotent appends are no-ops
      val before = decsT.read().count()
      live.addBatch(batches(2).toDF("doc_id", "text"), 2L)
      assert(decsT.read().count() == before, "replay must not re-append")
      // shield semantics: even re-running batch 2 under a FRESH txn id
      // (so the no-op guard can't hide anything) yields the same
      // decisions, because the anti-join removes the batch's own indexed
      // survivors from the dedup view — without it every survivor would
      // now match itself
      live.addBatch(batches(2).toDF("doc_id", "text"), 99L)
      val shielded = decsT.read().filter($"batch" === 99)
        .select($"new_id", $"dup_of", $"is_dup")
        .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1)
      val batch2 = streamed.filter(_._2 == 2).map(t => (t._1, t._3, t._4))
      assert(shielded.sameElements(batch2),
        "replay under a fresh txn changed decisions — anti-join shield broken")
    } finally q.stop()
  }

  test("streaming ANN ingest builds the s14 index; search matches, replay is a no-op") {
    import graft.storage.FactTable
    implicit val sqlCtx = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val batches = (0 to 3).map(k =>
      emb.filter($"vec_id" % 4 === k)
        .as[(Long, Seq[Float])].collect().toSeq)
    val mem = MemoryStream[(Long, Seq[Float])]
    val idxT = new FactTable(tmp("ann_idx_s"), spark)
    val live = new graft.streaming.AnnIngest(cents, idxT)
    val q = live.start(mem.toDF().toDF("vec_id", "embedding"), tmp("ann_ckpt"))
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      // index CONTENT equality vs the one-shot assignment of the corpus
      val streamedIdx = idxT.read().select($"vec_id", $"cid")
        .as[(Long, Long)].collect().sorted
      val oneShot = graft.operators.SimilarityQueries
        .assignToFrozen(cents, emb).select($"vec_id", $"cid")
        .as[(Long, Long)].collect().sorted
      assert(streamedIdx.sameElements(oneShot),
        "stream-built index content diverged from the one-shot build")
      // searched RESULT equality vs the s21 batch shadow (== s14 build)
      val idx = idxT.read().select($"vec_id", $"cid", $"embedding")
      val probe = idx.filter($"vec_id" === 0)
        .select($"cid".as("qcid"), $"embedding".as("qv"))
      val got = idx.join(broadcast(probe), $"cid" === $"qcid")
        .filter($"vec_id" =!= 0)
        .select($"vec_id",
          round(graft.functions.VectorFunctions
            .cosineExact("embedding", "qv"), 9).as("cosine"))
        .orderBy($"cosine".desc, $"vec_id".asc).limit(5)
        .as[(Long, Double)].collect()
      val want = SparkEntry.queries("s21_streaming_ann_ingest")(spark, sfDir)
        .as[(Long, Double)].collect()
      assert(got.sameElements(want),
        "stream-built search diverged from the s21 batch shadow")
      // checkpoint-replay of a committed batch: txn-idempotent no-op
      val before = idxT.read().count()
      live.addBatch(batches(3).toDF("vec_id", "embedding"), 3L)
      assert(idxT.read().count() == before, "replay must not re-append")
    } finally q.stop()
  }

  test("streaming graph ingest equals the s49 batch fold; committed replay is a no-op") {
    import graft.storage.FactTable
    implicit val sqlCtx = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val chainIds = graft.operators.SimilarityQueries.chainBatches
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // bootstrap (txn -1 = the offline build; micro-batch ids are
    // 0-based, so the bootstrap txn must sit below them): the SAME
    // stored base the fold reads, plus the pre-batch corpus vectors
    val graphT = new FactTable(tmp("graph_ing"), spark)
    val vecsT = new FactTable(tmp("graph_vecs"), spark)
    val dt = to_date(lit("2024-01-01"))
    graphT.append(graft.operators.SimilarityQueries
      .chainBaseEdges(spark, sfDir)
      .withColumn("batch", lit(-1).cast("int")).withColumn("date", dt), -1)
    vecsT.append(emb
      .filter($"vec_id" =!= 0 && !$"vec_id".isin(chainIds.flatten: _*))
      .withColumn("date", dt), -1)
    val entries = Seq(1L, 2L, 3L, 4L)
    val live = new graft.streaming.GraphIngest(graphT, vecsT, entries)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = live.start(mem.toDF().toDF("vec_id", "embedding"),
      tmp("graph_ckpt"))
    try {
      chainIds.foreach { b =>
        mem.addData(emb.filter($"vec_id".isin(b: _*))
          .as[(Long, Seq[Float])].collect().toSeq)
        q.processAllAvailable()
      }
      def edges(df: org.apache.spark.sql.DataFrame) = df
        .select($"src", $"dst", $"gcos").as[(Long, Long, Double)]
        .collect().toSet
      val streamed = edges(live.graphView())
      val fold = edges(graft.operators.SimilarityQueries
        .bulkChainGraph(spark, sfDir))
      assert(streamed == fold,
        s"stream-built graph diverged from the s49 fold:" +
          s"\nonly-stream=${streamed -- fold}\nonly-fold=${fold -- streamed}")
      // committed-batch replay: the recompute may read a LATER graph
      // state, but both appends are txn-rejected — store unchanged
      val before = (graphT.read().count(), vecsT.read().count())
      live.addBatch(emb.filter($"vec_id".isin(chainIds.last: _*))
        .select($"vec_id", $"embedding"), 1L)
      assert((graphT.read().count(), vecsT.read().count()) == before,
        "replay of a committed batch must not re-append")
    } finally q.stop()
  }

  test("streaming sketch-state ingest equals the one-shot view; crash heals; replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("date", to_date($"ts"))
      .select($"date", $"event_type", $"event_id", $"user_id")
    val batches = (0 to 2).map(k =>
      ev.filter($"event_id" % 3 === k)
        .as[(java.sql.Date, String, Long, Long)].collect().toSeq)
    val mv = new graft.storage.SketchView(tmp("skv_b"), tmp("skv_v"),
      spark, keyCols = Seq("event_type"), ndvCol = "user_id")
    val live = new graft.streaming.SketchIngest(mv)
    val mem = MemoryStream[(java.sql.Date, String, Long, Long)]
    val q = live.start(
      mem.toDF().toDF("date", "event_type", "event_id", "user_id"),
      tmp("skv_ckpt"))
    try {
      batches.take(2).foreach { b => mem.addData(b); q.processAllAvailable() }
      // crash between the pair's two commits: base has batch 2, view not
      assert(mv.base.append(batches(2)
        .toDF("date", "event_type", "event_id", "user_id"), 2L))
      // the foreachBatch retry heals exactly the missing side
      mem.addData(batches(2)); q.processAllAvailable()
      // any micro-batching ≡ one-shot: HLL union is register-wise max
      val oneShot = new graft.storage.SketchView(tmp("skv_b1"),
        tmp("skv_v1"), spark, keyCols = Seq("event_type"),
        ndvCol = "user_id")
      oneShot.insert(ev, 0L)
      def serve(v: graft.storage.SketchView) =
        v.readAggregate().as[(java.sql.Date, String, Long, Long)]
          .collect().toSeq.sorted
      assert(serve(mv) == serve(oneShot),
        "stream-built sketch view diverged from the one-shot build")
      // checkpoint-replay of a committed batch: no-op on BOTH tables
      assert(live.addBatch(batches(1)
        .toDF("date", "event_type", "event_id", "user_id"), 1L)
        == ((false, false)), "replay must no-op on both tables")
    } finally q.stop()
  }

  test("transformWithState anomaly detector matches the batch shadow across batches") {
    // transformWithState requires the RocksDB state store — scope the
    // provider override to this query's lifetime
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
      val events = mem.toDF()
        .toDF("user_id", "event_id", "ts", "value")
      val q = graft.streaming.AnomalyDetector.detect(events)
        .writeStream.format("memory").queryName("anomaly_mem")
        .outputMode("append").start()
      try {
        def t(sec: Int) =
          java.sql.Timestamp.valueOf(f"2024-03-01 00:00:${sec}%02d")
        // user 1: 12 calm readings (~10.0 ± .05) split across TWO
        // micro-batches so the exact moments must survive state
        // roundtrips; then one 4σ spike and one calm reading
        val calm = (0 until 12).map(i =>
          (1L, i.toLong, t(i), 10.0 + 0.05 * (i % 2)))
        mem.addData(calm.take(6))
        q.processAllAvailable()
        mem.addData(calm.drop(6))
        q.processAllAvailable()
        mem.addData(Seq((1L, 20L, t(20), 25.0), (1L, 21L, t(21), 10.0)))
        q.processAllAvailable()
        val got = spark.table("anomaly_mem")
          .select($"user_id", $"event_id").as[(Long, Long)].collect().toSet
        assert(got == Set((1L, 20L)),
          s"exactly the planted spike must alarm, got $got")
        // bit-identical to the batch shadow (q67's oracle-checked path)
        val batch = graft.streaming.AnomalyDetector.batch(
          (calm ++ Seq((1L, 20L, t(20), 25.0), (1L, 21L, t(21), 10.0)))
            .toDF("user_id", "event_id", "ts", "value"))
          .select($"user_id", $"event_id").as[(Long, Long)].collect().toSet
        assert(batch == got, "streaming state and window shadow disagree")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState gap-sequence DP matches the q86 batch output across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // the REAL sf events, globally event-time-ordered (micro-exact),
      // replayed in three micro-batches so the per-user DP state must
      // survive two store roundtrips mid-funnel
      val evs = graft.Tables.events(spark, sfDir)
        .select($"user_id", $"event_id",
          expr("unix_micros(ts)").as("tsu"), $"event_type")
        .as[(Long, Long, Long, String)].collect()
        .sortBy(r => (r._3, r._2)).toSeq
      val mem = MemoryStream[(Long, Long, Long, String)]
      val events = mem.toDF().toDF("user_id", "event_id", "tsu", "event_type")
        .withColumn("ts", expr("timestamp_micros(tsu)"))
      val q = graft.streaming.SequenceMatchStream.track(events)
        .writeStream.format("memory").queryName("seqmatch_mem")
        .outputMode("append").start()
      try {
        val third = (evs.length + 2) / 3
        evs.grouped(third).foreach { slice =>
          mem.addData(slice)
          q.processAllAvailable()
        }
        // a planted user completing the chain with 10-minute gaps, its
        // three steps split across THREE further micro-batches so every
        // stage transition crosses a state-store roundtrip (no sf0.001
        // user completes the chain within 1-hour gaps — without the
        // plant the matched=true path would go untested)
        val planted = 999999L
        val t0 = evs.last._3 + 1000000L
        Seq("view", "click", "purchase").zipWithIndex.foreach { case (ty, i) =>
          mem.addData(Seq((planted, 900000L + i, t0 + i * 600000000L, ty)))
          q.processAllAvailable()
        }
        // an out-of-order 'view' for the planted user (earlier than its
        // last applied event): if applied it would rewind l1 and break
        // the funnel; the ordering guard must drop-and-count it instead
        mem.addData(Seq((planted, 900010L, t0 - 1000000L, "view")))
        q.processAllAvailable()
        // the DP state only advances, so each user's FINAL state is the
        // componentwise max over its emitted per-batch rows
        val got = spark.table("seqmatch_mem")
          .groupBy($"user_id")
          .agg(max($"l1").as("l1"), max($"l2").as("l2"), max($"l3").as("l3"))
          .collect()
          .map { r =>
            val s = (r.getLong(1), r.getLong(2), r.getLong(3))
            (r.getLong(0),
              graft.streaming.SequenceMatchStream.stageOf(s), s._3 >= 0)
          }.toSet
        val plantedDrops = spark.table("seqmatch_mem")
          .filter($"user_id" === planted)
          .agg(max($"n_dropped"), min($"l1")).as[(Long, Long)].head()
        assert(plantedDrops._1 == 1L,
          s"out-of-order event must be counted once: $plantedDrops")
        assert(plantedDrops._2 == t0,
          s"late view must not rewind l1: $plantedDrops")
        val batch = SparkEntry.queries("q86_sequence_match_gap")(spark, sfDir)
          .as[(Long, Int, Boolean)].collect().toSet
        assert(got.filterNot(_._1 == planted) == batch,
          s"stream DP diverged from q86 batch: ${got.diff(batch)} / ${batch.diff(got)}")
        assert(got.contains((planted, 3, true)),
          s"planted cross-batch funnel must complete: ${got.filter(_._1 == planted)}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState EMA is bit-identical to the q87 batch fold across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // the float-state stress: the double EMA must survive two RocksDB
      // roundtrips mid-series and still floor() to the batch value
      val evs = graft.Tables.events(spark, sfDir)
        .select($"user_id", $"event_id",
          expr("unix_micros(ts)").as("tsu"), $"value")
        .as[(Long, Long, Long, Double)].collect()
        .sortBy(r => (r._3, r._2)).toSeq
      val mem = MemoryStream[(Long, Long, Long, Double)]
      val events = mem.toDF().toDF("user_id", "event_id", "tsu", "value")
        .withColumn("ts", expr("timestamp_micros(tsu)"))
      val q = graft.streaming.EmaStream.track(events)
        .writeStream.format("memory").queryName("ema_mem")
        .outputMode("append").start()
      try {
        val third = (evs.length + 2) / 3
        evs.grouped(third).foreach { slice =>
          mem.addData(slice)
          q.processAllAvailable()
        }
        // an out-of-order replay of one user's FIRST event, arriving
        // after its whole series: if applied it would corrupt the EMA
        // forever; the ordering guard must drop-and-count it so the
        // batch comparison below still holds exactly
        val victim = evs.head
        mem.addData(Seq(victim))
        q.processAllAvailable()
        // n_seen is monotone per user: max row = final state
        val got = spark.table("ema_mem")
          .groupBy($"user_id")
          .agg(max(struct($"n_seen", $"ema_micros")).as("f"))
          .select($"user_id", $"f.n_seen", $"f.ema_micros")
          .as[(Long, Long, Long)].collect().toSet
        val batch = SparkEntry.queries("q87_exp_moving_avg")(spark, sfDir)
          .as[(Long, Long, Long)].collect().toSet
        assert(got == batch,
          s"stream EMA diverged from q87 batch: ${got.diff(batch)} / ${batch.diff(got)}")
        val victimDrops = spark.table("ema_mem")
          .filter($"user_id" === victim._1)
          .agg(max($"n_dropped")).as[Long].head()
        assert(victimDrops == 1L,
          s"out-of-order replay must be counted once, got $victimDrops")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState TTL evicts idle users and rebuilds on re-arrival") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Long, Long, Double)]
      val events = mem.toDF().toDF("user_id", "event_id", "tsu", "value")
        .withColumn("ts", expr("timestamp_micros(tsu)"))
      val ttl = java.time.Duration.ofSeconds(4)
      // NOTE: TimeMode.ProcessingTime makes the engine construct timer
      // batches continuously, so processAllAvailable never settles —
      // the sink is POLLED for the expected row instead (with a hard
      // timeout), which is also how a production monitor would observe
      // the stream
      val q = graft.streaming.EmaStream.track(events, Some(ttl))
        .writeStream.format("memory").queryName("ema_ttl_mem")
        .outputMode("append").start()
      def awaitRow(cond: org.apache.spark.sql.DataFrame => Boolean,
          what: String, timeoutMs: Long = 60000): Unit = {
        val t0 = System.nanoTime()
        while (!cond(spark.table("ema_ttl_mem"))) {
          assert((System.nanoTime() - t0) / 1e6 < timeoutMs,
            s"timed out waiting for $what")
          Thread.sleep(200)
        }
      }
      try {
        val t0 = System.nanoTime()
        // batch 1: users 1 and 2, two events each
        mem.addData(Seq((1L, 10L, 1000000L, 4.0), (1L, 11L, 2000000L, 8.0),
          (2L, 20L, 1000000L, 6.0), (2L, 21L, 2000000L, 6.0)))
        awaitRow(_.filter($"user_id" === 1L && $"n_seen" === 2L).count() > 0,
          "batch-1 state for user 1")
        // within the TTL: user 2 continues its series (only asserted
        // when the machine was fast enough for the claim to be valid)
        mem.addData(Seq((2L, 22L, 3000000L, 6.0)))
        awaitRow(_.filter($"user_id" === 2L && $"n_seen" >= 1L).count() >= 2,
          "batch-2 output for user 2")
        if ((System.nanoTime() - t0) / 1e9 < 3.5) {
          val u2 = spark.table("ema_ttl_mem").filter($"user_id" === 2L)
            .agg(max($"n_seen")).as[Long].head()
          assert(u2 == 3L, s"state inside the TTL must persist, n_seen=$u2")
        }
        // let user 1's state expire, then re-arrive with an EARLIER
        // timestamp than its batch-1 events: if the state survived, the
        // ordering watermark would DROP this row (n_dropped=1, n_seen
        // stuck at 2); eviction + rebuild applies it as a fresh series
        // (n_seen=1, ema_micros=2_000_000, no drop)
        Thread.sleep(6500)
        mem.addData(Seq((1L, 12L, 500000L, 2.0)))
        awaitRow(_.filter($"user_id" === 1L)
            .filter($"ema_micros" === 2000000L || $"n_dropped" >= 1L)
            .count() > 0, "post-TTL re-arrival output for user 1")
        val rebuilt = spark.table("ema_ttl_mem").filter($"user_id" === 1L)
          .filter($"ema_micros" === 2000000L && $"n_seen" === 1L
            && $"n_dropped" === 0L).count()
        assert(rebuilt > 0,
          "re-arrival after TTL must REBUILD (n_seen=1, ema=value, no drop); got " +
            spark.table("ema_ttl_mem").filter($"user_id" === 1L)
              .collect().mkString(", "))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
