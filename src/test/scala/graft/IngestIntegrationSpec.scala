package graft

import graft.sources.{DocsisFixtures, HnapAuth, TransportRegistry}
import graft.storage.{BufferedFactSink, FactTable}
import graft.streaming.DocsisStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The whole reference topology end-to-end on the new storage layer:
  * HNAP scrape source (DSv2, WAL-backed) → parse expressions → Buffer
  * dual-threshold sink → transaction-logged fact table → dashboard
  * query over the snapshot read. mb8600.py scrape loop + tables.sql
  * Buffer/MergeTree, as one pipeline.
  */
class IngestIntegrationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private class FakeModem(payloads: Seq[String]) extends HnapAuth.Transport {
    var scrapes = 0
    def post(h: Map[String, String], c: Map[String, String], body: String): String =
      if (body.contains("\"request\"")) {
        """{"LoginResponse": {"Challenge": "C1", "Cookie": "u1", "PublicKey": "P1"}}"""
      } else if (body.contains("\"login\"")) {
        """{"LoginResponse": {"LoginResult": "OK"}}"""
      } else {
        val p = payloads(scrapes % payloads.size)
        scrapes += 1
        p
      }
  }

  test("scrape source → parse → buffered sink → logged table → dashboard") {
    val modem = new FakeModem(DocsisFixtures.scrapes.take(3).map(_._1))
    TransportRegistry.register("e2e", modem)
    val table = new FactTable(
      java.nio.file.Files.createTempDirectory("ingest_e2e").toString, spark)
    // rows threshold 2 → the 3-scrape run flushes mid-stream, leaving
    // both tiers exercised (some rows merged, possibly some buffered)
    val sink = new BufferedFactSink(table, maxAgeMs = Long.MaxValue / 2,
      maxRows = 2, maxBytes = Long.MaxValue)
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_ckpt").toString

    val raw = spark.readStream
      .format("graft.sources.HnapScrapeProvider")
      .option("transportId", "e2e").option("modemName", "MB8600")
      .option("maxScrapes", "3")
      .load()
    val parsed = DocsisStream.parseStream(
      raw.withColumn("timestamp", col("timestamp").cast("timestamp")))
    val q = parsed.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.addBatch(df, id))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()

    val stored = table.read()
    val n = stored.count()
    assert(n >= 1 && n <= 3, s"expected the polled scrapes, got $n")
    assert(n == modem.scrapes, "every scrape must land exactly once")
    // the stored rows are full fact rows: nested channels survive the
    // storage round-trip and the dashboard explode works off the table
    val down = stored
      .select($"modem_name", explode($"downstream_channels").as("ch"))
      .select($"modem_name", $"ch.channel_id", $"ch.snr")
    assert(down.count() >= 2)
    assert(down.filter($"modem_name" === "MB8600").count() == down.count())
    // day-partition column present for pruning on the merged tier
    assert(stored.columns.contains("date"))
  }

  test("full-topology soak: sustained scrape ingest + dedup + anomaly legs, bounded state") {
    // VERDICT r8 punch #4: the whole pipeline in ONE sustained run —
    // scrape source paced one scrape per micro-batch → parse → Buffer
    // dual-threshold sink → logged fact table, concurrently with the d20
    // survivors-index dedup ingest and the q67 transformWithState anomaly
    // leg over real events — with a StreamingQueryListener proving the
    // stateful leg's state is bounded by KEY cardinality (users), not by
    // input rows, and row conservation asserted end-to-end on every leg.
    import graft.operators.DedupQueries
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import scala.collection.mutable
    import TestSpark.sfDir
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    // progress capture: queryName -> max total state rows, batches seen
    val maxState = mutable.Map[String, Long]().withDefaultValue(-1L)
    val batchesSeen = mutable.Map[String, Long]().withDefaultValue(0L)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val name = Option(e.progress.name).getOrElse(return)
        maxState.synchronized {
          if (e.progress.numInputRows > 0)
            batchesSeen(name) = batchesSeen(name) + 1
          val st = e.progress.stateOperators.map(_.numRowsTotal).sum
          maxState(name) = math.max(maxState(name), st)
        }
      }
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.streams.addListener(listener)
    implicit val sqlCtx = spark.sqlContext
    try {
      // ---- leg 1: scrape → parse → Buffer sink → logged table --------
      val nScrapes = 12
      // full fixture cycle includes session-expiry payloads, so the raw
      // post count can exceed committed scrapes (re-login + re-scrape);
      // conservation is asserted on STORED rows vs the scrape budget
      val modem = new FakeModem(DocsisFixtures.scrapes.map(_._1))
      TransportRegistry.register("soak", modem)
      val fact = new FactTable(tmp("soak_fact"), spark)
      // rows threshold 4 → at least two mid-run flushes across 12 rows;
      // age/bytes thresholds parked so the trip condition is deterministic
      val sink = new BufferedFactSink(fact, maxAgeMs = Long.MaxValue / 2,
        maxRows = 4, maxBytes = Long.MaxValue)
      val raw = spark.readStream
        .format("graft.sources.HnapScrapeProvider")
        .option("transportId", "soak").option("modemName", "MB8600")
        .option("maxScrapes", nScrapes.toString)
        .load()
      val q1 = DocsisStream.parseStream(
          raw.withColumn("timestamp", col("timestamp").cast("timestamp")))
        .writeStream
        .queryName("soak_scrape")
        .option("checkpointLocation", tmp("soak_ckpt1"))
        .outputMode("append")
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.addBatch(df, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(25))
        .start()

      // ---- leg 2: d20 survivors-index dedup ingest -------------------
      val docs = DedupQueries.corpus(spark, sfDir)
      val docBatches = (0 to 2).map(k =>
        docs.filter($"doc_id" % 3 === k).select($"doc_id", $"text")
          .as[(Long, String)].collect().toSeq)
      val docMem = MemoryStream[(Long, String)]
      val decsT = new FactTable(tmp("soak_decs"), spark)
      val dedup = new graft.streaming.DedupIngest(
        new FactTable(tmp("soak_bands"), spark),
        new FactTable(tmp("soak_sets"), spark), decsT)
      val q2 = dedup.start(docMem.toDF().toDF("doc_id", "text"), tmp("soak_ckpt2"))

      // ---- leg 3: q67 anomaly leg over the REAL events table ---------
      val evRows = Tables.events(spark, sfDir)
        .select($"user_id", $"event_id", $"ts", $"value")
        .orderBy($"ts", $"event_id")
        .as[(Long, Long, java.sql.Timestamp, Double)].collect()
      val nUsers = evRows.map(_._1).distinct.length
      val evMem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
      val q3 = graft.streaming.AnomalyDetector.detect(
          evMem.toDF().toDF("user_id", "event_id", "ts", "value"))
        .writeStream.format("memory").queryName("soak_anomaly")
        .outputMode("append").start()

      try {
        // sustained run: event-time-ordered quarters of the events table
        // interleaved with the dedup batches, while leg 1 polls the modem
        // one scrape per micro-batch in the background
        val quarters = evRows.grouped(math.max(1, evRows.length / 4)).toSeq
        quarters.zipWithIndex.foreach { case (chunk, i) =>
          evMem.addData(chunk.toIndexedSeq); q3.processAllAvailable()
          if (i < docBatches.size) {
            docMem.addData(docBatches(i)); q2.processAllAvailable()
          }
        }
        // leg 1 drains on its own clock: wait for all 12 commits
        val deadline = System.nanoTime() + 120e9.toLong
        while (fact.read().count() < nScrapes && System.nanoTime() < deadline)
          Thread.sleep(100)
        q1.stop(); q1.awaitTermination(30000)

        // ---- row conservation, every leg ---------------------------
        val stored = fact.read()
        assert(stored.count() == nScrapes && modem.scrapes >= nScrapes,
          s"scrape leg lost/duplicated rows: stored=${stored.count()} scraped=${modem.scrapes}")
        assert(stored.select($"timestamp").distinct().count() == nScrapes,
          "scrape rows must be unique per scrape instant")
        assert(decsT.read().count() == docs.count(),
          "every ingested doc must receive exactly one dedup decision")
        val streamedAnoms = spark.table("soak_anomaly")
          .select($"user_id", $"event_id").as[(Long, Long)].collect().toSet
        val shadowAnoms = graft.streaming.AnomalyDetector.batch(
            evRows.toIndexedSeq.toDF("user_id", "event_id", "ts", "value"))
          .select($"user_id", $"event_id").as[(Long, Long)].collect().toSet
        assert(streamedAnoms == shadowAnoms,
          s"anomaly leg diverged from the q67 batch shadow: " +
            s"${(streamedAnoms diff shadowAnoms).take(5)} / ${(shadowAnoms diff streamedAnoms).take(5)}")

        // ---- bounded state: keyed by user, not by event volume -----
        val (anomalyState, anomalyBatches) = maxState.synchronized {
          (maxState("soak_anomaly"), batchesSeen("soak_anomaly")) }
        assert(anomalyBatches >= quarters.size,
          s"soak must span micro-batches, saw $anomalyBatches")
        assert(anomalyState > 0 && anomalyState <= nUsers,
          s"anomaly state must be O(users=$nUsers) rows, saw $anomalyState " +
            s"for ${evRows.length} input events")

        // ---- Buffer semantics: the dual-threshold sink really merged
        // mid-run (rows threshold 4 over 12 single-row batches)
        val snap = fact.snapshot()
        assert(snap.bufferRows < nScrapes,
          s"expected mid-run flushes, all $nScrapes rows still buffered")

        // ---- dashboard slice over the logged table -----------------
        val dash = stored
          .select($"modem_name", $"timestamp",
            explode($"downstream_channels").as("ch"))
          .groupBy($"modem_name", $"ch.channel_id")
          .agg(count(lit(1)).as("n"), avg($"ch.snr").as("avg_snr"))
        val rows = dash.collect()
        assert(rows.nonEmpty && rows.forall(_.getAs[Long]("n") > 0),
          "dashboard slice must aggregate the soaked table")
        assert(dash.filter($"avg_snr".isNull).count() == 0,
          "SNR must survive the full parse→buffer→merge path")
      } finally { Seq(q1, q2, q3).foreach(q => if (q.isActive) q.stop()) }
    } finally {
      spark.streams.removeListener(listener)
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
