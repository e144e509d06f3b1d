package graft

import graft.sources.{DocsisFixtures, HnapAuth, TransportRegistry}
import graft.streaming.DocsisStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class ScrapeSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Canned modem: serves login rounds, then cycles scrape payloads;
    * counts how many logins happened (for the re-auth test).
    */
  private class FakeModem(payloads: Seq[String]) extends HnapAuth.Transport {
    var logins = 0
    var scrapes = 0
    def post(h: Map[String, String], c: Map[String, String], body: String): String =
      if (body.contains("\"request\"")) {
        """{"LoginResponse": {"Challenge": "C1", "Cookie": "u1", "PublicKey": "P1"}}"""
      } else if (body.contains("\"login\"")) {
        logins += 1
        """{"LoginResponse": {"LoginResult": "OK"}}"""
      } else {
        val p = payloads(scrapes % payloads.size)
        scrapes += 1
        p
      }
  }

  test("DSv2 micro-batch source: login, poll per batch, parse downstream") {
    val modem = new FakeModem(DocsisFixtures.scrapes.take(3).map(_._1))
    TransportRegistry.register("t1", modem)
    val raw = spark.readStream
      .format("graft.sources.HnapScrapeProvider")
      .option("transportId", "t1").option("modemName", "MB8600")
      .option("username", "admin").option("password", "motorola")
      .option("maxScrapes", "3")
      .load()
    val parsed = DocsisStream.parseStream(
      raw.withColumn("timestamp", col("timestamp").cast("timestamp")))
    val q = parsed.writeStream.format("memory").queryName("scrape_src")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val out = spark.table("scrape_src")
      assert(out.count() >= 1) // AvailableNow admits ≥1 polled scrape
      assert(modem.logins == 1) // session reused across scrapes
      val r = out.select($"modem_name", size($"downstream_channels"))
        .as[(String, Int)].head()
      assert(r._1 == "MB8600" && r._2 == 3)
    } finally q.stop()
  }

  test("fleet: per-modem sources union into one stream (one process per modem → one query)") {
    // the reference deploys one exporter process per modem; here N modems
    // are N DSv2 sources unioned into a single streaming plan, each with
    // its own session/offsets, landing in one fact stream
    val modemA = new FakeModem(DocsisFixtures.scrapes.take(2).map(_._1))
    val modemB = new FakeModem(DocsisFixtures.scrapes.take(2).map(_._1))
    TransportRegistry.register("fleet-a", modemA)
    TransportRegistry.register("fleet-b", modemB)
    def src(id: String, name: String) = spark.readStream
      .format("graft.sources.HnapScrapeProvider")
      .option("transportId", id).option("modemName", name)
      .option("username", "admin").option("password", "motorola")
      .option("maxScrapes", "2")
      .load()
    val union = src("fleet-a", "MB8600-A").unionByName(src("fleet-b", "MB8600-B"))
    val parsed = DocsisStream.parseStream(
      union.withColumn("timestamp", col("timestamp").cast("timestamp")))
    val q = parsed.writeStream.format("memory").queryName("fleet_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val out = spark.table("fleet_mem")
      val names = out.select($"modem_name").distinct()
        .as[String].collect().toSet
      assert(names == Set("MB8600-A", "MB8600-B"),
        s"both modems must land in the unioned stream, got $names")
      assert(modemA.logins == 1 && modemB.logins == 1,
        "each source authenticates its own session exactly once")
    } finally q.stop()
  }

  test("restart continues offsets from the scrape WAL — no loss, no replay") {
    val modem = new FakeModem(DocsisFixtures.scrapes.take(3).map(_._1))
    TransportRegistry.register("t3", modem)
    val base = java.nio.file.Files.createTempDirectory("scrape_restart").toString
    def run(maxScrapes: Int): Unit = {
      val raw = spark.readStream
        .format("graft.sources.HnapScrapeProvider")
        .option("transportId", "t3").option("maxScrapes", maxScrapes.toString)
        .load()
      val q = raw.writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    run(maxScrapes = 2)
    val n1 = spark.read.parquet(s"$base/out").count()
    run(maxScrapes = 4) // new stream instance, same checkpoint
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() > n1)          // new scrapes flowed after restart
    // exactly-once: every scrape the modem served reached the sink once
    assert(out.count() == modem.scrapes)
  }

  test("restart after full commit resumes at the committed watermark") {
    // The advisor's round-1 scenario: every batch committed → WAL pruned →
    // a naive WAL-derived counter would reset to 0 and the checkpoint's
    // offset N would silently shadow the first post-restart scrapes.
    import graft.sources.{HnapMicroBatchStream, ScrapeOffset, ScrapePartition}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val modem = new FakeModem(DocsisFixtures.scrapes.take(3).map(_._1))
    TransportRegistry.register("t4", modem)
    val ckpt = java.nio.file.Files.createTempDirectory("scrape_marker").toString
    def opts = new CaseInsensitiveStringMap(
      java.util.Map.of("transportId", "t4"))
    val s1 = new HnapMicroBatchStream(opts, ckpt)
    s1.latestOffset(); s1.latestOffset()
    assert(s1.planInputPartitions(ScrapeOffset(0), ScrapeOffset(2)).length == 2)
    s1.commit(ScrapeOffset(2)) // ALL batches committed → WAL entries pruned
    // restart: fresh instance over the same checkpoint dir
    val s2 = new HnapMicroBatchStream(opts, ckpt)
    val next = s2.latestOffset().asInstanceOf[ScrapeOffset].n
    assert(next == 3, s"counter must resume at committed watermark 2, got ${next - 1}")
    // the post-restart scrape is plannable — nothing shadowed or dropped
    val parts = s2.planInputPartitions(ScrapeOffset(2), ScrapeOffset(3))
    assert(parts.length == 1 &&
      parts.head.asInstanceOf[ScrapePartition].payload.nonEmpty)
    // a genuinely missing offset fails loudly instead of narrowing the batch
    val ex = intercept[IllegalStateException] {
      s2.planInputPartitions(ScrapeOffset(0), ScrapeOffset(2))
    }
    assert(ex.getMessage.contains("missing"))
  }

  test("expired session triggers re-login and retry (mb8600.py:354-360)") {
    // first scrape returns a non-OK result → source must re-login + retry
    val unauth = DocsisFixtures.scrapes(3)._1 // the UN-AUTH fixture
    val ok = DocsisFixtures.scrapes.head._1
    val modem = new FakeModem(Seq(unauth, ok, ok, ok))
    TransportRegistry.register("t2", modem)
    val raw = spark.readStream
      .format("graft.sources.HnapScrapeProvider")
      .option("transportId", "t2").option("maxScrapes", "1")
      .load()
    val q = raw.writeStream.format("memory").queryName("scrape_reauth")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val payloads = spark.table("scrape_reauth").select($"payload")
        .as[String].collect()
      assert(payloads.length == 1)
      assert(payloads.head.contains("\"GetMultipleHNAPsResult\": \"OK\""))
      assert(modem.logins == 2) // initial + recovery re-login
    } finally q.stop()
  }
}
