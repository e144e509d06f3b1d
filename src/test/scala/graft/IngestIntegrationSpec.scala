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
}
