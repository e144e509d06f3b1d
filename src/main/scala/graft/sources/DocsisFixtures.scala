package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic HNAP response fixtures (FIXTURES.md §1; formats derived
  * from mb8600.py:21,370-371,390-391 — the reference ships no fixtures).
  * Edge cases covered: OFDM PLC low-SNR correction, OFDM PLC at exactly
  * 20.0 dB (strict <, no correction), whitespace-padded numerics,
  * negative wrapped counters, uptimes missing segments, non-OK response.
  */
object DocsisFixtures {

  def payload(result: String, cfg: String, uptime: String, version: String,
      down: String, up: String): String = {
    def q(s: String) = "\"" + s + "\""
    s"""{"GetMultipleHNAPsResponse": {
       |  "GetMultipleHNAPsResult": ${q(result)},
       |  "GetMotoStatusStartupSequenceResponse": {"MotoConnConfigurationFileComment": ${q(cfg)}},
       |  "GetMotoStatusConnectionInfoResponse": {"MotoConnSystemUpTime": ${q(uptime)}},
       |  "GetMotoStatusDownstreamChannelInfoResponse": {"MotoConnDownstreamChannel": ${q(down)}},
       |  "GetMotoStatusUpstreamChannelInfoResponse": {"MotoConnUpstreamChannel": ${q(up)}},
       |  "GetMotoStatusSoftwareResponse": {"StatusSoftwareSfVer": ${q(version)}}
       |}}""".stripMargin
  }

  /** FIXTURES.md §1.1 — QAM256 / low-SNR OFDM PLC / negative counter. */
  val downstreamBlob1: String =
    "1^Locked^QAM256^5^483.0^ 3.4^43.1^12^0^|+|" +
      "2^Locked^OFDM PLC^33^722.0^ 2.9^16.0^524^3^|+|" +
      "3^Locked^QAM256^6^489.0^-1.2^40.0^7^-42^"

  /** OFDM PLC at exactly 20.0 (no correction) + one above 20. */
  val downstreamBlob2: String =
    "1^Locked^OFDM PLC^48^850.0^1.0^20.0^9^1^|+|" +
      "2^Locked^OFDM PLC^49^860.0^1.5^36.2^11^2^"

  /** FIXTURES.md §1.2 upstream blob. */
  val upstreamBlob1: String =
    "1^Locked^SC-QAM^1^6400^35.6^46.5^|+|2^Locked^OFDMA^9^96000^29.2^41.0^"

  val upstreamBlob2: String = "1^Locked^SC-QAM^2^3200^30.8^45.0^"

  /** (payload, modem_name, scrape_latency, timestamp-string) tuples. */
  val scrapes: Seq[(String, String, Double, String)] = Seq(
    (payload("OK", "cfg-8600-gold.bin", "7 days 03h:42m:05s", "8600-19.3.18",
      downstreamBlob1, upstreamBlob1),
      "MB8600", 0.125, "2024-03-01 00:00:00"),
    (payload("OK", "cfg-8600-gold.bin", "03h:42m:05s", "8600-19.3.18",
      downstreamBlob2, upstreamBlob2),
      "MB8600", 0.25, "2024-03-01 00:00:10"),
    (payload("OK", "cfg-attic.bin", "45s", "8600-19.3.18",
      downstreamBlob1, upstreamBlob2),
      "attic", 0.5, "2024-03-01 00:00:20"),
    // non-OK → must be dropped by the result-status filter (mb8600.py:354)
    (payload("UN-AUTH", "x", "1 days ", "8600-19.3.18",
      downstreamBlob1, upstreamBlob1),
      "MB8600", 0.1, "2024-03-01 00:00:30"),
    (payload("OK", "cfg-8600-gold.bin", "2 days 01h:00m:30s", "8600-19.3.18",
      downstreamBlob2, upstreamBlob1),
      "MB8600", 0.0625, "2024-03-02 00:00:40"))

  /** Fixtures as the raw-scrape DataFrame shape HnapParse.parse expects. */
  def rawFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    scrapes.toDF("payload", "modem_name", "scrape_latency", "ts")
      .withColumn("timestamp", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts")))
      .drop("ts")
  }
}
