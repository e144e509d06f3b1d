package graft.streaming

import graft.sources.HnapParse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming ingestion path (SURVEY.md §2.A "Scrape source" →
  * §2.C Buffer engine): the reference's scrape loop is an unbounded
  * source at fixed cadence feeding a bounded queue and a batch-INSERT
  * consumer (mb8600.py:313-443, 294-311); the ClickHouse Buffer engine
  * flushes ≤10 s (tables.sql:57). In Spark that whole topology is one
  * micro-batch streaming query: source → parse expressions → checkpointed
  * append sink with a 10 s processing-time trigger. Exactly-once via
  * checkpointing — deliberately stronger than the reference's
  * drop-batch-on-error policy (mb8600.py:308-311), per SURVEY.md §7.
  *
  * The HNAP login/auth handshake (mb8600.py:189-259) is a driver-side
  * connector concern: in production a DSv2 MicroBatchStream would poll
  * the modem per batch; tests feed the same payloads via MemoryStream,
  * which exercises every operator downstream of the socket.
  */
object DocsisStream {

  /** Parse a raw scrape stream (payload/modem_name/scrape_latency/
    * timestamp) into the docsis fact schema. Pure expressions — valid in
    * batch and streaming alike.
    */
  def parseStream(raw: DataFrame): DataFrame = HnapParse.parse(raw)

  /** Checkpointed append sink in the reference's physical layout: day
    * partitions (tables.sql:30), 10 s trigger (Buffer max-time flush,
    * tables.sql:57). The rows/bytes Buffer thresholds have no Spark
    * trigger equivalent — accepted semantic difference per SURVEY.md §7
    * (flush-within-10s is satisfied).
    */
  def factTableWriter(parsed: DataFrame, outPath: String,
      checkpoint: String): DataStreamWriter[Row] =
    parsed
      .withColumn("date", to_date(col("timestamp")))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .trigger(Trigger.ProcessingTime("10 seconds"))

  /** The dashboard aggregation as a streaming query: per-minute per-modem
    * downstream SNR stats with a 1-minute watermark for late scrapes.
    */
  def snrWindowed(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("timestamp", "1 minute")
      .select(col("modem_name"), col("timestamp"),
        explode(col("downstream_channels")).as("ch"))
      .groupBy(
        window(col("timestamp"), "1 minute"),
        col("modem_name"), col("ch.channel_id").as("channel_id"))
      .agg(
        avg(col("ch.snr")).as("avg_snr"),
        min(col("ch.snr")).as("min_snr"),
        sum(col("ch.uncorrected_errors")).as("sum_uncorrected"))

  /** Stateful dedup of replayed scrapes within the watermark — the
    * exactly-once guard the reference lacks entirely.
    */
  def dedupScrapes(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("timestamp", "2 minutes")
      .dropDuplicatesWithinWatermark("modem_name", "timestamp")
}
