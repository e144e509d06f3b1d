package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-field parse/transform pipeline (SURVEY.md §2.B,
  * mb8600.py:368-438) re-expressed as pure native Catalyst expressions —
  * zero UDFs, so the whole chain stays inside whole-stage codegen and the
  * equivalent SQL is oracle-checkable.
  *
  * Wire format (mb8600.py:370-371, 390-391): channels joined by `|+|`,
  * fields by `^`. Downstream: 10 positional fields (3 discarded);
  * upstream: 8 fields (2 discarded). Numeric fields may carry whitespace
  * padding (casts trim). Frequencies arrive in MHz (→Hz ×1e6), upstream
  * width in kHz (→Hz ×1000) — mb8600.py:380,396-397 (whose inline
  * comments mislabel the direction; values are stored in Hz).
  */
object HnapParse {

  /** Uptime regex from mb8600.py:21 — every segment optional. The
    * reference crashes (and silently drops the scrape) when a segment is
    * missing (mb8600.py:404-410 unguarded int()); we coalesce to 0
    * instead, per SURVEY.md §2.B "latent bug to not replicate".
    */
  val uptimeRegex: String = "(?:(\\d+)\\s*days\\s*)?(?:(\\d{2})h:)?(?:(\\d{2})m:)?(?:(\\d{2})s)?"

  /** ANSI-safe numeric field casts: Spark 4 runs with ANSI on, where a
    * malformed string cast THROWS — the moral equivalent of the
    * reference's unguarded int() that silently drops whole scrapes
    * (mb8600.py:404-410, 439-441). We guard with a shape regex instead:
    * malformed field → NULL, the record survives. Length caps keep the
    * subsequent cast/arithmetic inside Long/Int range (ANSI overflow
    * also throws).
    */
  private def guarded(c: Column, re: String): Column =
    when(c.rlike(re), c).otherwise(lit(null))
  def tryLong(c: Column): Column =
    guarded(c, "^\\s*-?\\d{1,18}\\s*$").cast("long")
  def tryInt(c: Column): Column =
    guarded(c, "^\\s*-?\\d{1,9}\\s*$").cast("int")
  def tryDouble(c: Column): Column =
    guarded(c, "^\\s*[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?\\s*$").cast("double")

  private def g(c: Column, i: Int): Column =
    coalesce(tryLong(guarded(regexp_extract(c, uptimeRegex, i), "^\\d{1,9}$")),
      lit(0L))

  /** "7 days 03h:42m:05s" → 615725 s (UInt32-range Long). */
  def uptimeSeconds(c: Column): Column =
    g(c, 1) * 86400L + g(c, 2) * 3600L + g(c, 3) * 60L + g(c, 4)

  /** Split an HNAP channel blob into per-channel field arrays.
    * Channels with fewer than `minFields` fields (e.g. the empty string
    * after a trailing separator) are dropped — mirrors the reference,
    * which only iterates complete tuples.
    */
  private def channelFields(blob: Column, minFields: Int): Column =
    filter(
      transform(split(blob, "\\|\\+\\|"), c => split(c, "\\^")),
      a => size(a) >= minFields)

  /** Downstream blob → array<struct> per tables.sql:11-20.
    * Field positions (1-based; mb8600.py:371): _,_,modulation,channel_id,
    * frequency,power,snr,correcteds,uncorrecteds,_ .
    * OFDM PLC SNR bug fix (mb8600.py:372-376): ×2.5 iff modulation is
    * 'OFDM PLC' AND snr < 20.0 — both conditions, strict <.
    */
  def downstreamChannels(blob: Column): Column =
    transform(channelFields(blob, 10), a => {
      val snr0 = tryDouble(element_at(a, 7))
      struct(
        tryInt(element_at(a, 4)).as("channel_id"),
        (tryDouble(element_at(a, 5)) * 1e6).cast("float").as("frequency"),
        element_at(a, 3).as("modulation"),
        tryDouble(element_at(a, 6)).cast("float").as("power"),
        when(element_at(a, 3) === "OFDM PLC" && snr0 < 20.0, snr0 * 2.5)
          .otherwise(snr0).cast("float").as("snr"),
        tryLong(element_at(a, 8)).as("corrected_errors"),
        tryLong(element_at(a, 9)).as("uncorrected_errors"))
    })

  /** Upstream blob → array<struct> per tables.sql:21-27.
    * Field positions (mb8600.py:391): _,_,modulation,channel_id,width,
    * frequency,power,_ .
    */
  def upstreamChannels(blob: Column): Column =
    transform(channelFields(blob, 8), a =>
      struct(
        tryInt(element_at(a, 4)).as("channel_id"),
        (tryDouble(element_at(a, 6)) * 1e6).cast("float").as("frequency"),
        element_at(a, 3).as("modulation"),
        tryDouble(element_at(a, 7)).cast("float").as("power"),
        (tryDouble(element_at(a, 5)) * 1000).cast("float").as("width")))

  /** JSON paths into the GetMultipleHNAPs envelope (mb8600.py:354,370,
    * 390,402,414-416,429-431).
    */
  private val R = "GetMultipleHNAPsResponse"
  private def path(sub: String, field: String): String = s"$$.$R.$sub.$field"

  /** Full pipeline: a DataFrame with columns `payload` (HNAP response
    * JSON string), `modem_name`, `scrape_latency`, `timestamp` → the
    * docsis fact schema. Non-OK responses are dropped (mb8600.py:354).
    */
  def parse(raw: DataFrame): DataFrame =
    raw
      .filter(get_json_object(col("payload"), s"$$.$R.GetMultipleHNAPsResult") === "OK")
      .select(
        col("modem_name"),
        get_json_object(col("payload"),
          path("GetMotoStatusStartupSequenceResponse", "MotoConnConfigurationFileComment"))
          .as("modem_config_filename"),
        uptimeSeconds(get_json_object(col("payload"),
          path("GetMotoStatusConnectionInfoResponse", "MotoConnSystemUpTime")))
          .as("modem_uptime"),
        get_json_object(col("payload"),
          path("GetMotoStatusSoftwareResponse", "StatusSoftwareSfVer"))
          .as("modem_version"),
        lit("MB8600").as("modem_model"),
        downstreamChannels(get_json_object(col("payload"),
          path("GetMotoStatusDownstreamChannelInfoResponse", "MotoConnDownstreamChannel")))
          .as("downstream_channels"),
        upstreamChannels(get_json_object(col("payload"),
          path("GetMotoStatusUpstreamChannelInfoResponse", "MotoConnUpstreamChannel")))
          .as("upstream_channels"),
        col("scrape_latency").cast("float").as("scrape_latency"),
        col("timestamp").cast("timestamp").as("timestamp"))

  /** Batch write in the reference's physical layout (tables.sql:30):
    * day partitions + (modem_name, timestamp) sort-within-partition for
    * min/max stat skipping — SURVEY.md §1.3.
    */
  def writeFactTable(df: DataFrame, outPath: String): Unit =
    df.withColumn("date", to_date(col("timestamp")))
      .repartition(col("date"))
      .sortWithinPartitions(col("modem_name"), col("timestamp"))
      .write.mode("overwrite")
      .partitionBy("date")
      .parquet(outPath)
}
