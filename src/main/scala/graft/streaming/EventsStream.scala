package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming analytics over the events table (SURVEY.md §2.D streaming
  * row): event-time windowed aggregation with watermarks, session
  * windows for outage/gap detection, and within-watermark dedup.
  * The same parquet dir is readable as a stream (file source), which is
  * how tests drive it deterministically.
  */
object EventsStream {

  /** Fallback schema when events.parquet carries TIMESTAMP(NANOS): read ts
    * as raw nanos via the shared explicit schema, matching Tables.events
    * (no session-conf mutation).
    */
  val rawSchema: StructType = graft.Tables.eventsRawSchema

  /** (read schema, ts-normalizing transform) for an events parquet dir,
    * keyed off the footer's actual logical type like Tables.events — the
    * stream source needs an explicit schema, so sniff it from a one-off
    * batch inference instead of hardcoding the physical encoding.
    */
  def sniff(spark: SparkSession, dir: String): (StructType, DataFrame => DataFrame) = {
    val path = s"$dir/events.parquet"
    scala.util.Try(spark.read.parquet(path).schema) match {
      case scala.util.Success(s) =>
        val fix: DataFrame => DataFrame =
          s.find(_.name == "ts").map(_.dataType) match {
            case Some(TimestampNTZType) =>
              _.withColumn("ts", col("ts").cast(TimestampType))
            case Some(LongType) =>
              _.withColumn("ts", timestamp_micros(expr("ts div 1000")))
            case _ => identity
          }
        (s, fix)
      case scala.util.Failure(_) => // TIMESTAMP(NANOS) footer
        (rawSchema, _.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
    }
  }

  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val (schema, fix) = sniff(spark, dir)
    fix(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(dir))
  }

  /** Tumbling 15-minute counts/sums per event type, 30-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding windows: 30-minute span advancing every 10 minutes — each
    * event lands in 3 overlapping buckets.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows per user with a 30-minute inactivity gap — the
    * streaming form of q19_sessionize.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Within-watermark exactly-once guard on replayed event ids. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static join: the static side (a dimension) is re-read per
    * micro-batch and broadcast — no state required.
    */
  def enrichWithStatic(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream join: purchases matched to signups of the same user
    * within the preceding 7 days. Both sides carry watermarks and the
    * join has a time-range condition, so Spark can bound the state it
    * keeps for each side.
    */
  def purchaseSignupJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL '7' DAY"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("s_ts"))
  }

  /** Stream-stream LEFT OUTER join: every purchase, with its matching
    * signup when one exists. Unmatched purchases are held in state until
    * the watermark passes the end of their join window, THEN emitted with
    * nulls — the state-eviction semantics that distinguish streaming
    * outer joins from batch ones (a row can only be declared unmatched
    * once late signups are impossible).
    */
  def purchaseSignupLeftJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL '7' DAY"),
      "left_outer")
      .select(col("p_id"), col("user_id"), col("p_ts"), col("s_ts"))
  }

  /** In-plan data-quality metrics via Dataset.observe — per micro-batch
    * row count, null-props count, and value sum surface through
    * StreamingQueryProgress.observedMetrics with zero extra passes over
    * the data (the observation rides the existing plan).
    */
  def withQualityMetrics(events: DataFrame): DataFrame =
    events.observe("ingest_quality",
      count(lit(1)).as("rows"),
      count(when(col("props").isNull, 1)).as("null_props"),
      sum(col("value")).as("sum_value"))
}
