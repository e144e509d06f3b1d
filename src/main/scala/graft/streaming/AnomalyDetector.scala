package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming anomaly detection over the events value series — the
  * `transformWithState` (Spark 4 arbitrary-state) member of the custom-
  * state family, alongside `RebootDetector` (mapGroupsWithState) and
  * `UptimeSegmenter` (flatMapGroupsWithState): one operator per API so
  * the library demonstrates all three state surfaces.
  *
  * Semantics: per user, an event is ANOMALOUS when its value deviates
  * from the user's running mean by more than 4 running standard
  * deviations, with at least `MinPrior` prior events (the plain online
  * z-score alarm). All moments are kept as EXACT integer sums of the
  * value quantized to 2 decimal places — cents and cents² — so the
  * streaming path, the batch shadow (`AnomalyDetector.batch`), and the
  * DuckDB oracle compute bit-identical flags regardless of accumulation
  * order; a double-typed Welford state would drift across the three.
  *
  * State per key is three longs (n, Σcents, Σcents²) in a `ValueState`
  * backed by the RocksDB state store — O(users) tiny rows, the shape
  * that scales to 100 M keys per executor. Rows are sorted by event
  * time WITHIN each micro-batch per key (the iterator carries no order
  * contract); cross-batch order is the trigger's responsibility, as
  * with every event-time streaming op.
  */
object AnomalyDetector {
  val MinPrior = 10
  val SigmaSq = 16L // 4σ, squared — compared in exact cent⁴ space

  case class Reading(user_id: Long, event_id: Long, tsMicros: Long,
      cents: Long)
  case class Anomaly(user_id: Long, event_id: Long, tsMicros: Long,
      cents: Long, n_prior: Long, sum_prior: Long, sumsq_prior: Long)

  /** (x - mean)² > 16·var, carried out in integer arithmetic:
    * mean = S₁/n, var = S₂/n − (S₁/n)² (population). Multiplying both
    * sides by n² keeps everything integral:
    *   (n·x − S₁)² · n > 16 · (n·S₂ − S₁²) · n  …divided by n:
    *   (n·x − S₁)² > 16 · (n·S₂ − S₁²)
    * Exact for |values| ≤ ~1e6 at n ≤ ~1e5 in 128-bit intermediates —
    * BigInt here and HUGEINT in DuckDB; the batch shadow spells the
    * identical inequality.
    */
  def isAnomaly(n: Long, s1: Long, s2: Long, cents: Long): Boolean = {
    if (n < MinPrior) return false
    val bn = BigInt(n)
    val dev = bn * cents - s1
    val varTimesN2 = bn * s2 - BigInt(s1) * s1
    varTimesN2 > 0 && dev * dev > BigInt(SigmaSq) * varTimesN2
  }

  private class Processor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Reading, Anomaly] {
    @transient private var stats: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Long, Long)]("stats",
        Encoders.product[(Long, Long, Long)],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Reading],
        timers: TimerValues): Iterator[Anomaly] = {
      var (n, s1, s2) = if (stats.exists()) stats.get()
        else (0L, 0L, 0L)
      val out = Seq.newBuilder[Anomaly]
      // event-time order within the batch; the state store hands one
      // key's rows to one task, so this sort is bounded by batch size
      rows.toSeq.sortBy(r => (r.tsMicros, r.event_id)).foreach { r =>
        if (isAnomaly(n, s1, s2, r.cents))
          out += Anomaly(key, r.event_id, r.tsMicros, r.cents, n, s1, s2)
        n += 1; s1 += r.cents; s2 += r.cents * r.cents
      }
      stats.update((n, s1, s2))
      out.result().iterator
    }
  }

  /** value → exact cents via the house DECIMAL(18,2) cast (same
    * HALF_UP rounding the DuckDB oracle's decimal cast applies).
    */
  private def centsCol = (col("value")
    .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
    .cast("long")

  /** Streaming path: groupByKey(user) → transformWithState. `stateTtl`:
    * processing-time eviction of idle users (EmaStream's scaladoc has
    * the contract) — per-user moment state becomes O(active users).
    */
  def detect(events: DataFrame,
      stateTtl: Option[java.time.Duration] = None): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), centsCol.as("cents"))
      .as[Reading]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append(), Encoders.product[Anomaly])
  }

  /** Batch shadow: the same flags via prefix-window exact sums — the
    * oracle-checkable twin the driver's DuckDB gate runs (q67).
    */
  def batch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("cents", centsCol)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("s2",
        coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .filter(col("n") >= MinPrior)
      // isAnomaly's integer inequality in 64-bit: exact while
      // n·max(cents)² < 2⁶³ — comfortable at |value| ≤ 1e4 up to 1e9
      // events per user (the streaming processor's BigInt math has no
      // bound at all; DuckDB evaluates these sums in HUGEINT)
      .withColumn("dev", col("n") * col("cents") - col("s1"))
      .withColumn("var_n2",
        col("n") * col("s2") - col("s1") * col("s1"))
      .filter(col("var_n2") > 0 &&
        col("dev") * col("dev") > lit(SigmaSq) * col("var_n2"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("cents"), col("n").as("n_prior"))
  }
}
