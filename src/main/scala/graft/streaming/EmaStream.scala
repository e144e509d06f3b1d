package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming exponential moving average — q87's sequential recurrence
  * e_n = 0.25·x_n + 0.75·e_{n−1} maintained incrementally per user via
  * `transformWithState`, completing the q86/q87 pair's production shape:
  * the batch entry folds each user's full sorted history per run, the
  * serving path keeps (started, e) per user and advances it as events
  * arrive. Bit-equality with the batch fold holds across any micro-batch
  * slicing of the same event-time order because the state IS the
  * per-prefix fold state and doubles round-trip the RocksDB store
  * bit-exactly — StreamingSpec asserts final floor(e·1e6) values equal
  * the q87 batch output on the identical event set.
  *
  * State per key: one boolean + one double. Rows are sorted by event
  * time within each micro-batch (the iterator carries no order
  * contract); cross-batch order is the trigger's responsibility.
  */
object EmaStream {
  case class Obs(user_id: Long, event_id: Long, tsMicros: Long,
      value: Double)
  case class Ema(user_id: Long, n_seen: Long, ema_micros: Long)

  /** One recurrence step — q87's multiply-add order, verbatim. */
  def step(started: Boolean, e: Double, x: Double): Double =
    if (started) 0.25 * x + 0.75 * e else x

  private class Processor extends StatefulProcessor[Long, Obs, Ema] {
    @transient private var st: ValueState[(Boolean, Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Boolean, Double, Long)]("ema",
        Encoders.product[(Boolean, Double, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
        timers: TimerValues): Iterator[Ema] = {
      var (started, e, n) = if (st.exists()) st.get()
        else (false, 0.0, 0L)
      rows.toSeq.sortBy(r => (r.tsMicros, r.event_id)).foreach { r =>
        e = step(started, e, r.value); started = true; n += 1
      }
      st.update((started, e, n))
      Iterator.single(Ema(key, n, math.floor(e * 1000000.0).toLong))
    }
  }

  /** Streaming path: groupByKey(user) → transformWithState; one Ema row
    * per touched user per micro-batch (the latest per user is current).
    */
  def track(events: DataFrame): Dataset[Ema] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[Obs]
      .groupByKey(_.user_id)
      .transformWithState(new Processor,
        TimeMode.None(), OutputMode.Append(), Encoders.product[Ema])
  }
}
