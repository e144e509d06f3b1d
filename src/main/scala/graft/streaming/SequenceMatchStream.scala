package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming gap-constrained sequence match — q86's monotone
  * latest-completion DP maintained INCREMENTALLY per user via
  * `transformWithState`, which is the production shape at 100 TB: the
  * batch entry re-sorts each user's full history into an array on every
  * run, while a funnel service keeps three longs of state per user and
  * advances them as events arrive. The DP is replay-order-safe across
  * micro-batches because its state is exactly the per-prefix fold state:
  * feeding the same events in the same event-time order through any
  * batch slicing yields the same (l1, l2, l3) — StreamingSpec asserts
  * the stream's final verdicts equal the q86 batch output on the
  * identical event set.
  *
  * Transition (shared semantics with `ExtendedQueries.gapDpCol`; the
  * brute-force property test in OperatorSpec covers both through the
  * batch side): l1 tracks the latest 'view'; l2 the latest 'click'
  * within `GapMicros` of l1; l3 the latest 'purchase' within `GapMicros`
  * of l2. Rows are sorted by event time within each micro-batch (the
  * iterator carries no order contract); cross-batch the per-key
  * last-seen watermark in state drops-and-counts out-of-order arrivals
  * (see `St`), so a source that violates event-time order is detected
  * rather than silently corrupting the DP.
  *
  * State per key is three longs in a `ValueState` — O(users) tiny rows
  * on the RocksDB store. Each batch emits the key's updated stage, so
  * downstream sinks see funnel progress as an update stream.
  */
object SequenceMatchStream {
  val GapMicros: Long = 3600000000L // 1h, the q86 constant

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long,
      event_type: String)
  case class Stage(user_id: Long, gap_stage: Int, matched: Boolean,
      l1: Long, l2: Long, l3: Long, n_dropped: Long)

  /** One DP step — the gapDpCol lambda in plain Scala. */
  def advance(s: (Long, Long, Long), typ: String, t: Long)
      : (Long, Long, Long) = {
    val l1 = if (typ == "view") t else s._1
    val l2 = if (typ == "click" && s._1 >= 0 && t - s._1 <= GapMicros) t
      else s._2
    val l3 = if (typ == "purchase" && s._2 >= 0 && t - s._2 <= GapMicros) t
      else s._3
    (l1, l2, l3)
  }

  def stageOf(s: (Long, Long, Long)): Int =
    if (s._3 >= 0) 3 else if (s._2 >= 0) 2 else if (s._1 >= 0) 1 else 0

  /** DP state + ordering watermark: the DP is only replay-safe when
    * events apply in event-time order (a late 'view' would overwrite l1
    * backwards), so the state carries the last-applied (tsMicros,
    * event_id); rows at or before it are dropped and counted, and every
    * emitted Stage surfaces the running drop count — contract
    * violations are observable at the sink instead of silently
    * corrupting the funnel.
    */
  case class St(l1: Long, l2: Long, l3: Long,
      lastTs: Long, lastEid: Long, nDropped: Long)

  private class Processor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Ev, Stage] {
    @transient private var dp: ValueState[St] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      dp = getHandle.getValueState[St]("dp",
        Encoders.product[St], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Stage] = {
      var s = if (dp.exists()) dp.get()
        else St(-1L, -1L, -1L, Long.MinValue, Long.MinValue, 0L)
      rows.toSeq.sortBy(r => (r.tsMicros, r.event_id)).foreach { r =>
        val inOrder = r.tsMicros > s.lastTs ||
          (r.tsMicros == s.lastTs && r.event_id > s.lastEid)
        s = if (inOrder) {
          val d = advance((s.l1, s.l2, s.l3), r.event_type, r.tsMicros)
          St(d._1, d._2, d._3, r.tsMicros, r.event_id, s.nDropped)
        } else s.copy(nDropped = s.nDropped + 1)
      }
      dp.update(s)
      Iterator.single(Stage(key, stageOf((s.l1, s.l2, s.l3)), s.l3 >= 0,
        s.l1, s.l2, s.l3, s.nDropped))
    }
  }

  /** Streaming path: groupByKey(user) → transformWithState; one Stage
    * row per touched user per micro-batch (take the latest per user).
    */
  def track(events: DataFrame,
      stateTtl: Option[java.time.Duration] = None): Dataset[Stage] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      // stateTtl: processing-time eviction of idle users (EmaStream's
      // scaladoc has the contract) — state becomes O(active users)
      .transformWithState(new Processor(stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append(), Encoders.product[Stage])
  }
}
