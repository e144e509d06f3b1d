package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Per-modem uptime segmentation on the arbitrary-state API
  * (`transformWithState`, the Spark 4 successor of
  * flatMapGroupsWithState used by RebootDetector): every snapshot is
  * tagged with a monotonically increasing segment id that bumps when
  * uptime goes backwards (a reboot, tables.sql:19 counter-reset
  * semantics). Rate queries then window within (modem, segment) so a
  * reset never produces a negative or cross-boot delta.
  *
  * State is a single small ValueState per modem (last ts/uptime/segment)
  * in the RocksDB state store — constant memory per key regardless of
  * stream length, which is what survives a 1000-executor deployment.
  */
object UptimeSegmenter {

  final case class Snapshot(modem_name: String, ts: java.sql.Timestamp,
      modem_uptime: Long)
  final case class Segmented(modem_name: String, ts: java.sql.Timestamp,
      modem_uptime: Long, segment: Long)
  final case class SegState(lastTs: Long, lastUptime: Long, segment: Long)

  class Processor extends StatefulProcessor[String, Snapshot, Segmented] {
    @transient private var state: ValueState[SegState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SegState]("seg",
        Encoders.product[SegState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Snapshot],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Segmented] = {
      // event-time order within the batch; late rows (at or before the
      // stored ts) are dropped, matching RebootDetector's guard
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      val out = Seq.newBuilder[Segmented]
      var cur: Option[SegState] =
        if (state.exists()) Some(state.get()) else None
      sorted.foreach { s =>
        cur match {
          case Some(st) if s.ts.getTime <= st.lastTs => // late/duplicate
          case Some(st) =>
            val seg = if (s.modem_uptime < st.lastUptime) st.segment + 1
              else st.segment
            out += Segmented(key, s.ts, s.modem_uptime, seg)
            cur = Some(SegState(s.ts.getTime, s.modem_uptime, seg))
          case None =>
            out += Segmented(key, s.ts, s.modem_uptime, 0L)
            cur = Some(SegState(s.ts.getTime, s.modem_uptime, 0L))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
  }

  /** Wire onto a parsed docsis stream (modem_name/timestamp/modem_uptime). */
  def apply(parsed: org.apache.spark.sql.DataFrame)(
      implicit spark: SparkSession): Dataset[Segmented] = {
    import spark.implicits._
    parsed
      .selectExpr("modem_name", "timestamp AS ts", "modem_uptime")
      .as[Snapshot]
      .groupByKey(_.modem_name)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
