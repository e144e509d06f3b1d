package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via flatMapGroupsWithState (SURVEY.md
  * §2.D streaming row / §7 "counter-reset state"): detect modem reboots
  * as uptime going backwards between consecutive snapshots — the event a
  * dashboard needs to segment counter-rate series (uptime resets imply
  * the error counters restarted too, mb8600.py:401-410 + tables.sql:19).
  */
object RebootDetector {

  final case class Snapshot(modem_name: String, ts: java.sql.Timestamp,
      modem_uptime: Long)
  final case class Reboot(modem_name: String, ts: java.sql.Timestamp,
      prev_uptime: Long, uptime: Long)
  final case class UptimeState(lastTs: Long, lastUptime: Long)

  def detect(snapshot: Iterator[Snapshot], key: String,
      state: GroupState[UptimeState]): Iterator[Reboot] = {
    // process in event-time order within the batch; drop late arrivals
    // that sort before the stored state (comparing a stale snapshot
    // against newer uptime would emit a spurious reboot AND regress
    // the state)
    val sorted = snapshot.toSeq.sortBy(_.ts.getTime)
    val out = Seq.newBuilder[Reboot]
    var prev = state.getOption
    sorted.foreach { s =>
      prev match {
        case Some(UptimeState(lastTs, _)) if s.ts.getTime <= lastTs =>
        // late/duplicate snapshot — ignore
        case Some(UptimeState(_, lastUp)) =>
          if (s.modem_uptime < lastUp)
            out += Reboot(key, s.ts, lastUp, s.modem_uptime)
          prev = Some(UptimeState(s.ts.getTime, s.modem_uptime))
        case None =>
          prev = Some(UptimeState(s.ts.getTime, s.modem_uptime))
      }
    }
    prev.foreach(state.update)
    out.result().iterator
  }

  /** Wire onto a parsed docsis stream (modem_name/timestamp/modem_uptime). */
  def apply(parsed: org.apache.spark.sql.DataFrame)(
      implicit spark: SparkSession): Dataset[Reboot] = {
    import spark.implicits._
    parsed
      .selectExpr("modem_name", "timestamp AS ts", "modem_uptime")
      .as[Snapshot]
      .groupByKey(_.modem_name)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Snapshot], st: GroupState[UptimeState]) =>
          detect(it, key, st))
  }
}
