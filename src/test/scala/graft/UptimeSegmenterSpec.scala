package graft

import graft.streaming.UptimeSegmenter
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState uptime segmentation: segments bump exactly at
  * uptime regressions, state survives across micro-batches, late rows
  * are dropped. Runs on the RocksDB state store (required by
  * transformWithState).
  */
class UptimeSegmenterSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("segments increment at reboots, persist across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
      val parsed = mem.toDF().toDF("modem_name", "timestamp", "modem_uptime")
      val q = UptimeSegmenter(parsed).toDF()
        .writeStream.format("memory").queryName("uptime_segments")
        .outputMode("append").start()
      // batch 1: normal climb, then a reboot (uptime drops)
      mem.addData(
        ("m1", ts("2024-03-01 00:00:00"), 100L),
        ("m1", ts("2024-03-01 00:00:10"), 110L),
        ("m1", ts("2024-03-01 00:00:20"), 5L), // reboot
        ("m2", ts("2024-03-01 00:00:00"), 50L))
      q.processAllAvailable()
      // batch 2: m1 climbs in the new segment, then reboots again;
      // one late row (ts before stored state) must be dropped
      mem.addData(
        ("m1", ts("2024-03-01 00:00:30"), 15L),
        ("m1", ts("2024-03-01 00:00:40"), 3L), // reboot #2
        ("m1", ts("2024-03-01 00:00:05"), 999L), // LATE — dropped
        ("m2", ts("2024-03-01 00:00:10"), 60L))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("uptime_segments")
        .as[(String, java.sql.Timestamp, Long, Long)]
        .collect().sortBy(r => (r._1, r._2.getTime))
      val m1 = rows.filter(_._1 == "m1").map(r => (r._3, r._4)).toSeq
      assert(m1 == Seq((100L, 0L), (110L, 0L), (5L, 1L), (15L, 1L), (3L, 2L)))
      val m2 = rows.filter(_._1 == "m2").map(r => (r._3, r._4)).toSeq
      assert(m2 == Seq((50L, 0L), (60L, 0L)))
    } finally {
      old match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
