package graft

import graft.streaming.IngestMetricsListener
import org.scalatest.funsuite.AnyFunSuite

/** The StreamingQueryListener ops view: per-batch rows and durations are
  * captured for a named query and reflect the data that flowed.
  */
class IngestMetricsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("listener captures per-batch input rows and durations") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val listener = new IngestMetricsListener
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Long]
      val q = mem.toDF().toDF("v")
        .writeStream.format("memory").queryName("metrics_probe")
        .outputMode("append").start()
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L)
      q.processAllAvailable()
      q.stop()
      // listener events are async — wait for delivery
      val deadline = System.currentTimeMillis() + 30000
      def mine = listener.batches.filter(b =>
        b.queryName == "metrics_probe" && b.inputRows > 0)
      while (mine.map(_.inputRows).sum < 4 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(mine.map(_.inputRows).sum == 4,
        s"expected 4 rows across batches, got ${listener.batches}")
      assert(mine.forall(_.batchDurationMs >= 0))
    } finally spark.streams.removeListener(listener)
  }

  test("observe() metrics ride the streaming plan (no extra pass)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val observed = graft.streaming.EventsStream.withQualityMetrics(
      mem.toDF().toDF("event_id", "value", "props"))
    val q = observed.writeStream.format("memory").queryName("observe_probe")
      .outputMode("append").start()
    try {
      mem.addData((1L, 2.0, "{}"), (2L, 3.0, null), (3L, 5.0, "{}"))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("ingest_quality")
      assert(m != null, "observed metrics missing from progress")
      assert(m.getAs[Long]("rows") == 3)
      assert(m.getAs[Long]("null_props") == 1)
      assert(m.getAs[Double]("sum_value") == 10.0)
    } finally q.stop()
  }
}
