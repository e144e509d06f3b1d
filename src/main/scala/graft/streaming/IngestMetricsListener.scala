package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Ops metrics for the ingest pipeline (SURVEY.md §2.A scrape-latency
  * row): the reference measures per-scrape latency with perf_counter and
  * stores it in-band (mb8600.py:331,362); Spark's equivalent for the
  * pipeline itself is a StreamingQueryListener. This one captures, per
  * micro-batch: input rows, processing duration, and input/processed
  * rates — the numbers a dashboard needs to alert on scrape stalls or
  * sink backpressure. In-band scrape_latency stays a data column (set by
  * the DSv2 source); this covers the query-level view.
  */
class IngestMetricsListener extends StreamingQueryListener {

  final case class BatchMetrics(queryName: String, batchId: Long,
      inputRows: Long, batchDurationMs: Long, inputRowsPerSec: Double,
      processedRowsPerSec: Double)

  private val buf = new ConcurrentLinkedQueue[BatchMetrics]()

  def batches: Seq[BatchMetrics] = {
    val it = buf.iterator()
    val out = Seq.newBuilder[BatchMetrics]
    while (it.hasNext) out += it.next()
    out.result()
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    buf.add(BatchMetrics(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      duration, p.inputRowsPerSecond, p.processedRowsPerSecond))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
