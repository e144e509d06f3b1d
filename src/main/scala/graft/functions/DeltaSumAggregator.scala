package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One maximal sorted segment of a key's counter timeline, as seen by a
  * single partial buffer: boundary samples (first/last ts, event id,
  * value), the exact micro-unit delta sum WITHIN the segment, and the
  * pair counts the window formulation surfaces. Fixed-size per segment.
  */
final case class DeltaSumRun(ft: Long, fe: Long, fv: Double,
    lt: Long, le: Long, lv: Double, sumU: Long, nIncr: Long, n: Long)

/** Buffer for [[DeltaSumAggregator]]: segments sorted by first key. */
final case class DeltaSumBuf(runs: Seq[DeltaSumRun])

final case class DeltaSumIn(tsMicros: Long, eventId: Long, value: Double)

final case class DeltaSumOut(sum_increase: Double, n_increases: Long,
    n_events: Long)

/** ClickHouse `deltaSumTimestamp` analog (SURVEY §2.D "UDF surface"):
  * the counter-rate Σ of non-negative consecutive deltas as a PARTIAL-
  * AGGREGABLE aggregate instead of q18's per-read lag window. The
  * window formulation shuffles EVERY row to sort each key's full
  * timeline; this aggregator reduces each scan partition's rows
  * map-side into O(1)-sized sorted segments — (first, last, inner sum)
  * per contiguous run — and merges segments by their timestamp
  * boundaries, so the shuffle carries O(keys × partitions-touched)
  * segment summaries, never the rows. On a ts-clustered 100 TB fact
  * table (this engine's layout: parts sorted and date-partitioned by
  * time) that is the difference between re-sorting the corpus per
  * dashboard read and a map-combined aggregate.
  *
  * Exactness contract (ClickHouse documents the same one): the answer
  * equals the window formulation whenever each partial's rows arrive
  * time-sorted and different partials cover non-interleaving time
  * ranges — exactly what a sorted scan of time-clustered storage (or a
  * `repartitionByRange(ts).sortWithinPartitions(ts)` pre-shape)
  * delivers. `finish` sorts ALL segments by first key before folding
  * boundary deltas, so the output is invariant under partition/merge
  * ORDER (OperatorSpec replays permuted merge trees); rows arriving
  * out of order WITHIN a partial degrade to extra segments whose fold
  * follows segment-start order — the deterministic stored-order answer
  * ClickHouse documents for the same case, never silent corruption.
  *
  * Delta arithmetic mirrors q18 bit-for-bit: the raw double delta is
  * sign-tested first (negative → overflow → ignored, like the
  * reference's signed-counter guard, tables.sql:19), then quantized to
  * DECIMAL(18,6) micro-units with HALF_UP — the same rounding Spark's
  * double→decimal cast applies — and summed as exact longs.
  */
final class DeltaSumAggregator
    extends Aggregator[DeltaSumIn, DeltaSumBuf, DeltaSumOut] {

  private def quantU(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def keyLt(t1: Long, e1: Long, t2: Long, e2: Long): Boolean =
    t1 < t2 || (t1 == t2 && e1 < e2)

  override def zero: DeltaSumBuf = DeltaSumBuf(Vector.empty)

  override def reduce(b: DeltaSumBuf, x: DeltaSumIn): DeltaSumBuf = {
    val runs = b.runs
    // runs stay sorted by first key, so runs.last is the latest segment;
    // a row past its end extends it (the sorted-scan fast path)
    if (runs.nonEmpty && keyLt(runs.last.lt, runs.last.le,
        x.tsMicros, x.eventId)) {
      val r = runs.last
      val d = x.value - r.lv
      val (addU, addI) =
        if (d < 0.0) (0L, 0L)
        else if (d.isNaN) (0L, 1L)
        else (quantU(d), 1L)
      DeltaSumBuf(runs.init :+ r.copy(lt = x.tsMicros, le = x.eventId,
        lv = x.value, sumU = r.sumU + addU, nIncr = r.nIncr + addI,
        n = r.n + 1))
    } else {
      val s = DeltaSumRun(x.tsMicros, x.eventId, x.value,
        x.tsMicros, x.eventId, x.value, 0L, 0L, 1L)
      // insert keeping runs sorted by first key
      val at = runs.indexWhere(r => keyLt(x.tsMicros, x.eventId, r.ft, r.fe))
      if (at < 0) DeltaSumBuf(runs :+ s)
      else DeltaSumBuf((runs.take(at) :+ s) ++ runs.drop(at))
    }
  }

  /** Concatenate-and-sort only: coalescing two segments here would bake
    * in a boundary delta that a LATER merge could interpose a row into.
    * Segment count stays bounded by the number of partials that touched
    * the key (clustered input), so the buffer never grows with rows.
    */
  override def merge(a: DeltaSumBuf, b: DeltaSumBuf): DeltaSumBuf =
    if (a.runs.isEmpty) b
    else if (b.runs.isEmpty) a
    else DeltaSumBuf((a.runs ++ b.runs).sortBy(r => (r.ft, r.fe)))

  override def finish(b: DeltaSumBuf): DeltaSumOut = {
    val sorted = b.runs.sortBy(r => (r.ft, r.fe))
    var sumU = 0L; var nIncr = 0L; var n = 0L
    var prev: DeltaSumRun = null
    sorted.foreach { r =>
      sumU += r.sumU; nIncr += r.nIncr; n += r.n
      if (prev != null) {
        val d = r.fv - prev.lv
        if (!(d < 0.0)) { nIncr += 1; if (!d.isNaN) sumU += quantU(d) }
      }
      prev = r
    }
    DeltaSumOut(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(sumU), 6)
        .doubleValue(),
      nIncr, n)
  }

  override def bufferEncoder: Encoder[DeltaSumBuf] =
    Encoders.product[DeltaSumBuf]
  override def outputEncoder: Encoder[DeltaSumOut] =
    Encoders.product[DeltaSumOut]
}
