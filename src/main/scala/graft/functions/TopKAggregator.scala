package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One counter of a SpaceSaving summary: estimated count `c` (an
  * OVERestimate: true ≤ c) and error allowance `e` (c − e ≤ true —
  * together they bracket the true frequency).
  */
final case class SSEntry(k: String, c: Long, e: Long)

/** Buffer for [[TopKAggregator]]: at most `capacity` counters. A case
  * class of a product Seq so `Encoders.product` gives a columnar
  * buffer encoding (the UniqUpToAggregator discipline).
  */
final case class TopKBuf(entries: Seq[SSEntry])

/** ClickHouse `topK(N)` analog — the SpaceSaving heavy-hitters sketch
  * (Metwally et al. 2005), completing the sketch-family trio after HLL
  * (distinct counts, q77/q79) and count-min (point frequencies, q81):
  * the TOP keys of a stream with O(capacity) state per group,
  * regardless of key cardinality. At 100 TB this is "what are the top
  * domains / users / tokens" without a full groupBy over billions of
  * distinct keys: each partition's state is a fixed few KB, the shuffle
  * moves summaries, never keys.
  *
  * Mechanics (single stream): a hit increments its counter; a miss
  * inserts at count 1 while the summary has room, else EVICTS the
  * minimum counter m and inherits its count (new key enters at
  * c = m.c + 1, e = m.c — the possible phantom mass). Merge (Agarwal
  * et al. 2012, mergeable summaries): keys absent from one side are
  * charged that side's minimum count εX (its maximum possible hidden
  * mass, 0 while the side is under capacity), counts and errors add,
  * and the merged summary keeps the top `capacity` counters.
  *
  * Determinism contract: the summary's exact CONTENT depends on
  * stream and merge order (unavoidable for any order-sensitive
  * sketch), so — the q77/q81 audit discipline — queries surface only
  * the three ORDER-INDEPENDENT theorems: (1) any key with true count
  * > N/capacity is PRESENT in the summary, (2) every counter
  * overestimates (c ≥ true), (3) the bracket holds (c − e ≤ true).
  * q92 asserts all three against exact counts on keys chosen FROM the
  * exact side, which is what makes the rows hash-checkable.
  */
final class TopKAggregator(capacity: Int)
    extends Aggregator[String, TopKBuf, Seq[SSEntry]] {
  require(capacity >= 1, s"topK capacity must be >= 1, got $capacity")

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, x: String): TopKBuf = {
    val i = b.entries.indexWhere(_.k == x)
    if (i >= 0) {
      val hit = b.entries(i)
      TopKBuf(b.entries.updated(i, hit.copy(c = hit.c + 1)))
    } else if (b.entries.length < capacity) {
      TopKBuf(b.entries :+ SSEntry(x, 1L, 0L))
    } else {
      // evict the minimum counter; the newcomer inherits its count as
      // possible phantom mass (the SpaceSaving invariant keeper)
      var minAt = 0
      var j = 1
      while (j < b.entries.length) {
        if (b.entries(j).c < b.entries(minAt).c) minAt = j
        j += 1
      }
      val m = b.entries(minAt)
      TopKBuf(b.entries.updated(minAt, SSEntry(x, m.c + 1, m.c)))
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    if (a.entries.isEmpty) return b
    if (b.entries.isEmpty) return a
    // a side at capacity may hide up to its min count of any absent key
    val epsA = if (a.entries.length >= capacity) a.entries.map(_.c).min else 0L
    val epsB = if (b.entries.length >= capacity) b.entries.map(_.c).min else 0L
    val bm = b.entries.map(e => e.k -> e).toMap
    val merged = scala.collection.mutable.ArrayBuffer[SSEntry]()
    a.entries.foreach { ea =>
      bm.get(ea.k) match {
        case Some(eb) => merged += SSEntry(ea.k, ea.c + eb.c, ea.e + eb.e)
        case None => merged += SSEntry(ea.k, ea.c + epsB, ea.e + epsB)
      }
    }
    val inA = a.entries.map(_.k).toSet
    b.entries.foreach { eb =>
      if (!inA.contains(eb.k))
        merged += SSEntry(eb.k, eb.c + epsA, eb.e + epsA)
    }
    // keep the top `capacity` by (count desc, key) — a deterministic
    // total order so equal-count evictions cannot depend on buffer
    // layout
    TopKBuf(merged.sortBy(e => (-e.c, e.k)).take(capacity).toVector)
  }

  override def finish(b: TopKBuf): Seq[SSEntry] =
    b.entries.sortBy(e => (-e.c, e.k))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[SSEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SSEntry]]()
}
