package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[UniqUpToAggregator]]: the distinct values seen so far,
  * kept sorted and capped — a case class so `Encoders.product` gives the
  * Aggregator a columnar (non-kryo) buffer encoding.
  */
final case class UniqUpToBuf(vals: Seq[Long])

/** ClickHouse `uniqUpTo(N)` analog (SURVEY §2.D "UDF surface":
  * Aggregator): EXACT distinct count while NDV ≤ N, saturating at N+1 —
  * the answer to "how many distinct values, and is it more than N?"
  * with O(N) state per group instead of O(NDV). That bound is the whole
  * point of the operator at 100 TB: a "does this key have more than 4
  * variants" gate over billions of groups must not hold a hash set the
  * size of the group's value universe; this buffer can never exceed
  * N+1 elements no matter how much data flows through (the OperatorSpec
  * bounded-state test pushes 10k distinct values through one buffer).
  *
  * Determinism: the OUTPUT is invariant under any partitioning or
  * merge order, because it only exposes min(NDV, N+1) — below the cap
  * every partial retains every value it saw (exact), and a buffer can
  * only reach N+1 elements by witnessing N+1 distinct values, so a
  * saturated length always means true NDV > N. The buffer itself is
  * kept sorted (merge truncates to the smallest N+1) so membership
  * tests are a binary search, not a linear scan — at cap=1000 over a
  * wide fact table that is the difference between O(log N) and O(N)
  * per input row. Spark plans this via ObjectHashAggregate with
  * partial merge — the same two-phase shape as the built-in aggregates.
  */
final class UniqUpToAggregator(n: Int)
    extends Aggregator[Long, UniqUpToBuf, Long] {
  require(n >= 1, s"uniqUpTo cap must be >= 1, got $n")
  private val cap = n + 1

  override def zero: UniqUpToBuf = UniqUpToBuf(Vector.empty)

  override def reduce(b: UniqUpToBuf, x: Long): UniqUpToBuf =
    if (b.vals.length >= cap) b
    else {
      // vals is sorted: binary-search the insertion point instead of a
      // linear contains + full re-sort (O(log n) vs O(n log n) per row)
      val i = search(b.vals, x)
      if (i >= 0) b
      else {
        val at = -i - 1
        UniqUpToBuf((b.vals.take(at) :+ x) ++ b.vals.drop(at))
      }
    }

  /** Binary search over a sorted Seq[Long]: index if found, else
    * -(insertionPoint)-1 (the java.util.Arrays convention). */
  private def search(vs: Seq[Long], x: Long): Int = {
    var lo = 0; var hi = vs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = vs(mid)
      if (v < x) lo = mid + 1
      else if (v > x) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  override def merge(a: UniqUpToBuf, b: UniqUpToBuf): UniqUpToBuf =
    UniqUpToBuf((a.vals ++ b.vals).distinct.sorted.take(cap))

  override def finish(b: UniqUpToBuf): Long = b.vals.length.toLong

  override def bufferEncoder: Encoder[UniqUpToBuf] =
    Encoders.product[UniqUpToBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
