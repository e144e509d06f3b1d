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
  * Determinism: the buffer keeps the SMALLEST N+1 distinct values
  * (sorted merge + truncate), so partial states are identical under any
  * partitioning/merge order — not that it matters for the output, which
  * only exposes min(NDV, N+1): once any N+1 distinct values are
  * witnessed the true NDV is ≥ N+1, so truncation never changes the
  * answer, and below the cap every value is retained so the count is
  * exact. Spark plans this via ObjectHashAggregate with partial merge —
  * the same two-phase shape as the built-in aggregates.
  */
final class UniqUpToAggregator(n: Int)
    extends Aggregator[Long, UniqUpToBuf, Long] {
  require(n >= 1, s"uniqUpTo cap must be >= 1, got $n")
  private val cap = n + 1

  override def zero: UniqUpToBuf = UniqUpToBuf(Vector.empty)

  override def reduce(b: UniqUpToBuf, x: Long): UniqUpToBuf =
    if (b.vals.length >= cap || b.vals.contains(x)) b
    else UniqUpToBuf((b.vals :+ x).sorted)

  override def merge(a: UniqUpToBuf, b: UniqUpToBuf): UniqUpToBuf =
    UniqUpToBuf((a.vals ++ b.vals).distinct.sorted.take(cap))

  override def finish(b: UniqUpToBuf): Long = b.vals.length.toLong

  override def bufferEncoder: Encoder[UniqUpToBuf] =
    Encoders.product[UniqUpToBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
