package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY.md §2.D similarity-search rows).
  *
  * Two flavors:
  *  - `dotExact`: oracle-grade — per-element products in double, summed
  *    exactly as DECIMAL(38,18). Summation-order independent, so Spark
  *    and DuckDB produce bit-identical doubles.
  *  - `graft.plans.VectorExpressions.vecDot`: codegen'd native expression
  *    (sequential double accumulation) for the hot path.
  */
object VectorFunctions {

  /** Exact decimal dot product of two float-array columns, as double.
    * The lambda re-casts the accumulator so its decimal type stays stable
    * through Catalyst's type coercion.
    */
  def dotExact(a: String, b: String): Column = expr(
    s"""CAST(aggregate(
          zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          CAST(0 AS DECIMAL(38,18)),
          (acc, p) -> CAST(acc + CAST(p AS DECIMAL(38,18)) AS DECIMAL(38,18)))
        AS DOUBLE)""")

  /** Exact squared L2 distance, decimal-summed, as double. */
  def l2SqExact(a: String, b: String): Column = expr(
    s"""CAST(aggregate(
          zip_with($a, $b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                     * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          CAST(0 AS DECIMAL(38,18)),
          (acc, p) -> CAST(acc + CAST(p AS DECIMAL(38,18)) AS DECIMAL(38,18)))
        AS DOUBLE)""")

  /** Exact squared L2 distance kept as DECIMAL(38,18) — for pipelines
    * (PQ codes, ADC sums) where the distance feeds further exact
    * arithmetic and must never round through double.
    */
  def l2SqDecimal(a: String, b: String): Column = expr(
    s"""aggregate(
          zip_with($a, $b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                     * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          CAST(0 AS DECIMAL(38,18)),
          (acc, p) -> CAST(acc + CAST(p AS DECIMAL(38,18)) AS DECIMAL(38,18)))""")

  /** cosine(a, b) from exact dots. */
  def cosineExact(a: String, b: String): Column =
    dotExact(a, b) / (sqrt(dotExact(a, a)) * sqrt(dotExact(b, b)))
}
