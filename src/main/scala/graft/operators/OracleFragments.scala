package graft.operators

/** Shared DuckDB-oracle SQL fragments for the decimal-exact vector math
  * used across the similarity (s0x) and embedding-dedup (d06) oracles.
  *
  * The contract mirrors `graft.functions.VectorFunctions`: every float
  * product is computed in DOUBLE, accumulated as DECIMAL(38,18) so the
  * sum is independent of row order (parallel aggregation reorders
  * partial sums; double addition is not associative), then surfaced back
  * as DOUBLE. Keeping the text in ONE place guarantees all oracles state
  * the same exactness contract.
  */
private[operators] object OracleFragments {

  /** Decimal-exact SUM(x*y) over unnested vector components → DOUBLE. */
  def oDot(x: String, y: String): String =
    s"CAST(SUM(CAST(CAST($x AS DOUBLE) * CAST($y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)"

  /** The three cosine ingredients with the conventional aliases:
    * dot product, left self-norm `na`, right self-norm (default `nq`).
    */
  def oCosineSums(normB: String = "nq"): String =
    s"""${oDot("x", "y")} AS dot,
                        ${oDot("x", "x")} AS na,
                        ${oDot("y", "y")} AS $normB"""

  /** Decimal-exact SUM((x-y)^2), kept as DECIMAL for callers that rank
    * on the unrounded value (PQ code assignment / ADC).
    */
  def oL2SqDec(x: String, y: String): String =
    s"""SUM(CAST((CAST($x AS DOUBLE) - CAST($y AS DOUBLE))
                          * (CAST($x AS DOUBLE) - CAST($y AS DOUBLE))
                     AS DECIMAL(38,18)))"""

  /** Decimal-exact squared L2 distance surfaced as DOUBLE. */
  def oL2Sq(x: String, y: String): String =
    s"CAST(${oL2SqDec(x, y)} AS DOUBLE)"

  /** DuckDB analog of Spark's `CAST(conv(substring(h, 1, n), 16, 10) AS
    * BIGINT)`: the first `nibbles` hex digits of `hexExpr` as an integer.
    * DuckDB has no base-conversion function, so the fragment positionally
    * accumulates nibble·16^k — every term is an exact power-of-two-scaled
    * integer in DOUBLE and the sum stays < 2^53, so the value is
    * bit-identical to Spark's. Shared by the q81/q82 hash-derived
    * bucket/uniform constructions.
    */
  def oHexInt(hexExpr: String, nibbles: Int): String =
    s"""CAST(list_sum(list_transform(range(1, ${nibbles + 1}),
           i -> (strpos('0123456789abcdef', substr($hexExpr, i, 1)) - 1)
                * 16**($nibbles - i))) AS BIGINT)"""
}
