package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.D "UDF surface": Aggregator):
  * exact weighted mean — numerator/denominator accumulated as decimals
  * (scale 6 / scale 2, HALF_UP, mirroring Spark's double→decimal cast),
  * so the result is summation-order independent and reproducible in the
  * oracle as SUM(CAST(v*w AS DECIMAL(18,6))) / SUM(CAST(w AS DECIMAL(18,2))).
  */
object WeightedAvgAggregator
    extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  private def d2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  /** in = (value, weight) */
  override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)):
      (BigDecimal, BigDecimal) =
    (b._1 + d6(in._1 * in._2), b._2 + d2(in._2))

  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)):
      (BigDecimal, BigDecimal) = (x._1 + y._1, x._2 + y._2)

  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._2.signum == 0) Double.NaN
    else b._1.toDouble / b._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
