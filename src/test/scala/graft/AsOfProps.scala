package graft

import java.sql.Timestamp
import graft.operators.AsOf
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: the single-shuffle union+window as-of join agrees with the
  * naive per-row definition (greatest right ts <= left ts within key) on
  * arbitrary inputs.
  */
object AsOfProps extends Properties("AsOf") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val base = 1700000000000L
  private val rowGen = for {
    key <- Gen.choose(1L, 4L)
    off <- Gen.choose(0L, 50L)
  } yield (key, base + off * 1000L)

  property("matches the naive greatest-prior definition") =
    forAll(Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen)) { (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t), i.toLong) }
        .toDF("user_id", "ts", "event_id")
      val right = r.map { case (k, t) => (k, new Timestamp(t)) }
        .toDF("user_id", "ts")
      val got = AsOf.asOfTimestamp(left, right, "user_id", "ts", "ts", "m")
        .select($"event_id", $"m").as[(Long, Option[Timestamp])]
        .collect().toMap
      l.zipWithIndex.forall { case ((k, t), i) =>
        val expect = r.filter { case (rk, rt) => rk == k && rt <= t }
          .map(_._2).maxOption
        got(i.toLong).map(_.getTime) == expect
      }
    }
}
