package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: the RangeBucketJoin rewrite produces exactly the rows the
  * naive in-memory band-join definition produces, over arbitrary points,
  * intervals (including inverted and empty), and bucket widths.
  */
object RangeBucketJoinProps extends Properties("RangeBucketJoin") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  // negative values exercise truncating (not floor) integer division in
  // the bucket expression — safe because trunc-div is monotonic, which
  // is the only property the rewrite needs
  private val pointGen = Gen.choose(-100L, 400L)
  private val intervalGen = for {
    lo <- Gen.choose(-50L, 400L)
    len <- Gen.choose(-30L, 120L) // negative → inverted interval
  } yield (lo, lo + len)

  property("bucketized rewrite == naive band join for any width") =
    forAll(Gen.listOfN(40, pointGen), Gen.listOfN(8, intervalGen),
      Gen.oneOf(1L, 7L, 60L, 1000L)) { (ps, ivs, width) =>
      val wKey = "spark.graft.rangeJoin.bucketSeconds"
      val oldW = spark.conf.getOption(wKey)
      spark.conf.set(wKey, width.toString)
      try {
        val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("pid", "p")
        val intervals = ivs.zipWithIndex.map { case ((lo, hi), i) =>
          (i.toLong, lo, hi)
        }.toDF("iid", "lo", "hi")
        val got = points
          .join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
          .select($"pid", $"iid").as[(Long, Long)].collect().toSet
        val expect = (for {
          (p, pi) <- ps.zipWithIndex
          ((lo, hi), ii) <- ivs.zipWithIndex
          if p >= lo && p <= hi
        } yield (pi.toLong, ii.toLong)).toSet
        got == expect
      } finally oldW match {
        case Some(v) => spark.conf.set(wKey, v)
        case None => spark.conf.unset(wKey)
      }
    }
}
