package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the text/vector primitives under the dedup,
  * similarity, and text-analysis queries: totality, structural laws, and
  * the exactness guarantees (decimal sums are order-independent, so
  * algebraic identities hold EXACTLY, not within epsilon).
  */
object TextVectorProps extends Properties("TextVector") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  // ------------------------------------------------------------ text laws

  property("shingle count is max(0, n_tokens - 2) on arbitrary text") =
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))) { ws =>
      val text = ws.mkString(" ")
      val (nToks, nSh) = Seq(text).toDF("text")
        .withColumn("toks", TextFunctions.tokens($"text"))
        .select(size($"toks"), size(TextFunctions.shingles("toks")))
        .as[(Int, Int)].head()
      nSh == math.max(0, nToks - 2)
    }

  property("fingerprint is invariant under whitespace layout") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty))) { ws =>
      val canonical = ws.mkString(" ")
      val messy = "  " + ws.mkString("   ") + " "
      val fps = Seq(canonical, messy).toDF("text")
        .select(TextFunctions.fingerprint($"text")).as[String].collect()
      fps(0) == fps(1)
    }

  property("simhash32 stays within unsigned 32-bit range") =
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(6)))) { ws =>
      val sh = Seq(ws.mkString(" ")).toDF("text")
        .withColumn("toks", TextFunctions.tokens($"text"))
        .select(TextFunctions.simhash32("toks")).as[Long].head()
      sh >= 0L && sh < (1L << 32)
    }

  // ---------------------------------------------------------- vector laws

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-100.0, 100.0).map(_.toFloat))

  private def twoVec(a: List[Float], b: List[Float]) =
    Seq((a, b)).toDF("a", "b")

  property("dotExact is symmetric — exactly (decimal sums commute)") =
    forAll(vecGen, vecGen) { (a, b) =>
      val (ab, ba) = twoVec(a, b)
        .select(VectorFunctions.dotExact("a", "b"),
          VectorFunctions.dotExact("b", "a")).as[(Double, Double)].head()
      ab == ba
    }

  property("l2SqExact(v, v) is exactly zero") =
    forAll(vecGen) { v =>
      twoVec(v, v).select(VectorFunctions.l2SqExact("a", "b"))
        .as[Double].head() == 0.0
    }

  property("l2Sq law: |a-b|^2 = a.a + b.b - 2 a.b within product rounding") =
    forAll(vecGen, vecGen) { (a, b) =>
      // each per-element double product is exact in decimal, and
      // (x-y)^2 in double equals x^2+y^2-2xy only approximately — so
      // compare within the double-product rounding bound, not exactly
      val (l2, aa, bb, ab) = twoVec(a, b).select(
        VectorFunctions.l2SqExact("a", "b"), VectorFunctions.dotExact("a", "a"),
        VectorFunctions.dotExact("b", "b"), VectorFunctions.dotExact("a", "b"))
        .as[(Double, Double, Double, Double)].head()
      math.abs(l2 - (aa + bb - 2 * ab)) <= 1e-6 * math.max(1.0, math.abs(l2))
    }

  property("cosineExact of a vector with a positive scaling of itself is 1") =
    forAll(vecGen.suchThat(v => v.exists(_ != 0.0f)),
      Gen.choose(1, 4)) { (v, k) =>
      val scaled = v.map(x => x * (1 << k).toFloat) // power-of-two: exact in float
      val c = twoVec(v, scaled)
        .select(round(VectorFunctions.cosineExact("a", "b"), 9))
        .as[Double].head()
      c == 1.0
    }
}
