package graft

import graft.sources.MediaPipeline
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the perceptual-fingerprint invariances the
  * m-series near-dup queries rest on, through the REAL decoders (ImageIO
  * GIF round-trip), not the closed forms: the oracle proves the closed
  * form matches; these prove the DECODER obeys the algebra for arbitrary
  * inputs, which is what makes the closed form legitimate.
  */
object MediaProps extends Properties("Media") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(20)

  // channels ≤ 199 so any delta ≤ 39 can never clamp (m17's contract)
  private val genColors: Gen[List[Int]] =
    Gen.chooseNum(3, 8).flatMap(n =>
      Gen.listOfN(n, for {
        r <- Gen.chooseNum(0, 199); g <- Gen.chooseNum(0, 199)
        b <- Gen.chooseNum(0, 199)
      } yield (r << 16) | (g << 8) | b))

  private def lumas(id: Long, colors: Seq[Int]): Seq[Long] =
    MediaPipeline.sampleFrames(id,
        MediaPipeline.renderGifFrames(24, 16, colors), stride = 1)
      .sortBy(_.frame_idx).map(_.luma_x1000)

  property("m17 invariance: +delta on every channel shifts every frame's luma by exactly 1000*delta") =
    forAll(genColors, Gen.chooseNum(1, 39)) { (colors, delta) =>
      def shift(c: Int) =
        (((c >> 16) & 0xff) + delta << 16) |
          (((c >> 8) & 0xff) + delta << 8) | ((c & 0xff) + delta)
      val base = lumas(1L, colors)
      val brighter = lumas(2L, colors.map(shift))
      base.length == colors.length &&
        brighter.zip(base).forall { case (y, x) => y - x == 1000L * delta }
    }

  property("m17 fingerprint: the temporal-diff sequence is delta-invariant and frame-count-preserving") =
    forAll(genColors, Gen.chooseNum(1, 39)) { (colors, delta) =>
      def shift(c: Int) =
        (((c >> 16) & 0xff) + delta << 16) |
          (((c >> 8) & 0xff) + delta << 8) | ((c & 0xff) + delta)
      def diffs(ls: Seq[Long]) = ls.sliding(2).map(p => p(1) - p(0)).toList
      diffs(lumas(1L, colors)) == diffs(lumas(2L, colors.map(shift)))
    }

  property("solid-frame decode is exact: luma_x1000 == Rec.601 of the rendered color") =
    forAll(genColors) { colors =>
      lumas(7L, colors) == colors.map(c =>
        299L * ((c >> 16) & 0xff) + 587L * ((c >> 8) & 0xff) +
          114L * (c & 0xff))
    }
}
