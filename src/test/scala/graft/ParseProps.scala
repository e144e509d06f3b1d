package graft

import graft.sources.HnapParse
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks (SURVEY.md §5.4): parse totality on arbitrary
  * inputs, uptime composition round-trip, channel format→parse round-trip.
  * Run by sbt's native ScalaCheck framework.
  */
object ParseProps extends Properties("HnapParse") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(25)

  private def uptimeOf(s: String): Long =
    Seq(s).toDF("s").select(HnapParse.uptimeSeconds($"s")).as[Long].head()

  property("uptime parse is total and non-negative on arbitrary strings") =
    forAll(Gen.asciiPrintableStr) { s =>
      uptimeOf(s) >= 0L
    }

  property("uptime composition: components round-trip") =
    forAll(Gen.choose(0L, 500L), Gen.choose(0, 23), Gen.choose(0, 59),
      Gen.choose(0, 59)) { (d, h, m, sec) =>
      val str = f"$d days $h%02dh:$m%02dm:$sec%02ds"
      uptimeOf(str) == d * 86400L + h * 3600L + m * 60L + sec
    }

  private val fieldGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.choose(-1e6, 1e6).map(_.toString),
    Gen.const(""), Gen.const(" "))

  property("downstream parse is total on arbitrary ^/|+| blobs") =
    forAll(Gen.listOfN(12, fieldGen)) { fields =>
      val blob = fields.mkString("^") + "|+|" + fields.take(4).mkString("^")
      val n = Seq(blob).toDF("b")
        .select(size(HnapParse.downstreamChannels($"b"))).as[Int].head()
      n >= 0 && n <= 2 // short second record is dropped, never crashes
    }

  property("channel format → parse round-trip (float32 exact)") =
    forAll(Gen.choose(0, 255), Gen.choose(1, 999),
      Gen.choose(-500, 500), Gen.choose(200, 500),
      Gen.choose(-1000000L, 1000000L), Gen.choose(-1000000L, 1000000L)) {
      (id, freqMhz, powerTenths, snrTenths, corr, uncorr) =>
        val power = powerTenths / 10.0
        val snr = snrTenths / 10.0
        val blob = s"$id^Locked^QAM256^$id^$freqMhz.0^$power^$snr^$corr^$uncorr^"
        val got = Seq(blob).toDF("b")
          .select(explode(HnapParse.downstreamChannels($"b")).as("ch"))
          .select("ch.*")
          .as[(Int, Float, String, Float, Float, Long, Long)].head()
        got == ((id, (freqMhz * 1e6).toFloat, "QAM256",
          power.toFloat, snr.toFloat, corr, uncorr))
    }

  property("simhash32 stays in [0, 2^32)") =
    forAll(Gen.listOf(Gen.alphaStr.suchThat(_.nonEmpty)).map(_.take(20))) { words =>
      val v = Seq(words.mkString(" ")).toDF("text")
        .withColumn("toks", graft.functions.TextFunctions.tokens($"text"))
        .select(graft.functions.TextFunctions.simhash32("toks")).as[Long].head()
      v >= 0L && v < (1L << 32)
    }
}
