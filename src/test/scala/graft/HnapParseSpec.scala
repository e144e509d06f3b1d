package graft

import graft.sources.{DocsisFixtures, HnapParse}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HnapParseSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  lazy val parsed = HnapParse.parse(DocsisFixtures.rawFrame(spark)).cache()

  test("non-OK responses are filtered (mb8600.py:354)") {
    assert(parsed.count() == 4) // 5 fixtures, 1 UN-AUTH
  }

  test("downstream parse: FIXTURES.md golden values") {
    val chs = parsed
      .filter($"timestamp" === to_timestamp(lit("2024-03-01 00:00:00")))
      .select(explode($"downstream_channels").as("ch"))
      .select("ch.*").orderBy($"channel_id")
      .as[(Int, Float, String, Float, Float, Long, Long)].collect()
    assert(chs(0) == ((5, 483000000.0f, "QAM256", 3.4f, 43.1f, 12L, 0L)))
    // OFDM PLC snr 16.0 < 20 → ×2.5 = 40.0
    assert(chs(2) == ((33, 722000000.0f, "OFDM PLC", 2.9f, 40.0f, 524L, 3L)))
    // negative wrapped counter preserved signed (tables.sql:19)
    assert(chs(1)._7 == -42L)
  }

  test("OFDM PLC at exactly 20.0 dB is NOT corrected (strict <)") {
    val snrs = parsed
      .filter($"timestamp" === to_timestamp(lit("2024-03-01 00:00:10")))
      .select(explode($"downstream_channels").as("ch"))
      .select($"ch.snr").as[Float].collect().sorted
    assert(snrs.toSeq == Seq(20.0f, 36.2f))
  }

  test("upstream parse: kHz→Hz width, MHz→Hz frequency") {
    val chs = parsed
      .filter($"timestamp" === to_timestamp(lit("2024-03-01 00:00:00")))
      .select(explode($"upstream_channels").as("ch"))
      .select("ch.*").orderBy($"channel_id")
      .as[(Int, Float, String, Float, Float)].collect()
    assert(chs(0) == ((1, 35600000.0f, "SC-QAM", 46.5f, 6400000.0f)))
    assert(chs(1) == ((9, 29200000.0f, "OFDMA", 41.0f, 96000000.0f)))
  }

  test("uptime: all segments optional, missing → 0 (not the reference crash)") {
    val cases = Seq(
      "7 days 03h:42m:05s" -> 618125L,
      "03h:42m:05s" -> 13325L,
      "45s" -> 45L,
      "1 days " -> 86400L,
      "" -> 0L,
      "garbage" -> 0L,
      "4294967 days" -> 4294967L * 86400) // > UInt32 seconds still fine in Long
    val got = cases.map(_._1).toDF("s")
      .select(HnapParse.uptimeSeconds($"s")).as[Long].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("trailing separators / short records are dropped, not crashed") {
    val df = Seq("1^Locked^QAM256^5^483.0^3.4^43.1^12^0^|+|junk^only")
      .toDF("blob")
      .select(HnapParse.downstreamChannels($"blob").as("chs"))
    assert(df.select(size($"chs")).as[Int].head() == 1)
  }

  test("whole pipeline stays UDF-free (codegen-able plan)") {
    val plan = parsed.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("fact-table write: day partitions, readable back") {
    val out = java.nio.file.Files.createTempDirectory("docsis_fact").toString
    HnapParse.writeFactTable(parsed, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    assert(back.select($"date").distinct().count() == 2) // 03-01, 03-02
    // partition pruning: filtering one day reads one partition
    val pruned = back.filter($"date" === "2024-03-02")
    assert(pruned.count() == 1)
  }
}
