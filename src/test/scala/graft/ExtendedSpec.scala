package graft

import graft.sources.{DocsisFixtures, HnapParse}
import graft.streaming.RebootDetector
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("approx NDV within-tolerance verdict holds at sf0.001") {
    val rows = SparkEntry.queries("q27_approx_ndv")(spark, sfDir)
      .select($"exact_orders", $"approx_within_5pct").as[(Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, ok) =>
      assert(ok, s"HLL++ estimate strayed >5% from exact=$exact")
    }
  }

  test("approx percentiles honor the rank-tolerance bound at sf0.001") {
    val rows = SparkEntry.queries("q53_approx_percentiles")(spark, sfDir)
      .select($"exact50", $"ap50_in_rank_tol", $"ap99_in_rank_tol")
      .as[(Double, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact50, ok50, ok99) =>
      assert(ok50, s"approx p50 outside exact [p49, p51] around $exact50")
      assert(ok99, "approx p99 outside exact [p98, max]")
    }
  }

  test("weighted-avg Aggregator is partition-count independent") {
    val one = Tables.load(spark, sfDir, "lineitem").coalesce(1)
    val many = Tables.load(spark, sfDir, "lineitem").repartition(13)
    val wavg = udaf(graft.functions.WeightedAvgAggregator)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(wavg($"l_extendedprice", $"l_quantity")).as[Double].head()
    assert(run(one) == run(many)) // bit-identical, not just close
  }

  test("reboot detector: uptime drop emits exactly one event per reset") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val parsed = mem.toDF().toDF("modem_name", "ts", "modem_uptime")
      .withColumn("timestamp", to_timestamp($"ts")).drop("ts")
    val out = RebootDetector(parsed)
    val q = out.writeStream.format("memory").queryName("reboots")
      .outputMode("append").start()
    try {
      mem.addData(Seq(
        ("m1", "2024-03-01 00:00:00", 1000L),
        ("m1", "2024-03-01 00:00:10", 1010L),
        ("m2", "2024-03-01 00:00:10", 500L)))
      q.processAllAvailable()
      mem.addData(Seq(
        ("m1", "2024-03-01 00:00:20", 5L),    // reboot across batches
        ("m2", "2024-03-01 00:00:20", 510L),
        ("m2", "2024-03-01 00:00:30", 3L),    // reboot within batch
        ("m2", "2024-03-01 00:00:40", 13L)))
      q.processAllAvailable()
      // late arrival older than state: must NOT emit a spurious reboot
      mem.addData(Seq(("m1", "2024-03-01 00:00:15", 2L)))
      q.processAllAvailable()
      val got = spark.table("reboots").as[RebootDetector.Reboot].collect()
        .sortBy(r => (r.modem_name, r.ts.getTime))
      assert(got.length == 2)
      assert(got(0).modem_name == "m1" && got(0).prev_uptime == 1010L
        && got(0).uptime == 5L)
      assert(got(1).modem_name == "m2" && got(1).prev_uptime == 510L
        && got(1).uptime == 3L)
    } finally q.stop()
  }

  test("GraftExtensions injects vec_dot at session build time") {
    // newSession() rebuilds the function registry from the session's
    // extensions — no VectorExpressions.register call anywhere here.
    val s2 = spark.newSession()
    val got = s2.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(got == 11.0)
  }

  test("auth + scrape + parse compose end to end (socket-less transport)") {
    val transport = new graft.sources.HnapAuth.Transport {
      def post(h: Map[String, String], c: Map[String, String], b: String) =
        if (b.contains("\"request\""))
          """{"LoginResponse": {"Challenge": "C1", "Cookie": "u1", "PublicKey": "P1"}}"""
        else if (b.contains("\"login\"")) """{"LoginResponse": {"LoginResult": "OK"}}"""
        else DocsisFixtures.scrapes.head._1
    }
    val sess = graft.sources.HnapAuth.login(transport, "admin", "pw", 0L)
      .toOption.get
    val payload = graft.sources.HnapAuth.scrape(transport, sess, 10L)
    val df = Seq((payload, "MB8600", 0.1, "2024-03-01 00:00:00"))
      .toDF("payload", "modem_name", "scrape_latency", "ts")
      .withColumn("timestamp", to_timestamp($"ts")).drop("ts")
    val parsed = HnapParse.parse(df)
    assert(parsed.count() == 1)
    assert(parsed.select(size($"downstream_channels")).as[Int].head() == 3)
  }
}
