package graft

import graft.sources.GraftConfig
import org.scalatest.funsuite.AnyFunSuite

/** Config surface parity with mb8600.py:77-136: names, defaults, minimum
  * bounds, and the full error list on invalid input.
  */
class GraftConfigSpec extends AnyFunSuite {

  private val full = Map(
    "MODEM_URL" -> "https://192.168.100.1",
    "MODEM_USERNAME" -> "admin", "MODEM_PASSWORD" -> "motorola",
    "CLICKHOUSE_URL" -> "http://ch:8123", "CLICKHOUSE_USERNAME" -> "u",
    "CLICKHOUSE_PASSWORD" -> "p", "CLICKHOUSE_DATABASE" -> "homelab")

  test("defaults match the reference code (not its README)") {
    val c = GraftConfig.fromEnv(full).toOption.get
    assert(c.modemName == "MB8600")
    assert(c.sinkTable == "docsis")
    assert(c.scrapeDelaySeconds == 10) // mb8600.py:109; README claims 30
    assert(c.queueLimit == 1000)
    assert(c.logLevel == "INFO")
  }

  test("minimum bounds: SCRAPE_DELAY >= 1, CLICKHOUSE_QUEUE_LIMIT >= 25") {
    val bad = GraftConfig.fromEnv(full ++ Map(
      "SCRAPE_DELAY" -> "0", "CLICKHOUSE_QUEUE_LIMIT" -> "24"))
    assert(bad.isLeft)
    val errs = bad.swap.toOption.get
    assert(errs.exists(_.contains("SCRAPE_DELAY")))
    assert(errs.exists(_.contains("CLICKHOUSE_QUEUE_LIMIT")))
    assert(GraftConfig.fromEnv(full ++ Map("SCRAPE_DELAY" -> "1",
      "CLICKHOUSE_QUEUE_LIMIT" -> "25")).isRight)
  }

  test("every missing required var is reported, not just the first") {
    val errs = GraftConfig.fromEnv(Map.empty).swap.toOption.get
    assert(errs.count(_.startsWith("Missing environment variable")) == 7)
  }

  test("non-numeric and bad log level rejected") {
    val errs = GraftConfig.fromEnv(full ++ Map(
      "SCRAPE_DELAY" -> "ten", "LOG_LEVEL" -> "CHATTY")).swap.toOption.get
    assert(errs.exists(_.contains("SCRAPE_DELAY")))
    assert(errs.exists(_.contains("LOG_LEVEL")))
  }
}
