package graft.sources

/** Typed ingest configuration mirroring the reference's env-var surface
  * (mb8600.py:77-136, README.md:13-26): same names, same defaults, same
  * minimum bounds — but validation returns Either instead of exit(1), so
  * a driver program can surface all problems and tests can cover every
  * bound without forking a process. Notable reference discrepancy kept
  * from SURVEY §2.A: code default SCRAPE_DELAY=10 (mb8600.py:109) vs the
  * README's claimed 30 — the code wins.
  *
  * The sink-side settings keep their reference names (CLICKHOUSE_*) but
  * feed the Spark path: sinkUrl is the fact-table location and
  * queueLimit maps to the source's max in-flight scrape budget.
  */
final case class GraftConfig(
    modemName: String,
    modemUrl: String,
    modemUsername: String,
    modemPassword: String,
    sinkUrl: String,
    sinkUsername: String,
    sinkPassword: String,
    sinkDatabase: String,
    sinkTable: String,
    scrapeDelaySeconds: Int,
    queueLimit: Int,
    logLevel: String)

object GraftConfig {
  private val required = Seq("MODEM_URL", "MODEM_USERNAME", "MODEM_PASSWORD",
    "CLICKHOUSE_URL", "CLICKHOUSE_USERNAME", "CLICKHOUSE_PASSWORD",
    "CLICKHOUSE_DATABASE")
  private val logLevels = Set("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")

  /** Validate an environment map. Left = every problem found (the
    * reference exits on the first, mb8600.py:100-101).
    */
  def fromEnv(env: Map[String, String]): Either[Seq[String], GraftConfig] = {
    val errors = Seq.newBuilder[String]
    val missing = required.filterNot(env.contains)
    missing.foreach(k => errors += s"Missing environment variable: $k")

    def boundedInt(key: String, default: Int, min: Int): Int =
      env.get(key) match {
        case None => default
        case Some(v) => v.toIntOption match {
          case Some(i) if i >= min => i
          case _ =>
            errors += s"Invalid $key, must be a valid number >= $min"
            default
        }
      }

    val delay = boundedInt("SCRAPE_DELAY", default = 10, min = 1)
    val queue = boundedInt("CLICKHOUSE_QUEUE_LIMIT", default = 1000, min = 25)
    val level = env.getOrElse("LOG_LEVEL", "INFO").toUpperCase
    if (!logLevels.contains(level))
      errors += "Invalid LOG_LEVEL, must be a valid log level " +
        "(DEBUG, INFO, WARNING, ERROR, CRITICAL)"

    val errs = errors.result()
    if (errs.nonEmpty) Left(errs)
    else Right(GraftConfig(
      modemName = env.getOrElse("MODEM_NAME", "MB8600"),
      modemUrl = env("MODEM_URL"),
      modemUsername = env("MODEM_USERNAME"),
      modemPassword = env("MODEM_PASSWORD"),
      sinkUrl = env("CLICKHOUSE_URL"),
      sinkUsername = env("CLICKHOUSE_USERNAME"),
      sinkPassword = env("CLICKHOUSE_PASSWORD"),
      sinkDatabase = env("CLICKHOUSE_DATABASE"),
      sinkTable = env.getOrElse("CLICKHOUSE_TABLE", "docsis"),
      scrapeDelaySeconds = delay,
      queueLimit = queue,
      logLevel = level))
  }
}
