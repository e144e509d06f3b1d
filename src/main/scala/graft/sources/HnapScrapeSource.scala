package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 streaming source for the HNAP scrape loop (SURVEY.md
  * §2.A "Scrape source", option (a)): a `MicroBatchStream` that performs
  * one authenticated `GetMultipleHNAPs` poll per micro-batch on the
  * driver, mirroring the reference's `while True: scrape → queue` loop
  * (mb8600.py:329-443) with its session-expiry re-login (mb8600.py:
  * 354-360) — but with offsets checkpointed by Spark, so restarts
  * replay nothing and drop nothing (vs the reference's at-most-once).
  *
  * The modem transport is pluggable via `TransportRegistry` (keyed by the
  * `transportId` option): production registers an HTTP transport; tests
  * register canned fixtures. Usage:
  *
  * {{{
  * TransportRegistry.register("modem1", transport)
  * spark.readStream.format("graft.sources.HnapScrapeProvider")
  *   .option("transportId", "modem1").option("modemName", "MB8600")
  *   .option("username", "admin").option("password", "motorola")
  *   .load()                      // → payload/modem_name/scrape_latency/timestamp
  * }}}
  */
object HnapScrapeSource {
  val schema: StructType = StructType(Seq(
    StructField("payload", StringType),
    StructField("modem_name", StringType),
    StructField("scrape_latency", DoubleType),
    StructField("timestamp", TimestampType)))
}

/** Process-wide registry wiring transports to source instances (DSv2
  * instantiates providers reflectively from string options, so live
  * objects must be handed over out-of-band).
  */
object TransportRegistry {
  private val transports = TrieMap[String, HnapAuth.Transport]()
  def register(id: String, t: HnapAuth.Transport): Unit = transports.put(id, t)
  def get(id: String): HnapAuth.Transport = transports(id)
}

class HnapScrapeProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HnapScrapeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HnapScrapeTable(new CaseInsensitiveStringMap(properties))
}

class HnapScrapeTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"hnap_scrape(${options.get("modemName")})"
  override def schema(): StructType = HnapScrapeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HnapScrapeSource.schema
        override def toBatch: Batch = throw new UnsupportedOperationException(
          "hnap_scrape is a streaming-only source")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HnapMicroBatchStream(opts, checkpointLocation)
      }
    }
}

/** Offset = number of scrapes taken so far. */
case class ScrapeOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class HnapMicroBatchStream(options: CaseInsensitiveStringMap,
    checkpointLocation: String) extends MicroBatchStream {

  private val transport = TransportRegistry.get(options.get("transportId"))
  private val modemName = Option(options.get("modemName")).getOrElse("MB8600")
  private val username = Option(options.get("username")).getOrElse("admin")
  private val password = Option(options.get("password")).getOrElse("motorola")
  /** test hook: stop producing after N scrapes (AvailableNow terminates) */
  private val maxScrapes =
    Option(options.get("maxScrapes")).map(_.toLong).getOrElse(Long.MaxValue)

  private var session: Option[HnapAuth.HnapSession] = None

  // Scrape WAL: each poll is persisted as <wal>/<offset> BEFORE the
  // offset becomes visible, so a restarted query can replay any
  // uncommitted range from disk (a scrape is un-refetchable — unlike a
  // Kafka offset, the modem can't re-serve the past). scrapeCount
  // resumes from the highest WAL entry.
  private val hadoopConf = org.apache.spark.sql.SparkSession.active
    .sessionState.newHadoopConf()
  private val walDir = new org.apache.hadoop.fs.Path(checkpointLocation, "scrape-wal")
  private val fs = walDir.getFileSystem(hadoopConf)
  fs.mkdirs(walDir)
  // in-memory read-through cache of the WAL
  private val buffered = mutable.TreeMap[Long, ScrapePartition]()
  // Committed high-watermark markers: commit(e) leaves an empty
  // `commit-<e>` file, so after a restart where every batch was committed
  // (and its WAL entries therefore pruned) the counter still resumes at
  // the checkpointed offset instead of regressing to 0 and silently
  // shadowing the first post-restart scrapes behind already-planned
  // offsets.
  private def committedMark(): Long =
    fs.listStatus(walDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("commit-") =>
        scala.util.Try(n.stripPrefix("commit-").toLong).toOption }
      .flatten.foldLeft(0L)(math.max)
  private var scrapeCount: Long = {
    val walMax = fs.listStatus(walDir).map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .foldLeft(-1L)(math.max) + 1L
    math.max(walMax, committedMark())
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def walWrite(offset: Long, p: ScrapePartition): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(walDir, s".$offset.tmp")
    val out = fs.create(tmp, true)
    try {
      val node = mapper.createObjectNode()
      node.put("payload", p.payload); node.put("modemName", p.modemName)
      node.put("latency", p.latency); node.put("tsMicros", p.tsMicros)
      out.write(mapper.writeValueAsBytes(node))
    } finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(walDir, offset.toString))
  }

  private def walRead(offset: Long): Option[ScrapePartition] = {
    val f = new org.apache.hadoop.fs.Path(walDir, offset.toString)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try {
        val node = mapper.readTree(in)
        Some(ScrapePartition(node.get("payload").asText(),
          node.get("modemName").asText(), node.get("latency").asDouble(),
          node.get("tsMicros").asLong()))
      } finally in.close()
    }
  }
  private def resultOk(payload: String): Boolean =
    try {
      val n = mapper.readTree(payload)
        .path("GetMultipleHNAPsResponse").path("GetMultipleHNAPsResult")
      n.asText() == "OK"
    } catch { case _: Exception => false }

  private def ensureLogin(): Unit =
    if (session.isEmpty)
      session = HnapAuth.login(transport, username, password,
        System.currentTimeMillis()) match {
        case Right(s) => Some(s)
        case Left(err) => throw new RuntimeException(s"HNAP login failed: $err")
      }

  /** One scrape, with the reference's expired-session recovery: on a
    * non-OK result, drop the session, re-login, retry once.
    */
  private def scrapeOnce(): Unit = {
    ensureLogin()
    val t0 = System.nanoTime()
    var payload = HnapAuth.scrape(transport, session.get, System.currentTimeMillis())
    if (!resultOk(payload)) {
      session = None
      ensureLogin()
      payload = HnapAuth.scrape(transport, session.get, System.currentTimeMillis())
    }
    val latency = (System.nanoTime() - t0) / 1e9
    val part = ScrapePartition(payload, modemName, latency,
      System.currentTimeMillis() * 1000L)
    walWrite(scrapeCount, part) // durable before the offset is visible
    buffered.put(scrapeCount, part)
    scrapeCount += 1
  }

  override def initialOffset(): Offset = ScrapeOffset(0L)
  override def deserializeOffset(json: String): Offset = ScrapeOffset(json.toLong)

  override def latestOffset(): Offset = {
    if (scrapeCount < maxScrapes) scrapeOnce()
    ScrapeOffset(scrapeCount)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ScrapeOffset].n
    val e = end.asInstanceOf[ScrapeOffset].n
    // memory first, WAL fallback (restart replay of uncommitted batches).
    // A scrape is un-refetchable, so a planned-but-missing offset is data
    // loss — fail loudly rather than silently narrowing the batch.
    (s until e).map { o =>
      buffered.get(o).orElse(walRead(o)).getOrElse(throw new IllegalStateException(
        s"scrape offset $o in [$s, $e) missing from both buffer and WAL " +
          s"at $walDir — refusing to plan a batch that would drop data"))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val part = p.asInstanceOf[ScrapePartition]
          private var consumed = false
          override def next(): Boolean = if (consumed) false else { consumed = true; true }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(part.payload),
              UTF8String.fromString(part.modemName),
              part.latency, part.tsMicros)
          override def close(): Unit = ()
        }
    }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[ScrapeOffset].n
    // Durable watermark FIRST (an empty marker file is atomic-by-name),
    // then prune; crash between the two just leaves extra WAL entries.
    val prev = committedMark()
    if (e > prev) {
      fs.create(new org.apache.hadoop.fs.Path(walDir, s"commit-$e"), true).close()
      fs.delete(new org.apache.hadoop.fs.Path(walDir, s"commit-$prev"), false)
    }
    buffered.rangeTo(e - 1).keys.toSeq.foreach { o =>
      buffered.remove(o)
      fs.delete(new org.apache.hadoop.fs.Path(walDir, o.toString), false)
    }
  }

  override def stop(): Unit = ()
}

/** One scrape travels to executors as its own partition. */
case class ScrapePartition(payload: String, modemName: String,
    latency: Double, tsMicros: Long) extends InputPartition
