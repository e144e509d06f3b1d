package graft.sources

import java.sql.Timestamp

/** The reference's analytical data model (tables.sql:5-30), mapped per
  * SURVEY.md §1.2: unsigned CH types widened (UInt8→Int, UInt32→Long),
  * error counters kept signed Int64 BY DESIGN (tables.sql:19 — modem
  * counter overflow bugs), `modem_config_filename` the only nullable.
  */
object DocsisSchema {

  /** tables.sql:11-20 — Array(Nested(...)) downstream measurements. */
  final case class DownstreamChannel(
      channel_id: Int,        // UInt8 at tables.sql:12 → Int (no unsigned byte)
      frequency: Float,       // Hz (field is MHz, ×1e6 at mb8600.py:380)
      modulation: String,
      power: Float,
      snr: Float,             // OFDM PLC <20dB bug-corrected ×2.5 (mb8600.py:372-376)
      corrected_errors: Long, // signed on purpose, tables.sql:19
      uncorrected_errors: Long)

  /** tables.sql:21-27 — upstream measurements. */
  final case class UpstreamChannel(
      channel_id: Int,
      frequency: Float,       // Hz (×1e6, mb8600.py:396)
      modulation: String,
      power: Float,
      width: Float)           // Hz (field is kHz, ×1000 at mb8600.py:397)

  /** One snapshot row (tables.sql:5-30; built at mb8600.py:427-437). */
  final case class DocsisRow(
      modem_name: String,
      modem_config_filename: Option[String],
      modem_uptime: Long,     // UInt32 → Long (range exceeds Int)
      modem_version: String,
      modem_model: String,
      downstream_channels: Seq[DownstreamChannel],
      upstream_channels: Seq[UpstreamChannel],
      scrape_latency: Float,
      timestamp: Timestamp)
}
