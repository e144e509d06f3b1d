package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt north star): media is an
  * opaque `binary` column plus typed metadata; decode / feature-extract
  * run per-partition over the bytes. The image/audio codecs are NOT in
  * this container, so `decodeStub` is a clearly-marked deterministic fake
  * — the Spark-side plumbing (schema, typed Dataset, partition-wise batch
  * shape, feature schema) is real and tested.
  */
object MediaPipeline {

  /** A media row: opaque content + typed metadata. */
  final case class MediaRow(
      media_id: Long, content: Array[Byte], fmt: String,
      width: Int, height: Int)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long, byte_len: Long, fmt: String,
      thumb_w: Int, thumb_h: Int, n_frames: Long, content_md5: String)

  /** Derive a deterministic media table from `documents` (the container
    * has no real image fixtures): content = utf-8 bytes of the text,
    * metadata from n_chars. Mirrors how a real pipeline would carry
    * parquet BINARY + metadata columns.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      col("source").as("fmt"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") * 7 % 480 + 16).cast("int").as("height"))
  }

  /** STUB decoder ??? — a real implementation would decode image/audio
    * bytes (libjpeg/ffmpeg et al., not present in this container). The
    * fake is deterministic in the content bytes so tests are stable; the
    * partition-wise iteration is exactly the shape a real vectorized
    * decoder batch would use.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val sha = md.digest(r.content).map("%02x".format(_)).mkString
      MediaFeatures(
        media_id = r.media_id,
        byte_len = r.content.length.toLong,
        fmt = r.fmt,
        thumb_w = r.width / 8,
        thumb_h = r.height / 8,
        n_frames = r.content.length.toLong / 1024L + 1L,
        content_md5 = sha)
    }

  /** Typed end-to-end: media table → per-partition decode → features. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions(decodeStub)
  }

  /** One per-item result of a batched model-inference pass. */
  final case class InferenceOut(
      media_id: Long, batch_id: Long, batch_size: Int, item_index: Int,
      score: Double)

  /** Batched inference plumbing — the Spark shape a GPU model server
    * needs: items grouped into FIXED, DETERMINISTIC batches (key =
    * media_id / batchSize, so batch membership is reproducible across
    * runs and engines, unlike per-partition chunking), the whole batch
    * assembled and "forwarded" at once, per-item results emitted with
    * their batch provenance. The model forward is a ??? stub (no
    * accelerator/codec libs in this container) — deterministic
    * arithmetic in (byte_len, batch_size, item_index) — but the
    * groupByKey → flatMapGroups batch assembly, the typed schemas on
    * both sides, and the batch-shape metadata are the real thing.
    * Scale: one shuffle on the batch key; batches are equal-width by
    * construction, so no skew; batch state is O(batchSize), never
    * O(partition).
    */
  def inferBatched(spark: SparkSession, dir: String,
      batchSize: Int = 16): Dataset[InferenceOut] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .groupByKey(_.media_id / batchSize)
      .flatMapGroups { (batchId: Long, rows: Iterator[MediaRow]) =>
        val batch = rows.toArray.sortBy(_.media_id) // assemble inference batch
        // ??? model.forward(batch) — stubbed deterministically:
        batch.iterator.zipWithIndex.map { case (r, i) =>
          InferenceOut(r.media_id, batchId, batch.length, i,
            r.content.length.toDouble * batch.length + i)
        }
      }
  }
}
