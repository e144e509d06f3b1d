package graft.operators

import graft.QueryDef
import graft.sources.MediaPipeline
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) query surface. m01 is the oracle-checked
  * expression path; the typed mapPartitions decode path (MediaPipeline.
  * extractFeatures) is exercised by m02 (same values — the stub is
  * expressible both ways, which is exactly what makes it testable).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "m01_media_features",
      (s, dir) => {
        import s.implicits._
        MediaPipeline.mediaTable(s, dir)
          .select(
            $"media_id",
            octet_length($"content").cast("long").as("byte_len"),
            $"fmt",
            ($"width" / 8).cast("int").as("thumb_w"),
            ($"height" / 8).cast("int").as("thumb_h"),
            (expr("octet_length(content) div 1024") + 1L).cast("long").as("n_frames"),
            md5($"content").as("content_md5"))
          .orderBy($"media_id")
      },
      Some("""
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS byte_len,
               source AS fmt,
               CAST((n_chars % 640 + 16) // 8 AS INTEGER) AS thumb_w,
               CAST((n_chars * 7 % 480 + 16) // 8 AS INTEGER) AS thumb_h,
               octet_length(encode(text)) // 1024 + 1 AS n_frames,
               md5(text) AS content_md5
        FROM documents ORDER BY media_id"""),
      doc = "binary media column + metadata → stub features (expression path)"),

    QueryDef(
      "m02_media_features_typed",
      (s, dir) => MediaPipeline.extractFeatures(s, dir).toDF()
        .select("media_id", "byte_len", "fmt", "thumb_w", "thumb_h",
          "n_frames", "content_md5")
        .orderBy(col("media_id")),
      Some("""
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS byte_len,
               source AS fmt,
               CAST((n_chars % 640 + 16) // 8 AS INTEGER) AS thumb_w,
               CAST((n_chars * 7 % 480 + 16) // 8 AS INTEGER) AS thumb_h,
               octet_length(encode(text)) // 1024 + 1 AS n_frames,
               md5(text) AS content_md5
        FROM documents ORDER BY media_id"""),
      doc = "typed Dataset + mapPartitions stub decoder path")
  )
}
