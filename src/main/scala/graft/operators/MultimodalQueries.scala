package graft.operators

import graft.QueryDef
import graft.sources.MediaPipeline
import org.apache.spark.sql.expressions.Window
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
      doc = "typed Dataset + mapPartitions stub decoder path"),

    // ------------------------------------------------------------------
    // m03: frame sampling over the opaque binary column — the video-style
    // access pattern: per media row, slice up to 5 fixed-stride 64-byte
    // "frames" (a real decoder would seek keyframes; the slice IS the
    // Spark-side plumbing: per-row explode of frame offsets + binary
    // substring + per-frame fingerprint, all codegen'd expressions).
    // greatest(len,1) keeps integer division away from negative operands,
    // where Spark truncates but DuckDB floors.
    QueryDef(
      "m03_frame_samples",
      (s, dir) => {
        import s.implicits._
        MediaPipeline.mediaTable(s, dir)
          .select($"media_id", $"content",
            octet_length($"content").cast("long").as("len"))
          .select($"media_id",
            posexplode(expr(
              "sequence(0, least(4, (greatest(len, 1) - 1) div 256))"))
              .as(Seq("frame_no", "off")),
            $"content")
          .select($"media_id", $"frame_no".cast("long").as("frame_no"),
            // DuckDB has no BLOB substring, so both engines slice the hex
            // encoding (offsets and lengths doubled: 512-char stride,
            // 128-char frame = 64 bytes)
            md5(expr("substring(hex(content), off * 512 + 1, 128)"))
              .as("frame_md5"))
          .orderBy($"media_id", $"frame_no")
      },
      Some("""
        WITH m AS (SELECT doc_id AS media_id, encode(text) AS content,
                          octet_length(encode(text)) AS len
                   FROM documents)
        SELECT media_id, CAST(k.k AS BIGINT) AS frame_no,
               md5(substring(hex(content), CAST(k.k * 512 + 1 AS INTEGER), 128))
                 AS frame_md5
        FROM m, unnest(range(0, LEAST(5, 1 + (GREATEST(len, 1) - 1) // 256))) AS k(k)
        ORDER BY media_id, frame_no"""),
      doc = "frame sampling: per-row offset explode + binary slicing + fingerprints"),

    // ------------------------------------------------------------------
    // m04: batched inference over the media table — deterministic batch
    // assembly (batch = media_id div 16) through typed groupByKey →
    // flatMapGroups, per-item outputs carrying batch provenance. The
    // model forward is a stub (see MediaPipeline.inferBatched), so the
    // oracle can replay the same arithmetic with window functions.
    QueryDef(
      "m04_batched_inference",
      (s, dir) => MediaPipeline.inferBatched(s, dir).toDF()
        .select("media_id", "batch_id", "batch_size", "item_index", "score")
        .orderBy(col("media_id")),
      Some("""
        WITH m AS (SELECT doc_id AS media_id,
                          octet_length(encode(text)) AS byte_len,
                          doc_id // 16 AS batch_id
                   FROM documents),
        b AS (SELECT media_id, batch_id, byte_len,
                     COUNT(*) OVER (PARTITION BY batch_id) AS batch_size,
                     ROW_NUMBER() OVER (PARTITION BY batch_id
                                        ORDER BY media_id) - 1 AS item_index
              FROM m)
        SELECT media_id, batch_id,
               CAST(batch_size AS INTEGER) AS batch_size,
               CAST(item_index AS INTEGER) AS item_index,
               CAST(byte_len AS DOUBLE) * batch_size + item_index AS score
        FROM b ORDER BY media_id"""),
      doc = "batched inference: deterministic batch keys + typed flatMapGroups"),

    // ------------------------------------------------------------------
    // m05: MEDIA CONTENT DEDUP — the first dedup every multimodal
    // pipeline runs: exact byte-identity over the opaque binary column
    // (md5 of `content`, so the shuffle key is 16 bytes regardless of
    // asset size — the same key-compression rule as d01). The raw media
    // table has no natural byte-dups, so copies are planted the same
    // way the d-series corpus plants them (+1M ids, identical bytes).
    // Report per format: dup groups, redundant copies, and bytes
    // reclaimed by keeping one copy per group — the storage number a
    // 100 TB media lake acts on. Everything partial-aggregates; the
    // asset bytes never shuffle.
    QueryDef(
      "m05_media_dedup",
      (s, dir) => {
        import s.implicits._
        val media = MediaPipeline.mediaTable(s, dir)
          .select($"media_id", $"fmt", $"content")
        val withCopies = media.unionByName(
          media.filter($"media_id" % 10 === 0)
            .select(($"media_id" + 1000000L).as("media_id"), $"fmt",
              $"content"))
        withCopies
          .select($"fmt", md5($"content").as("h"),
            octet_length($"content").cast("long").as("nb"), $"media_id")
          .groupBy($"fmt", $"h")
          .agg(count(lit(1)).as("n"), sum($"nb").as("bytes"),
            min($"nb").as("nb_keep"))
          .filter($"n" > 1)
          .groupBy($"fmt")
          .agg(count(lit(1)).as("n_dup_groups"),
            sum($"n" - 1).as("n_copies"),
            sum($"bytes" - $"nb_keep").as("bytes_reclaimed"))
          .orderBy($"fmt")
      },
      Some("""
        WITH media AS (
          -- DuckDB's md5 takes VARCHAR, not BLOB; hashing the text hashes
          -- the same UTF-8 bytes Spark's md5(binary) sees after encode()
          SELECT doc_id AS media_id, source AS fmt, text,
                 encode(text) AS content
          FROM documents
          UNION ALL
          SELECT doc_id + 1000000, source, text, encode(text)
          FROM documents WHERE doc_id % 10 = 0),
        grp AS (
          SELECT fmt, md5(text) AS h, COUNT(*) AS n,
                 CAST(SUM(octet_length(content)) AS BIGINT) AS bytes,
                 CAST(MIN(octet_length(content)) AS BIGINT) AS nb_keep
          FROM media GROUP BY fmt, md5(text))
        SELECT fmt, COUNT(*) AS n_dup_groups,
               CAST(SUM(n - 1) AS BIGINT) AS n_copies,
               CAST(SUM(bytes - nb_keep) AS BIGINT) AS bytes_reclaimed
        FROM grp WHERE n > 1
        GROUP BY fmt ORDER BY fmt"""),
      doc = "media content dedup: 16-byte hash keys over opaque binaries, bytes-reclaimed report"),

    // ------------------------------------------------------------------
    // m06: CROSS-MODAL retrieval — the CLIP-shaped query a multimodal
    // lake serves: a text-side query embedding (from the embeddings
    // table) scored by exact cosine against IMAGE-side embeddings
    // produced by the (stub) media encoder, top-k media assets
    // returned with their metadata. The encoder stub maps content
    // bytes → 64 deterministic dims in [-1, 1] (two md5 digests, one
    // hex char per dim — the same "deterministic in the content bytes"
    // contract as every MediaPipeline stub; a real deployment swaps in
    // a model forward over mapInPandas batches, m04's plumbing).
    // Scale: encoding is map-only over the binary column (assets never
    // shuffle); the query vector broadcasts; ranking is the s01
    // decimal-exact cosine + TakeOrderedAndProject — the brute-force
    // leg of the retrieval cascade (s07/s17 are its prefilters).
    QueryDef(
      "m06_crossmodal_retrieval",
      (s, dir) => {
        import s.implicits._
        import graft.functions.VectorFunctions.cosineExact
        val media = MediaPipeline.mediaTable(s, dir)
          // 7.5 must be a DOUBLE literal: a bare `7.5` in Spark SQL is
          // DECIMAL(2,1), and int/decimal division rounds at scale 6 —
          // enough to move the cast-to-float bits off DuckDB's
          .withColumn("m_emb", expr(
            """transform(sequence(0, 63), d ->
                 CAST(CAST(instr('0123456789abcdef',
                        substring(md5(concat(CAST(content AS STRING), ':',
                                             CAST(d div 32 AS STRING))),
                          pmod(d, 32) + 1, 1)) - 1 AS DOUBLE) / 7.5D - 1.0D
                      AS FLOAT))"""))
        val qv = graft.Tables.load(s, dir, "embeddings")
          .filter($"vec_id" === 0).select($"embedding".as("qv"))
        media.crossJoin(broadcast(qv))
          .select($"media_id", $"fmt",
            round(cosineExact("m_emb", "qv"), 9).as("cosine"))
          .orderBy($"cosine".desc, $"media_id".asc)
          .limit(10)
      },
      Some(s"""
        WITH media AS (
          SELECT doc_id AS media_id, source AS fmt,
                 list_transform(range(0, 64), d ->
                   CAST((strpos('0123456789abcdef',
                          substr(md5(text || ':' || CAST(d // 32 AS VARCHAR)),
                            (d % 32) + 1, 1)) - 1) / 7.5 - 1.0 AS REAL)) AS m_emb
          FROM documents),
        qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        pairs AS (SELECT m.media_id, m.fmt,
                         unnest(m.m_emb) AS x, unnest(qv.qv) AS y
                  FROM media m, qv),
        dots AS (SELECT media_id, fmt,
                        ${graft.operators.OracleFragments.oCosineSums()}
                 FROM pairs GROUP BY media_id, fmt)
        SELECT media_id, fmt,
               round(dot / (sqrt(na) * sqrt(nq)), 9) AS cosine
        FROM dots ORDER BY cosine DESC, media_id ASC LIMIT 10"""),
      doc = "cross-modal retrieval: stub media encoder to the text embedding space, exact cosine top-k"),

    // ------------------------------------------------------------------
    // m07: PERCEPTUAL near-dup pairs — the dHash/pHash family m05's
    // byte-identity pass cannot see: assets that differ in a few
    // bytes (re-encode, watermark, metadata touch) but are the same
    // picture. The perceptual fingerprint partitions each asset into
    // 64 equal strips, reduces each strip to a 4-bit cell (first hex
    // digit of its md5 — locality lives in the STRIP PARTITIONING,
    // not the hash: a local edit perturbs only the strips it touches),
    // and packs adjacent-cell comparisons into a 62-bit dHash. A real
    // deployment swaps the strip reducer for decoded-pixel means
    // (m04's mapInPandas plumbing); everything downstream — banding,
    // bucket caps, XOR+POPCNT ranking — is unchanged, which is the
    // point of keeping the fingerprint opaque.
    // Near-dups are found s07-style: 4×16-bit bands over the hash,
    // bounded posting lists (hot-bucket guard shared with the d-series),
    // exact Hamming confirm bit_count(xor) <= 6. Planted perturbed
    // copies (+3M ids, first char replaced — length preserved) differ
    // only in the strips covering position 1, so they collide on the
    // untouched bands and confirm at distance well under the cutoff.
    // Scale: fingerprint is map-only (assets never shuffle — only
    // 8-byte hashes + band keys do); pair expansion is capped; confirm
    // is one codegen'd XOR per candidate.
    QueryDef(
      "m07_perceptual_neardup",
      (s, dir) => {
        import s.implicits._
        // min-size guard — the icon problem: an asset below 2 source
        // units per fingerprint cell leaves trailing strips EMPTY, and
        // md5('') is a constant — every tiny asset shares the same
        // trailing cells, so the tiny population forms a near-clique
        // whose pair mass grows QUADRATICALLY with the corpus (the ×100
        // sweep measured 1.09M pairs, 1387× the ×1 output, almost all
        // from sub-64-char docs). Real perceptual dedup excludes
        // below-minimum assets for exactly this reason; ≥ 128 chars
        // keeps every strip at w ≥ 2.
        val docs = graft.Tables.load(s, dir, "documents")
          .filter(length($"text") >= 128)
          .select($"doc_id".as("media_id"), $"text")
        val perturbed = docs.filter($"media_id" % 10 === 2)
          .select(($"media_id" + 3000000L).as("media_id"),
            concat(lit("x"), expr("substring(text, 2)")).as("text"))
        // The 64-cell array is BOUND AS A LAMBDA VARIABLE (via the
        // single-element transform) before the 62-step fold reads it
        // 124 times: CollapseProject would otherwise inline the
        // 64-md5 cells expression into every element_at reference —
        // ~8,000 md5 calls per row instead of 64 (measured 155 s at
        // sf0.1). localCheckpoint then materializes the tiny
        // (id, hash) fingerprint so the three downstream uses (bands
        // + both confirm sides) don't re-derive it from the texts.
        val hashed = docs.unionByName(perturbed)
          .withColumn("w",
            greatest(expr("length(text) div 64"), lit(1)))
          .withColumn("phash", expr(
            """element_at(transform(array(
                 transform(sequence(0, 63), i ->
                   instr('0123456789abcdef',
                     substring(md5(substring(text, 1 + i * w, w)), 1, 1)) - 1)),
               cells ->
                 aggregate(sequence(0, 61), 0L, (acc, i) ->
                   acc + IF(element_at(cells, i + 1) > element_at(cells, i + 2),
                            shiftleft(1L, i), 0L))), 1)"""))
          .select($"media_id", $"phash")
          .localCheckpoint()
        val bands = hashed
          .select($"media_id", $"phash",
            posexplode(expr(
              "transform(sequence(0, 3), b -> pmod(shiftright(phash, b * 16), 65536))"))
              .as(Seq("band", "bval")))
        val cand = DedupQueries.adaptiveBucketPairs(bands,
          Seq("band", "bval"), $"media_id", "m07_hot_buckets")
          .select($"pa".as("doc_a"), $"pb".as("doc_b"))
          .distinct()
        val ha = hashed.select($"media_id".as("doc_a"), $"phash".as("pa"))
        val hb = hashed.select($"media_id".as("doc_b"), $"phash".as("pb"))
        cand.join(ha, "doc_a").join(hb, "doc_b")
          .withColumn("hamming",
            expr("bit_count(pa ^ pb)").cast("long"))
          .filter($"hamming" <= 6)
          .select($"doc_a", $"doc_b", $"hamming")
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""
        WITH media AS (
          SELECT doc_id AS media_id, text FROM documents
          WHERE length(text) >= 128
          UNION ALL
          SELECT doc_id + 3000000, 'x' || substr(text, 2)
          FROM documents WHERE doc_id % 10 = 2 AND length(text) >= 128),
        hashed AS (
          SELECT media_id,
                 CAST(list_sum(list_transform(range(0, 62), i ->
                   CASE WHEN cells[i + 1] > cells[i + 2]
                        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
                   AS BIGINT) AS phash
          FROM (
            SELECT media_id,
                   list_transform(range(0, 64), i ->
                     strpos('0123456789abcdef',
                       substr(md5(substr(text, 1 + i * w, w)), 1, 1)) - 1)
                     AS cells
            FROM (SELECT media_id, text,
                         GREATEST(length(text) // 64, 1) AS w
                  FROM media))),
        inv AS (
          SELECT b.b AS band, (phash >> (b.b * 16)) % 65536 AS bval,
                 media_id
          FROM hashed CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
        buckets AS (
          SELECT band, bval FROM inv GROUP BY band, bval
          HAVING COUNT(*) > 1 AND COUNT(*) <= ${DedupQueries.dropLshBucket}),
        cand AS (
          SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b
          FROM inv a
          JOIN buckets k ON k.band = a.band AND k.bval = a.bval
          JOIN inv b ON b.band = a.band AND b.bval = a.bval
                     AND a.media_id < b.media_id)
        SELECT c.doc_a, c.doc_b,
               CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS hamming
        FROM cand c
        JOIN hashed ha ON ha.media_id = c.doc_a
        JOIN hashed hb ON hb.media_id = c.doc_b
        WHERE bit_count(xor(ha.phash, hb.phash)) <= 6
        ORDER BY doc_a, doc_b"""),
      doc = "perceptual media near-dup: strip-cell dHash, banded buckets, XOR+POPCNT Hamming confirm"),

    // ------------------------------------------------------------------
    // m08: REAL image decode through the typed media seam — executors
    // render genuine solid-color PNGs (ImageIO.write) whose decoded
    // stats have a closed form, then MediaPipeline.decodeImage
    // (javax.imageio, JDK-built-in) decodes them back: dimensions,
    // channels, sampled Rec.601 luma (×1000 — integral, engine-exact),
    // dHash (0 for a solid image). The oracle PREDICTS every feature
    // arithmetically, so the whole encode→decode→extract loop is
    // hash-checked, not just smoke-tested. Map-only: render+decode are
    // per-row in one partition-local pass; no shuffle until the output
    // sort.
    QueryDef(
      "m08_image_decode",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 0)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 64 + 16).cast("int").as("w"),
            ($"n_chars" * 7 % 48 + 16).cast("int").as("h"),
            // pre-reduce before the Knuth-multiply: doc_id * 2654435761
            // overflows Long at doc_id ≳ 3.5e9, where Spark (non-ANSI)
            // wraps silently but the DuckDB oracle raises — the reduced
            // form is congruent mod 2^24 and never exceeds ~4.5e16
            pmod(pmod($"doc_id", lit(16777216L)) * 2654435761L,
              lit(16777216L)).cast("int").as("rgb"))
          .as[(Long, Int, Int, Int)]
        rows.mapPartitions(_.map { case (id, w, h, rgb) =>
            MediaPipeline.decodeImage(id,
              MediaPipeline.renderSolidPng(w, h, rgb))
          })
          .toDF()
          .select($"media_id", $"width", $"height", $"channels",
            $"luma_x1000", $"dhash", $"decode_ok")
          .orderBy($"media_id")
      },
      Some("""
        WITH px AS (
          SELECT doc_id AS media_id,
                 CAST(n_chars % 64 + 16 AS INTEGER) AS width,
                 CAST(n_chars * 7 % 48 + 16 AS INTEGER) AS height,
                 ((doc_id % 16777216) * 2654435761) % 16777216 AS rgb
          FROM documents WHERE doc_id % 20 = 0)
        SELECT media_id, width, height, CAST(3 AS INTEGER) AS channels,
               CAST(299 * (rgb // 65536) + 587 * ((rgb // 256) % 256)
                    + 114 * (rgb % 256) AS BIGINT) AS luma_x1000,
               CAST(0 AS BIGINT) AS dhash, TRUE AS decode_ok
        FROM px ORDER BY media_id"""),
      doc = "real image decode (javax.imageio): PNG render + decode round-trip, closed-form oracle"),

    // ------------------------------------------------------------------
    // m09: NON-SOLID real decode (VERDICT r8 punch #6) — executors render
    // genuine two-color split PNGs (left/right halves, derived colors)
    // and decode them with the same javax.imageio path as m08. Unlike a
    // solid image, the split exercises the dHash transition logic (one
    // luminance edge per sampled row → dhash 0x1010101010101010 when the
    // right half is brighter) and a MIXED-color sampled luma — both with
    // exact closed forms the oracle predicts arithmetically (width is
    // forced even ≥ 18 so the 9-col grid lands 5 left / 4 right; see
    // MediaPipeline.renderSplitPng). % 20 == 1 keeps the asset set
    // disjoint from m08's.
    QueryDef(
      "m09_split_decode",
      (s, dir) => {
        import s.implicits._
        MediaPipeline.splitAssets(s, dir)
          .filter($"media_id" % 20 === 1)
          .as[(Long, Int, Int, Int, Int)]
          .mapPartitions(_.map { case (id, w, h, l, r) =>
            MediaPipeline.decodeImage(id, MediaPipeline.renderSplitPng(w, h, l, r))
          })
          .toDF()
          .select($"media_id", $"width", $"height", $"channels",
            $"luma_x1000", $"dhash", $"decode_ok")
          .orderBy($"media_id")
      },
      Some("""
        WITH px AS (
          SELECT doc_id AS media_id,
                 CAST((n_chars % 30) * 2 + 18 AS INTEGER) AS width,
                 CAST((n_chars * 7 % 24) * 2 + 16 AS INTEGER) AS height,
                 ((doc_id % 16777216) * 2654435761) % 16777216 AS rgbl,
                 ((doc_id % 16777216) * 40503) % 16777216 AS rgbr
          FROM documents WHERE doc_id % 20 = 1),
        lum AS (
          SELECT media_id, width, height,
                 299 * (rgbl // 65536) + 587 * ((rgbl // 256) % 256)
                   + 114 * (rgbl % 256) AS ll,
                 299 * (rgbr // 65536) + 587 * ((rgbr // 256) % 256)
                   + 114 * (rgbr % 256) AS lr
          FROM px)
        SELECT media_id, width, height, CAST(3 AS INTEGER) AS channels,
               CAST((5 * ll + 4 * lr) // 9 AS BIGINT) AS luma_x1000,
               CAST(CASE WHEN lr > ll THEN 1157442765409226768 ELSE 0 END
                    AS BIGINT) AS dhash,
               TRUE AS decode_ok
        FROM lum ORDER BY media_id"""),
      doc = "non-solid real decode: two-color split PNG, dHash edge + mixed luma closed forms"),

    // ------------------------------------------------------------------
    // m10: REAL audio decode — executors render genuine RIFF/WAVE bytes
    // (16-bit mono PCM square waves with derived amplitude/period) and
    // decode them back through javax.sound.sampled (JDK-built-in; WAV
    // parsing is pure Java, headless-safe), closing the "audio decode is
    // stubbed" container gap exactly the way m08 closed the image one.
    // Every extracted statistic is an exact integer with a closed form
    // the oracle predicts: peak = A, sum_abs = n*A, sum_sq = n*A^2,
    // zero_crossings = (n-1) div P. Map-only render+decode per
    // partition; no shuffle before the output sort. % 20 == 2 keeps the
    // asset set disjoint from m08/m09's.
    QueryDef(
      "m10_audio_decode",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 2)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 2000 + 500).cast("int").as("n"),
            (lit(8000) + ($"n_chars" % 8) * 1000).cast("int").as("rate"),
            (($"doc_id" % 1000) * 16 + 500).cast("int").as("amp"),
            ($"n_chars" % 37 + 5).cast("int").as("p"))
          .as[(Long, Int, Int, Int, Int)]
        rows.mapPartitions(_.map { case (id, n, rate, amp, p) =>
            MediaPipeline.decodeAudio(id,
              MediaPipeline.renderSquareWav(n, rate, amp, p))
          })
          .toDF()
          .select($"media_id", $"n_samples", $"sample_rate", $"channels",
            $"peak", $"sum_abs", $"sum_sq", $"zero_crossings", $"decode_ok")
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 (n_chars % 2000) + 500 AS n,
                 8000 + (n_chars % 8) * 1000 AS rate,
                 (doc_id % 1000) * 16 + 500 AS amp,
                 (n_chars % 37) + 5 AS p
          FROM documents WHERE doc_id % 20 = 2)
        SELECT media_id,
               CAST(n AS BIGINT) AS n_samples,
               CAST(rate AS INTEGER) AS sample_rate,
               CAST(1 AS INTEGER) AS channels,
               CAST(amp AS BIGINT) AS peak,
               CAST(n * amp AS BIGINT) AS sum_abs,
               CAST(n * amp * amp AS BIGINT) AS sum_sq,
               CAST((n - 1) // p AS BIGINT) AS zero_crossings,
               TRUE AS decode_ok
        FROM a ORDER BY media_id"""),
      doc = "real audio decode (javax.sound.sampled): WAV render + decode round-trip, closed-form stats"),

    // ------------------------------------------------------------------
    // m11: REAL frame sampling over multi-frame assets — executors render
    // genuine ANIMATED GIFs (one derived solid color per frame; GIF is
    // lossless ≤ 256 colors so frames round-trip bit-exact) and decode
    // every 2nd frame through ImageIO's frame-sequence reader: m03's
    // frame-sample semantics on real decoded frames instead of stub
    // arithmetic, completing the image (m08/m09) → audio (m10) → frame
    // sequence (m11) real-decode progression. One output row per SAMPLED
    // frame with the 9×8 Rec.601 grid luma, whose closed form per frame
    // the oracle predicts. Map-only flatMap per partition; % 20 == 3
    // keeps assets disjoint from m08/m09/m10.
    QueryDef(
      "m11_frame_sample_decode",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 3)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 6 + 2).cast("int").as("nf"))
          .as[(Long, Int)]
        rows.mapPartitions(_.flatMap { case (id, nf) =>
            val colors = (0 until nf).map(j =>
              (((id % 16777216L) * 2654435761L + j * 7919L) % 16777216L).toInt)
            MediaPipeline.sampleFrames(id,
              MediaPipeline.renderGifFrames(24, 16, colors), stride = 2)
          })
          .toDF()
          .select($"media_id", $"n_frames", $"width", $"height",
            $"frame_idx", $"luma_x1000", $"decode_ok")
          .orderBy($"media_id", $"frame_idx")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id, (n_chars % 6) + 2 AS nf
          FROM documents WHERE doc_id % 20 = 3),
        frames AS (
          SELECT media_id, nf, unnest(range(0, nf, 2)) AS frame_idx
          FROM a),
        px AS (
          SELECT media_id, nf, frame_idx,
                 ((media_id % 16777216) * 2654435761
                   + frame_idx * 7919) % 16777216 AS rgb
          FROM frames)
        SELECT media_id, CAST(nf AS INTEGER) AS n_frames,
               CAST(24 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(299 * (rgb // 65536) + 587 * ((rgb // 256) % 256)
                    + 114 * (rgb % 256) AS BIGINT) AS luma_x1000,
               TRUE AS decode_ok
        FROM px ORDER BY media_id, frame_idx"""),
      doc = "real frame sampling: animated-GIF render + every-2nd-frame ImageIO decode, closed-form luma"),

    // ------------------------------------------------------------------
    // m12: container-metadata sniffing WITHOUT decode — the "don't
    // decode what you don't need" rule that makes multimodal curation
    // tractable at 100 TB: filtering/routing on dimensions or format
    // must cost a few header bytes per asset, not a full image decode
    // (m08's ImageIO path costs ~1000× more than reading IHDR). The
    // sniff is PURE native expressions over the binary column — PNG
    // signature check plus big-endian IHDR fields via
    // conv(hex(substring(bytes, off, len)), 16, 10) — all codegen'd,
    // zero UDF, zero mapPartitions in the metadata stage (the only
    // imperative code is the executor-side test-asset render, m08's).
    // Every 3rd asset is corrupted (leading byte dropped) to prove the
    // signature guard: fields report -1 instead of garbage. Oracle is
    // closed-form from the render parameters; the real ImageIO writer's
    // IHDR must carry bit depth 8 / color type 2 (truecolor) for the
    // hash to match.
    QueryDef(
      "m12_metadata_sniff",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 0)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 64 + 16).cast("int").as("w"),
            ($"n_chars" * 7 % 48 + 16).cast("int").as("h"),
            pmod(pmod($"doc_id", lit(16777216L)) * 2654435761L,
              lit(16777216L)).cast("int").as("rgb"))
          .as[(Long, Int, Int, Int)]
        val assets = rows.mapPartitions(_.map { case (id, w, h, rgb) =>
            val png = MediaPipeline.renderSolidPng(w, h, rgb)
            (id, if (id % 3 == 0) png.drop(1) else png)
          }).toDF("media_id", "png")
        def be(off: Int, len: Int) =
          expr(s"CAST(conv(hex(substring(png, $off, $len)), 16, 10) AS BIGINT)")
        assets.select($"media_id",
            (hex(expr("substring(png, 1, 8)")) === "89504E470D0A1A0A")
              .as("sig_ok"),
            be(17, 4).as("w0"), be(21, 4).as("h0"),
            be(25, 1).as("d0"), be(26, 1).as("c0"))
          .select($"media_id", $"sig_ok",
            when($"sig_ok", $"w0").otherwise(lit(-1L)).as("width"),
            when($"sig_ok", $"h0").otherwise(lit(-1L)).as("height"),
            when($"sig_ok", $"d0").otherwise(lit(-1L)).as("bit_depth"),
            when($"sig_ok", $"c0").otherwise(lit(-1L)).as("color_type"))
          .orderBy($"media_id")
      },
      Some("""
        WITH px AS (
          SELECT doc_id AS media_id,
                 CAST(n_chars % 64 + 16 AS BIGINT) AS w,
                 CAST(n_chars * 7 % 48 + 16 AS BIGINT) AS h
          FROM documents WHERE doc_id % 20 = 0)
        SELECT media_id,
               media_id % 3 <> 0 AS sig_ok,
               CASE WHEN media_id % 3 <> 0 THEN w ELSE -1 END AS width,
               CASE WHEN media_id % 3 <> 0 THEN h ELSE -1 END AS height,
               CAST(CASE WHEN media_id % 3 <> 0 THEN 8 ELSE -1 END AS BIGINT) AS bit_depth,
               CAST(CASE WHEN media_id % 3 <> 0 THEN 2 ELSE -1 END AS BIGINT) AS color_type
        FROM px ORDER BY media_id"""),
      doc = "container-metadata sniff: PNG signature + big-endian IHDR fields as pure native expressions over binary, no decode; corrupt assets guarded"),

    // ------------------------------------------------------------------
    // m13: RIFF/WAVE metadata sniff — m12's little-endian twin, because
    // real container formats split about evenly between byte orders
    // (PNG/JPEG big-endian, RIFF/AVI/WAV little-endian) and an engine
    // claiming header-level routing must do both. Little-endian integers
    // come out of the same native toolbox with the byte order reversed
    // in the hex concatenation: conv(concat(hex(b_hi)..hex(b_lo)), 16,
    // 10) over per-byte substrings — still zero UDF, zero decode. The
    // sniff reads the PCM fmt chunk (audio format, channels, sample
    // rate, bit depth) and the data-chunk length, each checkable
    // closed-form against the render parameters (mono 16-bit PCM,
    // data_len = 2·n_samples). Corruption guard as in m12 (leading
    // byte dropped for media_id ≡ 1 mod 3 → -1 fields).
    QueryDef(
      "m13_wav_metadata_sniff",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 2)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 2000 + 500).cast("int").as("n"),
            (lit(8000) + ($"n_chars" % 8) * 1000).cast("int").as("rate"),
            (($"doc_id" % 1000) * 16 + 500).cast("int").as("amp"),
            ($"n_chars" % 37 + 5).cast("int").as("p"))
          .as[(Long, Int, Int, Int, Int)]
        val assets = rows.mapPartitions(_.map { case (id, n, rate, amp, p) =>
            val wav = MediaPipeline.renderSquareWav(n, rate, amp, p)
            (id, if (id % 3 == 1) wav.drop(1) else wav)
          }).toDF("media_id", "wav")
        def le(off: Int, len: Int) = expr(
          (off + len - 1).to(off, -1)
            .map(i => s"hex(substring(wav, $i, 1))")
            .mkString("CAST(conv(concat(", ", ", "), 16, 10) AS BIGINT)"))
        assets.select($"media_id",
            (hex(expr("substring(wav, 1, 4)")) === "52494646" &&
              hex(expr("substring(wav, 9, 8)")) === "57415645666D7420")
              .as("riff_ok"),
            le(21, 2).as("f0"), le(23, 2).as("c0"), le(25, 4).as("r0"),
            le(35, 2).as("b0"), le(41, 4).as("d0"))
          .select($"media_id", $"riff_ok",
            when($"riff_ok", $"f0").otherwise(lit(-1L)).as("audio_format"),
            when($"riff_ok", $"c0").otherwise(lit(-1L)).as("channels"),
            when($"riff_ok", $"r0").otherwise(lit(-1L)).as("sample_rate"),
            when($"riff_ok", $"b0").otherwise(lit(-1L)).as("bits_per_sample"),
            when($"riff_ok", $"d0").otherwise(lit(-1L)).as("data_len"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 CAST((n_chars % 2000) + 500 AS BIGINT) AS n,
                 CAST(8000 + (n_chars % 8) * 1000 AS BIGINT) AS rate
          FROM documents WHERE doc_id % 20 = 2)
        SELECT media_id,
               media_id % 3 <> 1 AS riff_ok,
               CAST(CASE WHEN media_id % 3 <> 1 THEN 1 ELSE -1 END AS BIGINT) AS audio_format,
               CAST(CASE WHEN media_id % 3 <> 1 THEN 1 ELSE -1 END AS BIGINT) AS channels,
               CASE WHEN media_id % 3 <> 1 THEN rate ELSE -1 END AS sample_rate,
               CAST(CASE WHEN media_id % 3 <> 1 THEN 16 ELSE -1 END AS BIGINT) AS bits_per_sample,
               CASE WHEN media_id % 3 <> 1 THEN n * 2 ELSE -1 END AS data_len
        FROM a ORDER BY media_id"""),
      doc = "RIFF/WAVE metadata sniff: little-endian fmt/data fields via reversed hex concatenation, native expressions only; corrupt assets guarded"),

    // ------------------------------------------------------------------
    // m14: PERCEPTUAL AUDIO NEAR-DUP — m07's dHash story for the audio
    // modality, on the REAL decode path (m10's javax.sound pipeline):
    // executors render genuine WAVs, decode them, and fingerprint the
    // PCM stream with per-window zero-crossing counts — a
    // LOUDNESS-INVARIANT key (amplitude never enters), so the planted
    // re-encodes at ~half gain (amp/2+1, different bytes, different
    // peak) collide with their originals while signals with different
    // periods stay apart. Clusters are one 32-byte-key groupBy over the
    // map-only fingerprint (assets never shuffle; the m08-m11 seam),
    // and max_peak > min_peak in every reported cluster PROVES the
    // match crossed a gain change — the thing exact byte dedup (m05)
    // can never find. Oracle: the square wave's crossing structure has
    // a closed form ((hi−1)//p − (max(lo,1)−1)//p per window), so the
    // whole perceptual pipeline stays hash-checkable.
    QueryDef(
      "m14_audio_perceptual_dedup",
      (s, dir) => {
        import s.implicits._
        val base = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 4)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 2000 + 500).cast("int").as("n"),
            (($"doc_id" % 1000) * 16 + 500).cast("int").as("amp"),
            ($"n_chars" % 37 + 5).cast("int").as("p"))
        // plant modulus 100 (not 60): it divides ScaleBench's 10^10
        // idShift, so every replica plants the same re-encode density
        // and the weak-scaling row measures real cluster growth
        val reencoded = base.filter($"media_id" % 100 === 4)
          .select(($"media_id" + 5000000L).as("media_id"), $"n",
            (expr("amp div 2") + 1).cast("int").as("amp"), $"p")
        base.unionByName(reencoded)
          .as[(Long, Int, Int, Int)]
          .mapPartitions(_.map { case (id, n, amp, p) =>
            graft.sources.MediaPipeline.audioFingerprint(id,
              graft.sources.MediaPipeline.renderSquareWav(n, 8000, amp, p), 8)
          })
          .toDF()
          // the m13 convention: corrupt assets decode to fp="", peak=-1 —
          // never let them collapse into one bogus "cluster"
          .filter($"decode_ok")
          .groupBy($"fp")
          .agg(min($"media_id").as("keeper"),
            count(lit(1)).as("n_assets"),
            min($"peak").as("min_peak"), max($"peak").as("max_peak"))
          .filter($"n_assets" > 1)
          .select($"keeper", $"n_assets", $"min_peak", $"max_peak")
          .orderBy($"keeper")
      },
      Some("""
        WITH base AS (
          SELECT doc_id AS media_id,
                 (n_chars % 2000) + 500 AS n,
                 (doc_id % 1000) * 16 + 500 AS amp,
                 (n_chars % 37) + 5 AS p
          FROM documents WHERE doc_id % 20 = 4),
        assets AS (
          SELECT * FROM base
          UNION ALL
          SELECT media_id + 5000000, n, amp // 2 + 1, p
          FROM base WHERE media_id % 100 = 4),
        fps AS (
          SELECT media_id, amp,
                 array_to_string(list_transform(range(0, 8), w ->
                   CAST((((w + 1) * n) // 8 - 1) // p
                        - (CASE WHEN (w * n) // 8 = 0 THEN 0
                                ELSE ((w * n) // 8 - 1) // p END) AS VARCHAR)),
                   '-') AS fp
          FROM assets)
        SELECT MIN(media_id) AS keeper, COUNT(*) AS n_assets,
               CAST(MIN(amp) AS BIGINT) AS min_peak,
               CAST(MAX(amp) AS BIGINT) AS max_peak
        FROM fps GROUP BY fp HAVING COUNT(*) > 1
        ORDER BY keeper"""),
      doc = "perceptual audio near-dup: real decode + loudness-invariant per-window zero-crossing fingerprint; gain-changed re-encodes collide, byte dedup provably cannot find them"),

    // ------------------------------------------------------------------
    // m15: MP4/ISO-BMFF CONTAINER SNIFF — the third container format
    // after PNG (m12) and RIFF/WAVE (m13), and the first whose walk is
    // genuinely DYNAMIC: box offsets are not fixed (ISO 14496-12 says
    // "read the 4-byte big-endian size, skip to the next box"), so the
    // moov/mvhd fields are located from the PARSED ftyp size, not a
    // hardcoded offset — substring positions are column arithmetic,
    // still pure native expressions over the binary column (no UDF, no
    // decode; the m12/m13 PlanSpec lock extends to m15). Corrupt assets
    // (leading byte dropped, the m13 plant) fail the ftyp magic and are
    // guarded to -1/'' sentinels. Assets are REAL ISO-BMFF bytes
    // rendered executor-side (map-partition parallel, assets never
    // shuffle); oracle = the closed form of what was rendered.
    QueryDef(
      "m15_mp4_metadata_sniff",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 8)
          .select($"doc_id".as("media_id"),
            (($"n_chars" % 9 + 1) * 600).cast("int").as("ts"),
            (($"n_chars" % 2000 + 500) * 3).cast("int").as("dur"))
          .as[(Long, Int, Int)]
        val assets = rows.mapPartitions(_.map { case (id, ts, dur) =>
            val mp4 = MediaPipeline.renderMp4(ts, dur)
            (id, if (id % 3 == 1) mp4.drop(1) else mp4)
          }).toDF("media_id", "mp4")
        def be(pos: String, len: Int) = expr(
          s"CAST(conv(hex(substring(mp4, CAST($pos AS INT), $len)), 16, 10) AS BIGINT)")
        assets
          .withColumn("fsz", be("1", 4))
          .withColumn("ftyp_ok",
            hex(expr("substring(mp4, 5, 4)")) === "66747970" && $"fsz" >= 16L)
          .withColumn("box_ok", $"ftyp_ok" &&
            hex(expr("substring(mp4, CAST(fsz + 5 AS INT), 4)")) === "6D6F6F76" &&
            hex(expr("substring(mp4, CAST(fsz + 13 AS INT), 4)")) === "6D766864")
          .select($"media_id", $"box_ok",
            when($"ftyp_ok", expr("decode(substring(mp4, 9, 4), 'UTF-8')"))
              .otherwise(lit("")).as("major_brand"),
            when($"ftyp_ok", be("13", 4)).otherwise(lit(-1L)).as("minor_version"),
            when($"box_ok", be("fsz + 1", 4)).otherwise(lit(-1L)).as("moov_size"),
            when($"box_ok", be("fsz + 29", 4)).otherwise(lit(-1L)).as("timescale"),
            when($"box_ok", be("fsz + 33", 4)).otherwise(lit(-1L)).as("duration"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 CAST((n_chars % 9 + 1) * 600 AS BIGINT) AS ts,
                 CAST((n_chars % 2000 + 500) * 3 AS BIGINT) AS dur
          FROM documents WHERE doc_id % 20 = 8)
        SELECT media_id,
               media_id % 3 <> 1 AS box_ok,
               CASE WHEN media_id % 3 <> 1 THEN 'isom' ELSE '' END AS major_brand,
               CAST(CASE WHEN media_id % 3 <> 1 THEN 512 ELSE -1 END AS BIGINT)
                 AS minor_version,
               CAST(CASE WHEN media_id % 3 <> 1 THEN 116 ELSE -1 END AS BIGINT)
                 AS moov_size,
               CASE WHEN media_id % 3 <> 1 THEN ts ELSE -1 END AS timescale,
               CASE WHEN media_id % 3 <> 1 THEN dur ELSE -1 END AS duration
        FROM a ORDER BY media_id"""),
      doc = "MP4/ISO-BMFF container sniff: dynamic big-endian box walk (ftyp size locates moov/mvhd) as pure native expressions over binary; corrupt assets guarded"),

    // ------------------------------------------------------------------
    // m16: VIDEO TRACK SNIFF — the video-modality completion of the
    // container family (VERDICT r9 missing #3): m15 walks one level
    // (ftyp → moov/mvhd); m16 descends THREE levels of dynamic
    // nesting — moov → trak (located by the PARSED mvhd size) →
    // tkhd (16.16 fixed-point width/height) and trak → mdia → mdhd
    // (media timescale/duration) — every offset column arithmetic over
    // parsed big-endian box sizes, still pure native expressions (the
    // m12/m13/m15 PlanSpec lock extends). This is the walk a video
    // ingest pipeline runs to route/resize/frame-sample BEFORE any
    // codec is touched: resolution and media clock come from the
    // container alone. Assets are real ISO-BMFF bytes rendered
    // executor-side; corrupt plants (leading byte dropped) fail the
    // ftyp magic and emit sentinels.
    QueryDef(
      "m16_video_track_sniff",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 12)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 640 + 16).cast("int").as("w"),
            ($"n_chars" * 3 % 480 + 16).cast("int").as("h"),
            (lit(24000) + ($"n_chars" % 5) * 6000).cast("int").as("mts"),
            (($"n_chars" % 2000 + 500) * 1001).cast("int").as("mdur"))
          .as[(Long, Int, Int, Int, Int)]
        val assets = rows.mapPartitions(_.map { case (id, w, h, mts, mdur) =>
            val mp4 = MediaPipeline.renderMp4Video(1000, 5000, w, h, mts, mdur)
            (id, if (id % 3 == 2) mp4.drop(1) else mp4)
          }).toDF("media_id", "mp4")
        def be(pos: String, len: Int) = expr(
          s"CAST(conv(hex(substring(mp4, CAST($pos AS INT), $len)), 16, 10) AS BIGINT)")
        assets
          .withColumn("fsz", be("1", 4))
          .withColumn("ftyp_ok",
            hex(expr("substring(mp4, 5, 4)")) === "66747970" && $"fsz" >= 16L)
          .withColumn("moov_ok", $"ftyp_ok" &&
            hex(expr("substring(mp4, CAST(fsz + 5 AS INT), 4)")) === "6D6F6F76" &&
            hex(expr("substring(mp4, CAST(fsz + 13 AS INT), 4)")) === "6D766864")
          .withColumn("msz", be("fsz + 9", 4))
          .withColumn("trk", $"fsz" + $"msz" + lit(9L))
          .withColumn("trak_ok", $"moov_ok" &&
            hex(expr("substring(mp4, CAST(trk + 4 AS INT), 4)")) === "7472616B" &&
            hex(expr("substring(mp4, CAST(trk + 12 AS INT), 4)")) === "746B6864")
          .withColumn("tsz", be("trk + 8", 4))
          .withColumn("mda", $"trk" + lit(8L) + $"tsz")
          .withColumn("box_ok", $"trak_ok" &&
            hex(expr("substring(mp4, CAST(mda + 4 AS INT), 4)")) === "6D646961" &&
            hex(expr("substring(mp4, CAST(mda + 12 AS INT), 4)")) === "6D646864")
          .select($"media_id", $"box_ok",
            when($"box_ok", be("trk + 28", 4)).otherwise(lit(-1L)).as("track_id"),
            when($"box_ok", expr(s"${beSql("trk + 92", 4)} div 65536"))
              .otherwise(lit(-1L)).as("width"),
            when($"box_ok", expr(s"${beSql("trk + 96", 4)} div 65536"))
              .otherwise(lit(-1L)).as("height"),
            when($"box_ok", be("mda + 28", 4)).otherwise(lit(-1L))
              .as("media_timescale"),
            when($"box_ok", be("mda + 32", 4)).otherwise(lit(-1L))
              .as("media_duration"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 CAST(n_chars % 640 + 16 AS BIGINT) AS w,
                 CAST(n_chars * 3 % 480 + 16 AS BIGINT) AS h,
                 CAST(24000 + (n_chars % 5) * 6000 AS BIGINT) AS mts,
                 CAST((n_chars % 2000 + 500) * 1001 AS BIGINT) AS mdur
          FROM documents WHERE doc_id % 20 = 12)
        SELECT media_id,
               media_id % 3 <> 2 AS box_ok,
               CAST(CASE WHEN media_id % 3 <> 2 THEN 1 ELSE -1 END AS BIGINT)
                 AS track_id,
               CASE WHEN media_id % 3 <> 2 THEN w ELSE -1 END AS width,
               CASE WHEN media_id % 3 <> 2 THEN h ELSE -1 END AS height,
               CASE WHEN media_id % 3 <> 2 THEN mts ELSE -1 END
                 AS media_timescale,
               CASE WHEN media_id % 3 <> 2 THEN mdur ELSE -1 END
                 AS media_duration
        FROM a ORDER BY media_id"""),
      doc = "video track sniff: three-level dynamic ISO-BMFF descent (moov -> trak -> tkhd/mdia/mdhd) via parsed box sizes, 16.16 fixed-point dimensions, pure native expressions; corrupt assets guarded"),

    // ------------------------------------------------------------------
    // m17: VIDEO PERCEPTUAL NEAR-DUP — m14's re-encode-collision story
    // for the frame-sequence modality, on REAL decode (m11's animated-GIF
    // frame reader, stride 1): the fingerprint is the sequence of
    // CONSECUTIVE-FRAME LUMA DIFFERENCES, which a global brightness shift
    // cannot move — adding d to every channel of every frame adds exactly
    // 1000·d to each frame's luma_x1000 (Rec.601 weights sum to 1000), so
    // the temporal gradient is bit-identical while every frame's bytes
    // (and md5) differ. Planted "re-encodes" (one per media_id % 100 == 7
    // base asset, all channels +((id % 30)+10)) therefore collide with
    // their originals and byte-level dedup provably cannot find them;
    // luma_spread_x1000 = 1000·delta in the output is the proof the
    // cluster spans distinct brightness levels. The decode_ok guard
    // (the m13/m14 convention) filters failed decodes BEFORE the
    // fingerprint groupBy; unlike m12/m13, m17 plants no in-query
    // corrupt assets — the ×100 sweep showed truncated GIF streams can
    // PARTIALLY decode (ImageIO resyncs to 1-2 garbage frames with no
    // error), so corrupt-asset behavior is content-dependent and has no
    // closed-form oracle. The guard itself is unit-tested at the decode
    // level (OperatorSpec: a truncated fixture collapses to the
    // sentinel), and the fingerprint transform is hardened to tolerate
    // sub-2-frame groups (Spark's sequence(2, 1) is DESCENDING, not
    // empty — it would index out of bounds). Scale shape: render+decode
    // is mapPartitions-parallel and assets never shuffle — only
    // (media_id, frame luma) rows do (≤ 8 per asset), then one
    // fingerprint groupBy whose per-key population is the planted
    // cluster size. The plant modulus 100 divides ScaleBench's 10^10
    // idShift, so weak-scaling replicas reproduce the base's cluster
    // density exactly.
    QueryDef(
      "m17_video_perceptual_dedup",
      (s, dir) => {
        import s.implicits._
        val base = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 7)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 6 + 3).cast("int").as("nf"),
            lit(0).cast("int").as("delta"))
        val reencoded = base.filter($"media_id" % 100 === 7)
          .select(($"media_id" + 5000000L).as("media_id"), $"nf",
            ($"media_id" % 30 + 10).cast("int").as("delta"))
        base.unionByName(reencoded)
          .as[(Long, Int, Int)]
          .mapPartitions(_.flatMap { case (id, nf, delta) =>
            // channels in [0,199] so +delta (<= 39) can never clamp; the
            // COLOR STRUCTURE derives from the canonical (pre-re-encode)
            // id — a re-encode is the same footage, brighter
            val canonical = if (delta > 0) id - 5000000L else id
            // md5-derived channels, NOT an arithmetic progression: any
            // AP-in-j color hash (even multiplied) steps each channel by
            // one of ~2 values per frame, so the DIFF fingerprint
            // collapses to ~8 combos per step and unrelated videos merge
            // at corpus scale (the ×10 sweep measured 145 clusters where
            // ~500 planted pairs exist). md5 per (canonical, frame) makes
            // consecutive-frame diffs effectively uniform over ±199k
            // luma units — accidental collisions vanish at 500k docs.
            // JVM MD5 == SQL md5 (the hyperplaneBands precedent), so the
            // oracle reproduces the channels exactly.
            val md = java.security.MessageDigest.getInstance("MD5")
            val colors = (0 until nf).map { j =>
              val hex = md.digest(s"$canonical:$j".getBytes("UTF-8"))
                .map("%02x".format(_)).mkString
              def ch(o: Int) = Integer.parseInt(hex.substring(o, o + 2), 16) % 200
              (ch(0) + delta << 16) | (ch(2) + delta << 8) | (ch(4) + delta)
            }
            MediaPipeline.sampleFrames(id,
              MediaPipeline.renderGifFrames(24, 16, colors), stride = 1)
          })
          .toDF()
          .filter($"decode_ok")
          .groupBy($"media_id")
          .agg(min($"n_frames").as("nf"),
            sort_array(collect_list(struct($"frame_idx", $"luma_x1000")))
              .as("fl"))
          .select($"media_id", $"nf",
            expr("element_at(fl, 1).luma_x1000").as("luma0"),
            concat($"nf".cast("string"), lit("-"), expr(
              """concat_ws(',', transform(
                   filter(sequence(1, size(fl)), i -> i >= 2),
                   i -> CAST(element_at(fl, i).luma_x1000
                             - element_at(fl, i - 1).luma_x1000 AS STRING)))"""))
              .as("fp"))
          .groupBy($"fp")
          .agg(min($"media_id").as("keeper"),
            count(lit(1)).as("n_assets"),
            min($"nf").cast("long").as("n_frames"),
            (max($"luma0") - min($"luma0")).as("luma_spread_x1000"))
          .filter($"n_assets" > 1)
          .select($"keeper", $"n_assets", $"n_frames", $"luma_spread_x1000")
          .orderBy($"keeper")
      },
      Some("""
        WITH base AS (
          SELECT doc_id AS media_id, doc_id AS canonical,
                 (n_chars % 6) + 3 AS nf, 0 AS delta
          FROM documents WHERE doc_id % 20 = 7),
        assets AS (
          SELECT * FROM base
          UNION ALL
          SELECT media_id + 5000000, media_id, nf, (media_id % 30) + 10
          FROM base WHERE media_id % 100 = 7),
        frames AS (
          SELECT media_id, canonical, nf, delta,
                 unnest(range(0, nf)) AS j
          FROM assets),
        hx AS (
          SELECT media_id, nf, j, delta,
                 md5(canonical || ':' || j) AS hex
          FROM frames),
        lumas AS (
          SELECT media_id, nf, j,
                 299 * (CAST(concat('0x', substr(hex, 1, 2)) AS INTEGER)
                          % 200 + delta)
                 + 587 * (CAST(concat('0x', substr(hex, 3, 2)) AS INTEGER)
                          % 200 + delta)
                 + 114 * (CAST(concat('0x', substr(hex, 5, 2)) AS INTEGER)
                          % 200 + delta) AS luma
          FROM hx),
        seqs AS (
          SELECT media_id, nf, list(luma ORDER BY j) AS ls
          FROM lumas GROUP BY media_id, nf),
        fps AS (
          SELECT media_id, nf, ls[1] AS luma0,
                 CAST(nf AS VARCHAR) || '-' || array_to_string(
                   list_transform(range(2, nf + 1),
                     i -> CAST(ls[i] - ls[i-1] AS VARCHAR)), ',') AS fp
          FROM seqs)
        SELECT MIN(media_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_assets,
               CAST(MIN(nf) AS BIGINT) AS n_frames,
               CAST(MAX(luma0) - MIN(luma0) AS BIGINT) AS luma_spread_x1000
        FROM fps GROUP BY fp HAVING COUNT(*) > 1
        ORDER BY keeper"""),
      doc = "video perceptual near-dup: real animated-GIF frame decode + brightness-invariant temporal-gradient fingerprint; brightness-shifted re-encodes collide, byte dedup provably cannot find them"),

    // ------------------------------------------------------------------
    // m18: MP3/ID3v2 SNIFF — the fourth container in the sniff family,
    // chosen because it completes the DECODING-IDIOM coverage rather
    // than just adding a format: PNG/MP4 read plain big-endian integers
    // (m12/m15), WAVE plain little-endian (m13); ID3v2 sizes are
    // SYNCSAFE base-128 integers (7 data bits per byte, high bit
    // forbidden — id3.org §3.1, so a 28-bit size spans 4 bytes with
    // weights 2^21/2^14/2^7/1), and the MPEG audio frame header packs
    // its fields at SUB-BYTE granularity (bitrate index = high nibble
    // of byte 3, sample-rate index = bits 3-2). The sniff therefore
    // does positional base-128 arithmetic, div/mod bit-field
    // extraction, and table lookups (element_at over a 14-entry literal
    // bitrate array) — all still pure native expressions over the
    // binary column, zero UDF, zero decode (the m12/m13/m15/m16
    // PlanSpec lock extends to m18). The first audio frame is located
    // DYNAMICALLY from the parsed syncsafe tag size (m15's box-walk
    // rule: offsets are column arithmetic), the syncsafe validity bits
    // (every size byte < 0x80) are part of the magic check, and the
    // derived frame_len = ⌊144000·bitrate/sample_rate⌋ is the byte
    // count a router uses to skip frame-to-frame without decoding.
    // Corrupt assets (leading byte dropped, the m12 plant) fail the ID3
    // magic → -1/'false' sentinels.
    QueryDef(
      "m18_mp3_metadata_sniff",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 6)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 200 + 50).cast("int").as("tagsz"),
            ($"n_chars" % 14 + 1).cast("int").as("bi"),
            ($"n_chars" % 3).cast("int").as("si"))
          .as[(Long, Int, Int, Int)]
        val assets = rows.mapPartitions(_.map { case (id, tagsz, bi, si) =>
            val mp3 = MediaPipeline.renderMp3(tagsz, bi, si)
            (id, if (id % 3 == 0) mp3.drop(1) else mp3)
          }).toDF("media_id", "mp3")
        // one byte at a (possibly computed) 1-based offset, as BIGINT
        def u8(pos: String): String =
          s"CAST(conv(hex(substring(mp3, CAST($pos AS INT), 1)), 16, 10) AS BIGINT)"
        assets
          .withColumn("id3_ok", expr(
            s"""hex(substring(mp3, 1, 3)) = '494433'
                AND ${u8("7")} < 128 AND ${u8("8")} < 128
                AND ${u8("9")} < 128 AND ${u8("10")} < 128"""))
          .withColumn("tsz", expr(
            s"""CASE WHEN id3_ok THEN ${u8("7")} * 2097152 + ${u8("8")} * 16384
                     + ${u8("9")} * 128 + ${u8("10")} ELSE -1 END"""))
          .withColumn("mp3_ok", expr(
            s"id3_ok AND ${u8("tsz + 11")} = 255 AND ${u8("tsz + 12")} = 251"))
          .withColumn("b3", expr(
            s"CASE WHEN mp3_ok THEN ${u8("tsz + 13")} ELSE 0 END"))
          .withColumn("bitrate_kbps", expr(
            """CASE WHEN mp3_ok THEN element_at(
                 array(32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L,
                       128L, 160L, 192L, 224L, 256L, 320L),
                 CAST(b3 DIV 16 AS INT))
               ELSE -1L END"""))
          .withColumn("sample_rate", expr(
            """CASE WHEN mp3_ok THEN element_at(
                 array(44100L, 48000L, 32000L),
                 CAST((b3 DIV 4) % 4 AS INT) + 1)
               ELSE -1L END"""))
          .select($"media_id", $"mp3_ok",
            expr(s"CASE WHEN mp3_ok THEN ${u8("4")} ELSE -1 END")
              .as("tag_version"),
            expr("CASE WHEN mp3_ok THEN tsz ELSE -1 END").as("tag_size"),
            $"bitrate_kbps", $"sample_rate",
            expr("""CASE WHEN mp3_ok THEN (144000 * bitrate_kbps) DIV sample_rate
                    ELSE -1 END""").as("frame_len"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 CAST(n_chars % 200 + 50 AS BIGINT) AS tag_size,
                 CAST(n_chars % 14 + 1 AS INTEGER) AS bi,
                 CAST(n_chars % 3 AS INTEGER) AS si,
                 doc_id % 3 <> 0 AS ok
          FROM documents WHERE doc_id % 20 = 6),
        b AS (
          SELECT media_id, ok, tag_size,
                 CAST(list_extract([32, 40, 48, 56, 64, 80, 96, 112,
                                    128, 160, 192, 224, 256, 320], bi)
                      AS BIGINT) AS br,
                 CAST(list_extract([44100, 48000, 32000], si + 1)
                      AS BIGINT) AS sr
          FROM a)
        SELECT media_id, ok AS mp3_ok,
               CAST(CASE WHEN ok THEN 3 ELSE -1 END AS BIGINT) AS tag_version,
               CASE WHEN ok THEN tag_size ELSE -1 END AS tag_size,
               CASE WHEN ok THEN br ELSE -1 END AS bitrate_kbps,
               CASE WHEN ok THEN sr ELSE -1 END AS sample_rate,
               CASE WHEN ok THEN (144000 * br) // sr ELSE -1 END AS frame_len
        FROM b ORDER BY media_id"""),
      doc = "MP3/ID3v2 sniff: syncsafe base-128 tag size + sub-byte frame-header bit fields + literal-array bitrate lookup, pure native expressions over binary, no decode; corrupt assets guarded"),

    // ------------------------------------------------------------------
    // m19: JPEG/EXIF SNIFF — the most common real-world image container,
    // and two decoding idioms none of m12-m18 has: (a) SWITCHABLE
    // endianness — the TIFF body inside APP1 declares its own byte
    // order ('II' little / 'MM' big) while the JPEG layer around it
    // stays big-endian, so one walk switches conventions mid-stream on
    // a per-row data value; (b) a TAG-DIRECTORY SCAN — IFD0 entries are
    // (tag, type, count, value) records located by a parsed entry
    // count, searched by tag id (0x0112 Orientation, 0x0100/0x0101
    // dimensions) with filter()/transform() higher-order functions, not
    // fixed offsets. The SOF frame header (true encoded dimensions +
    // component count, written by the REAL ImageIO encoder) is located
    // by a bounded aggregate() fold over the marker chain — the m15
    // box-walk generalized to "skip unknown segments until a SOF
    // marker". All pure native expressions over the binary column, zero
    // UDF, zero decode (the m12-m18 PlanSpec lock extends to m19).
    // Corrupt assets (leading byte dropped) fail the SOI magic →
    // sentinels.
    QueryDef(
      "m19_jpeg_exif_sniff",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 16)
          .select($"doc_id".as("media_id"),
            ($"n_chars" % 200 + 16).cast("int").as("w"),
            ($"n_chars" * 7 % 150 + 16).cast("int").as("h"),
            ($"n_chars" % 8 + 1).cast("int").as("ori"),
            ($"doc_id" % 2 === 1).as("be"),
            ($"n_chars" % 4 === 0).as("gray"))
          .as[(Long, Int, Int, Int, Boolean, Boolean)]
        val assets = rows.mapPartitions(_.map {
            case (id, w, h, ori, be, gray) =>
              val jpg = MediaPipeline.renderJpegExif(w, h, ori, be, gray)
              (id, if (id % 3 == 1) jpg.drop(1) else jpg)
          }).toDF("media_id", "jpg")
        // one byte at a (possibly computed) 1-based offset, as BIGINT
        def u8(pos: String): String =
          s"CAST(conv(hex(substring(jpg, CAST(($pos) AS INT), 1)), 16, 10) AS BIGINT)"
        // JPEG-layer integers: always big-endian
        def be16(pos: String): String =
          s"(256 * ${u8(pos)} + ${u8(s"($pos) + 1")})"
        // TIFF-layer integers: byte order from the per-row `le` column
        def eu16(pos: String): String =
          s"""(CASE WHEN le THEN ${u8(pos)} + 256 * ${u8(s"($pos) + 1")}
                    ELSE 256 * ${u8(pos)} + ${u8(s"($pos) + 1")} END)"""
        def eu32(pos: String): String =
          s"""(CASE WHEN le THEN ${eu16(pos)} + 65536 * ${eu16(s"($pos) + 2")}
                    ELSE 65536 * ${eu16(pos)} + ${eu16(s"($pos) + 2")} END)"""
        assets
          .withColumn("hdr_ok", expr(
            """hex(substring(jpg, 1, 2)) = 'FFD8'
               AND hex(substring(jpg, 3, 2)) = 'FFE1'
               AND hex(substring(jpg, 7, 6)) = '457869660000'"""))
          .withColumn("endian", when($"hdr_ok",
            expr("decode(substring(jpg, 13, 2), 'UTF-8')")).otherwise(""))
          .withColumn("le", $"endian" === "II")
          .withColumn("tiff_ok", expr(s"""hdr_ok
            AND endian IN ('II', 'MM') AND ${eu16("15")} = 42"""))
          .withColumn("ifd", expr(
            s"CASE WHEN tiff_ok THEN 13 + ${eu32("17")} ELSE -1 END"))
          .withColumn("nent", expr(
            s"CASE WHEN tiff_ok THEN ${eu16("ifd")} ELSE -1 END"))
          // the tag directory, scanned (not offset-assumed): every IFD0
          // entry's (tag, short value, long value), searchable by tag
          .withColumn("ents", expr(s"""
            CASE WHEN tiff_ok AND nent BETWEEN 1 AND 64 THEN
              transform(sequence(0, CAST(nent AS INT) - 1),
                i -> struct(${eu16("ifd + 2 + 12 * i")} AS tag,
                            ${eu16("ifd + 2 + 12 * i + 8")} AS v16,
                            ${eu32("ifd + 2 + 12 * i + 8")} AS v32))
            ELSE NULL END"""))
          // marker chain: skip segments (BE length at pos+2) until a
          // SOF0/1/2 marker; found position is encoded as -(pos)-10 so
          // the fold freezes, -1 = lost sync, still-positive = not found
          .withColumn("sofp", expr(s"""
            CASE WHEN hdr_ok THEN
              aggregate(sequence(1, 16), CAST(5 + ${be16("5")} AS BIGINT),
                (pos, x) -> CASE
                  WHEN pos < 0 THEN pos
                  WHEN ${u8("pos")} <> 255 THEN CAST(-1 AS BIGINT)
                  WHEN ${u8("pos + 1")} IN (192, 193, 194) THEN -pos - 10
                  ELSE pos + 2 + ${be16("pos + 2")} END)
            ELSE -1 END"""))
          .withColumn("sof", expr(
            "CASE WHEN sofp <= -11 THEN -sofp - 10 ELSE CAST(-1 AS BIGINT) END"))
          .withColumn("sniff_ok", $"tiff_ok" && $"sof" > 0L)
          .select($"media_id", $"sniff_ok", $"endian",
            expr("COALESCE(filter(ents, e -> e.tag = 274)[0].v16, -1)")
              .as("orientation"),
            expr("COALESCE(filter(ents, e -> e.tag = 256)[0].v32, -1)")
              .as("exif_width"),
            expr("COALESCE(filter(ents, e -> e.tag = 257)[0].v32, -1)")
              .as("exif_height"),
            expr(s"CASE WHEN sniff_ok THEN ${be16("sof + 7")} ELSE -1 END")
              .as("sof_width"),
            expr(s"CASE WHEN sniff_ok THEN ${be16("sof + 5")} ELSE -1 END")
              .as("sof_height"),
            expr(s"CASE WHEN sniff_ok THEN ${u8("sof + 9")} ELSE -1 END")
              .as("n_components"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 CAST(n_chars % 200 + 16 AS BIGINT) AS w,
                 CAST(n_chars * 7 % 150 + 16 AS BIGINT) AS h,
                 CAST(n_chars % 8 + 1 AS BIGINT) AS ori,
                 doc_id % 2 = 1 AS be,
                 n_chars % 4 = 0 AS gray,
                 doc_id % 3 <> 1 AS ok
          FROM documents WHERE doc_id % 20 = 16)
        SELECT media_id, ok AS sniff_ok,
               CASE WHEN ok THEN (CASE WHEN be THEN 'MM' ELSE 'II' END)
                    ELSE '' END AS endian,
               CASE WHEN ok THEN ori ELSE -1 END AS orientation,
               CASE WHEN ok THEN w ELSE -1 END AS exif_width,
               CASE WHEN ok THEN h ELSE -1 END AS exif_height,
               CASE WHEN ok THEN w ELSE -1 END AS sof_width,
               CASE WHEN ok THEN h ELSE -1 END AS sof_height,
               CAST(CASE WHEN ok THEN (CASE WHEN gray THEN 1 ELSE 3 END)
                    ELSE -1 END AS BIGINT) AS n_components
        FROM a ORDER BY media_id"""),
      doc = "JPEG/EXIF sniff: per-row switchable TIFF endianness (II/MM) inside a big-endian JPEG marker walk, tag-directory scan via higher-order functions, SOF located by a bounded aggregate fold over unknown segments — pure native expressions, zero decode; corrupt assets guarded"),

    // ------------------------------------------------------------------
    // m20: AUDIO FRAME FEATURE EXTRACTION + VAD GATE — the framing step
    // every speech pipeline runs before anything else (VAD, diarization,
    // ASR features): decode once per asset (real javax.sound WAV parse,
    // m10's path), split the PCM stream into non-overlapping 160-sample
    // frames (20 ms at 8 kHz, trailing partial dropped), and emit one
    // row per frame with integral energy (Σs²) and in-frame
    // zero-crossings plus the half-peak-energy VAD verdict — the
    // audio analog of m11's frame sampling, completing the brief's
    // decode → feature-extract → frame-sample progression for the audio
    // modality. Frames carry NO cross-frame state, so the expansion is
    // map-parallel per asset (one flatMap, no shuffle before the output
    // sort) and any executor can recompute any frame — the property
    // that lets 100 TB of audio shard freely. The gated-square fixture
    // (speech-then-silence) gives every feature an exact closed form:
    // active samples per frame clamp(na − s, 0, F), energy active·A²,
    // crossings the multiples of the period inside the voiced span,
    // voiced ⇔ 2·active > F. Every 5th asset is corrupted (leading
    // byte dropped) to prove undecodable bytes surface as sentinel rows
    // instead of vanishing. % 20 == 5 keeps assets disjoint from
    // m08-m19.
    QueryDef(
      "m20_audio_frame_features",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 5)
          .select($"doc_id".as("media_id"),
            (($"n_chars" % 1500) + 640).cast("int").as("n"),
            (($"doc_id" % 900) * 16 + 800).cast("int").as("amp"),
            (($"n_chars" % 23) + 4).cast("int").as("p"),
            // every 5th asset OF THE GROUP (doc_id ≡ 5 mod 20 is always
            // divisible by 5, so the index within the group decides)
            (expr("doc_id div 20") % 5 === 0).as("corrupt"))
          .as[(Long, Int, Int, Int, Boolean)]
        rows.mapPartitions(_.flatMap { case (id, n, amp, p, corrupt) =>
            val na = n * ((id % 3).toInt + 1) / 4
            val wav = graft.sources.MediaPipeline
              .renderGatedSquareWav(n, na, 8000, amp, p)
            val bytes = if (corrupt) wav.drop(1) else wav
            graft.sources.MediaPipeline.frameAudio(id, bytes, frameLen = 160)
          })
          .toDF()
          .select($"media_id", $"n_frames", $"frame_idx", $"energy",
            $"zero_crossings", $"voiced", $"decode_ok")
          .orderBy($"media_id", $"frame_idx")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 (n_chars % 1500) + 640 AS n,
                 (doc_id % 900) * 16 + 800 AS amp,
                 (n_chars % 23) + 4 AS p,
                 ((n_chars % 1500) + 640) * ((doc_id % 3) + 1) // 4 AS na,
                 (doc_id // 20) % 5 = 0 AS corrupt
          FROM documents WHERE doc_id % 20 = 5),
        frames AS (
          SELECT media_id, amp, p, na, n // 160 AS n_frames,
                 unnest(range(0, n // 160)) AS f
          FROM a WHERE NOT corrupt),
        feat AS (
          SELECT media_id, n_frames, f,
                 GREATEST(0, LEAST(160, na - f * 160)) AS active,
                 GREATEST(0, (LEAST(f * 160 + 160, na) - 1) // p
                             - (f * 160) // p) AS zc,
                 amp
          FROM frames)
        SELECT media_id, CAST(n_frames AS INTEGER) AS n_frames,
               CAST(f AS INTEGER) AS frame_idx,
               CAST(active * amp * amp AS BIGINT) AS energy,
               CAST(zc AS BIGINT) AS zero_crossings,
               2 * active > 160 AS voiced,
               TRUE AS decode_ok
        FROM feat
        UNION ALL
        SELECT media_id, CAST(-1 AS INTEGER), CAST(-1 AS INTEGER),
               CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), FALSE, FALSE
        FROM a WHERE corrupt
        ORDER BY media_id, frame_idx"""),
      doc = "audio frame feature extraction + VAD gate: real WAV decode once per asset, map-parallel expansion to stateless 20 ms frames with integral energy/zero-crossings and the half-peak-energy voiced verdict — the speech-pipeline framing primitive; gated-square closed forms, corrupt assets surface as sentinel rows"),

    // ------------------------------------------------------------------
    // m21: IMAGE RESIZE (thumbnailing) — the one member of the brief's
    // decode → feature-extract → RESIZE → frame-sample progression not
    // yet first-class: curation pipelines route/filter on thumbnail
    // features because a thumbnail costs tw×th samples regardless of
    // source resolution. Decode is the real ImageIO PNG parse (m08/m09's
    // path); the resample is deterministic CENTER-POINT nearest-neighbor
    // — an explicit integer kernel (⌊(2x+1)·W / 2tw⌋) both engines can
    // state exactly, unlike AWT's implementation-defined scaler — run
    // over genuinely decoded pixels. Split-PNG fixtures give closed
    // forms: every thumb row samples the same nA left-color columns, so
    // corner_matches = 8·nA and the luma sum is the nA-weighted mix
    // (guarded for the A==B color-collision case so the oracle is total
    // at any doc_id range). Map-only per asset; every 7th asset of the
    // group is corrupted to prove the sentinel path. % 20 == 9 keeps
    // assets disjoint from m08-m20.
    QueryDef(
      "m21_image_resize",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 9)
          .select($"doc_id".as("media_id"),
            (($"n_chars" % 30) * 2 + 18).cast("int").as("w"),
            (($"n_chars" * 7 % 24) * 2 + 16).cast("int").as("h"),
            ((($"doc_id" % 16777216) * 2654435761L) % 16777216)
              .cast("int").as("rgbl"),
            ((($"doc_id" % 16777216) * 40503) % 16777216)
              .cast("int").as("rgbr"),
            (expr("doc_id div 20") % 7 === 0).as("corrupt"))
          .as[(Long, Int, Int, Int, Int, Boolean)]
        rows.mapPartitions(_.map { case (id, w, h, l, r, corrupt) =>
            val png = graft.sources.MediaPipeline.renderSplitPng(w, h, l, r)
            val bytes = if (corrupt) png.drop(1) else png
            graft.sources.MediaPipeline.resizeImage(id, bytes, tw = 8, th = 8)
          })
          .toDF()
          .select($"media_id", $"width", $"height",
            $"thumb_luma_x1000", $"corner_matches", $"decode_ok")
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id,
                 (n_chars % 30) * 2 + 18 AS w,
                 (n_chars * 7 % 24) * 2 + 16 AS h,
                 ((doc_id % 16777216) * 2654435761) % 16777216 AS rgbl,
                 ((doc_id % 16777216) * 40503) % 16777216 AS rgbr,
                 (doc_id // 20) % 7 = 0 AS corrupt
          FROM documents WHERE doc_id % 20 = 9),
        nn AS (
          SELECT media_id, w, h, rgbl, rgbr,
                 len(list_filter(range(0, 8),
                   x -> ((2 * x + 1) * w) // 16 < w // 2)) AS na
          FROM a WHERE NOT corrupt),
        lum AS (
          SELECT media_id, w, h, na,
                 rgbl = rgbr AS flat,
                 299 * (rgbl // 65536) + 587 * ((rgbl // 256) % 256)
                   + 114 * (rgbl % 256) AS ll,
                 299 * (rgbr // 65536) + 587 * ((rgbr // 256) % 256)
                   + 114 * (rgbr % 256) AS lr
          FROM nn)
        SELECT media_id, CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(8 * (na * ll + (8 - na) * lr) AS BIGINT)
                 AS thumb_luma_x1000,
               CAST(CASE WHEN flat THEN 64 ELSE 8 * na END AS BIGINT)
                 AS corner_matches,
               TRUE AS decode_ok
        FROM lum
        UNION ALL
        SELECT media_id, CAST(-1 AS INTEGER), CAST(-1 AS INTEGER),
               CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), FALSE
        FROM a WHERE corrupt
        ORDER BY media_id"""),
      doc = "image resize (thumbnailing): real PNG decode + deterministic center-point nearest-neighbor resample to 8x8 — an explicit integer kernel, not AWT's implementation-defined scaler — with thumbnail luma sum and corner-uniformity score; split-PNG closed forms incl. the color-collision guard, corrupt assets surface as sentinels"),

    // ------------------------------------------------------------------
    // m22: SCENE-CUT DETECTION + KEYFRAME SELECTION — the video-curation
    // step after m11's fixed-stride sampling and m17's whole-video
    // dedup: a training pipeline samples one frame per SCENE, not per
    // stride, so the selector must find the cuts first. Real animated-
    // GIF decode of every frame (m11's reader), then per video one
    // in-row pass over the ordered luma sequence keeps frame 0 plus
    // every frame whose luma jump from its predecessor exceeds the cut
    // threshold — the classical inter-frame-difference detector, as a
    // filter/transform expression over the collected frame list (ONE
    // per-video shuffle, no window, no self-join). Fixtures plant
    // 3-frame scenes at an id-derived phase with md5-derived scene
    // colors (the m17 SQL-reproducible channel recipe), so within-scene
    // deltas are exactly 0 and cross-scene deltas are md5-random;
    // detector and oracle apply the IDENTICAL |Δluma| > 20000 rule to
    // identical lumas, so soft cuts (rare near-equal adjacent scenes)
    // are missed by BOTH sides and parity holds by construction. At
    // 100 TB the decode is map-parallel per asset and the selector
    // state is one bounded frame list per video. % 20 == 13 keeps
    // assets disjoint from m08-m21.
    QueryDef(
      "m22_scene_cut_keyframes",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 13)
          .select($"doc_id".as("media_id"),
            (($"n_chars" % 8) + 6).cast("int").as("nf"))
          .as[(Long, Int)]
        rows.mapPartitions(_.flatMap { case (id, nf) =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val colors = (0 until nf).map { j =>
              val sc = (j + (id % 3).toInt) / 3
              val hex = md.digest(s"$id:s:$sc".getBytes("UTF-8"))
                .map("%02x".format(_)).mkString
              def ch(o: Int) =
                Integer.parseInt(hex.substring(o, o + 2), 16) % 200
              (ch(0) << 16) | (ch(2) << 8) | ch(4)
            }
            graft.sources.MediaPipeline.sampleFrames(id,
              graft.sources.MediaPipeline.renderGifFrames(24, 16, colors),
              stride = 1)
          })
          .toDF()
          .filter($"decode_ok")
          .groupBy($"media_id")
          .agg(min($"n_frames").as("nf"),
            sort_array(collect_list(struct($"frame_idx", $"luma_x1000")))
              .as("fl"))
          .select($"media_id", $"nf", explode(expr(
            """filter(transform(sequence(1, size(fl)), i -> named_struct(
                 'fi', element_at(fl, i).frame_idx,
                 'luma', element_at(fl, i).luma_x1000,
                 'keep', if(i = 1, true,
                   abs(element_at(fl, i).luma_x1000
                     - element_at(fl, CAST(i - 1 AS INT)).luma_x1000)
                   > 20000))), x -> x.keep)""")).as("k"))
          .select($"media_id", $"k.fi".cast("int").as("frame_idx"),
            $"k.luma".as("luma_x1000"), $"nf".cast("int").as("n_frames"))
          .orderBy($"media_id", $"frame_idx")
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS media_id, (n_chars % 8) + 6 AS nf
          FROM documents WHERE doc_id % 20 = 13),
        fr AS (SELECT media_id, nf, unnest(range(0, nf)) AS j FROM a),
        hx AS (
          SELECT media_id, nf, j,
                 md5(media_id || ':s:' || ((j + media_id % 3) // 3)) AS hex
          FROM fr),
        lm AS (
          SELECT media_id, nf, j,
                 299 * (CAST(concat('0x', substr(hex, 1, 2)) AS INTEGER)
                        % 200)
               + 587 * (CAST(concat('0x', substr(hex, 3, 2)) AS INTEGER)
                        % 200)
               + 114 * (CAST(concat('0x', substr(hex, 5, 2)) AS INTEGER)
                        % 200) AS luma
          FROM hx),
        sq AS (SELECT media_id, nf, list(luma ORDER BY j) AS ls
               FROM lm GROUP BY media_id, nf),
        kf AS (
          SELECT media_id, nf,
                 unnest(list_filter(list_transform(range(1, nf + 1),
                   i -> struct_pack(fi := i - 1, luma := ls[i],
                          keep := CASE WHEN i = 1 THEN TRUE
                                  ELSE abs(ls[i] - ls[i - 1]) > 20000
                                  END)),
                   x -> x.keep)) AS k
          FROM sq)
        SELECT media_id, CAST(k.fi AS INTEGER) AS frame_idx,
               CAST(k.luma AS BIGINT) AS luma_x1000,
               CAST(nf AS INTEGER) AS n_frames
        FROM kf ORDER BY media_id, frame_idx"""),
      doc = "scene-cut detection + keyframe selection (one frame per SCENE, not per stride — the video-curation sampler): real per-frame GIF decode, then one in-row filter/transform pass over the ordered luma list keeps frame 0 + every |delta-luma| > threshold jump — no window, no self-join, one bounded per-video shuffle; md5-derived scene colors make detector and oracle apply the identical rule to identical lumas"),

    // ------------------------------------------------------------------
    // m23: ID3v2 TEXT-FRAME WALK — the metadata EXTRACTION step on top
    // of m18's header sniff, and the last decoding idiom the binary
    // family lacked: a VARIABLE-STRIDE DIRECTORY WALK whose stride is
    // data (each frame's own parsed 4-byte size — plain big-endian in
    // v2.3, deliberately different from the tag header's syncsafe
    // base-128, both in one file), terminated by the spec's zero
    // padding, with STRING payloads (title/artist/track behind a
    // per-frame text-encoding byte) instead of m12-m19's numeric
    // fields. The walk is a bounded aggregate() fold over
    // struct(offset, frame count, title, artist, track) — the m19
    // marker-skip fold generalized to carry extracted TEXT through the
    // fold state. Pure native expressions over the binary column, zero
    // UDF, zero decode of the audio itself; corrupt assets (leading
    // byte dropped) fail the magic → sentinels. At 100 TB this is the
    // router that turns a crawl of raw audio bytes into queryable
    // (title, artist, track) columns without ever invoking a codec.
    QueryDef(
      "m23_id3_frame_walk",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 11)
          .select($"doc_id".as("media_id"),
            concat(lit("T"), ($"doc_id" % 1000).cast("string")).as("ti"),
            concat(lit("A"), ($"n_chars" % 97).cast("string")).as("ar"),
            ($"n_chars" % 30 + 1).cast("string").as("tr"))
          .as[(Long, String, String, String)]
        val assets = rows.mapPartitions(_.map { case (id, ti, ar, tr) =>
            val mp3 = MediaPipeline.renderId3Mp3(ti, ar, tr)
            (id, if (id % 3 == 2) mp3.drop(1) else mp3)
          }).toDF("media_id", "mp3")
        def u8(pos: String): String =
          s"CAST(conv(hex(substring(mp3, CAST(($pos) AS INT), 1)), 16, 10) AS BIGINT)"
        def be32(pos: String): String =
          s"""(16777216 * ${u8(pos)} + 65536 * ${u8(s"($pos) + 1")}
               + 256 * ${u8(s"($pos) + 2")} + ${u8(s"($pos) + 3")})"""
        def txt(pos: String, len: String): String =
          s"""decode(substring(mp3, CAST(($pos) AS INT),
                CAST(($len) AS INT)), 'UTF-8')"""
        // one frame step: id(4) + size(4 BE) + flags(2) + enc(1) + text;
        // a zero byte where an id should start is the padding terminator
        val step =
          s"""CASE WHEN ${u8("st.off")} = 0 THEN st
              ELSE named_struct(
                'off', st.off + 10 + ${be32("st.off + 4")},
                'nf', st.nf + 1L,
                'title', CASE WHEN ${txt("st.off", "4")} = 'TIT2'
                               AND ${u8("st.off + 10")} = 0
                              THEN ${txt("st.off + 11", be32("st.off + 4") + " - 1")}
                              ELSE st.title END,
                'artist', CASE WHEN ${txt("st.off", "4")} = 'TPE1'
                                AND ${u8("st.off + 10")} = 0
                               THEN ${txt("st.off + 11", be32("st.off + 4") + " - 1")}
                               ELSE st.artist END,
                'track', CASE WHEN ${txt("st.off", "4")} = 'TRCK'
                               AND ${u8("st.off + 10")} = 0
                              THEN ${txt("st.off + 11", be32("st.off + 4") + " - 1")}
                              ELSE st.track END) END"""
        assets
          .withColumn("id3_ok", expr(
            s"""hex(substring(mp3, 1, 3)) = '494433'
                AND ${u8("7")} < 128 AND ${u8("8")} < 128
                AND ${u8("9")} < 128 AND ${u8("10")} < 128"""))
          .withColumn("walk", expr(
            s"""CASE WHEN id3_ok THEN aggregate(sequence(1, 4),
                  named_struct('off', 11L, 'nf', 0L,
                    'title', '', 'artist', '', 'track', ''),
                  (st, i) -> $step)
                ELSE named_struct('off', -1L, 'nf', -1L,
                  'title', '?', 'artist', '?', 'track', '?') END"""))
          .select($"media_id", $"id3_ok",
            $"walk.nf".as("n_frames"),
            $"walk.title".as("title"), $"walk.artist".as("artist"),
            $"walk.track".as("track"))
          .orderBy($"media_id")
      },
      Some("""
        SELECT doc_id AS media_id,
               doc_id % 3 <> 2 AS id3_ok,
               CAST(CASE WHEN doc_id % 3 <> 2 THEN 3 ELSE -1 END AS BIGINT)
                 AS n_frames,
               CASE WHEN doc_id % 3 <> 2
                    THEN 'T' || CAST(doc_id % 1000 AS VARCHAR)
                    ELSE '?' END AS title,
               CASE WHEN doc_id % 3 <> 2
                    THEN 'A' || CAST(n_chars % 97 AS VARCHAR)
                    ELSE '?' END AS artist,
               CASE WHEN doc_id % 3 <> 2
                    THEN CAST(n_chars % 30 + 1 AS VARCHAR)
                    ELSE '?' END AS track
        FROM documents WHERE doc_id % 20 = 11
        ORDER BY media_id"""),
      doc = "ID3v2 text-frame walk (metadata extraction over m18's header sniff): variable-stride directory walk — stride = each frame's own parsed big-endian size, next to the header's syncsafe size in the same file — as a bounded aggregate() fold carrying extracted STRING payloads (title/artist/track behind per-frame encoding bytes) through the state; zero UDF, zero codec, padding-terminated, corrupt assets fail the magic into sentinels"),

    // ------------------------------------------------------------------
    // m24: WARC RECORD WALK — the container real 100 TB text corpora
    // arrive in (Common Crawl ships WARC; ISO 28500), and the last
    // ingestion idiom the binary family lacked: LENGTH-DELIMITED
    // header-then-payload records — parse header lines until the blank
    // line, read Content-Length, stride header + payload + trailing
    // CRLFCRLF to the next record (m23's variable-stride walk where the
    // stride is a parsed TEXT header field instead of a binary size
    // word). The reference's own scrape loop (mb8600.py:329-360,
    // fetch → parse wire format → land) is this exact shape for HNAP;
    // WARC is that loop for the web. Archives are synthesized
    // on-executor (the renderId3Mp3 convention) with 2-4 records of
    // MIXED types and sizes; plants: doc_id%3=2 drops the leading byte
    // (magic fails → sentinels) and doc_id%7=3 truncates the archive
    // mid-record (the walk keeps every COMPLETE record and reports
    // status 'truncated' — the crash-mid-write case an ingester must
    // survive, NOT silently mis-read). All ASCII, so byte==char
    // offsets (documented in renderWarcRecord; binary payloads walk
    // the same offsets via m23's u8/hex idiom). Oracle: closed-form —
    // it rebuilds the same payload strings from the (id, n_chars)
    // recipe and derives every count/status from the plant rules, so
    // one mis-parsed offset anywhere breaks the match. Zero UDF in
    // the walk, map-parallel per archive; c23 composes this walk into
    // the t20 markup strip + c01 curation funnel.
    QueryDef(
      "m24_warc_record_walk",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 14)
          .select($"doc_id".as("media_id"), $"n_chars").as[(Long, Long)]
        val assets = rows.mapPartitions(_.map { case (id, nc) =>
            val w0 = MediaPipeline.renderWarc(id, nc)
            val w1 = if (id % 7 == 3) w0.dropRight(5) else w0
            (id, if (id % 3 == 2) w1.substring(1) else w1)
          }).toDF("media_id", "warc")
        assets
          .withColumn("walk", expr(MediaPipeline.warcWalkExpr("warc", 5)))
          .select($"media_id",
            ($"walk.status" === "end").as("warc_ok"),
            expr("CASE WHEN walk.status = 'end' THEN 'ok' ELSE walk.status END")
              .as("status"),
            $"walk.nrec".as("n_records"),
            $"walk.nresp".as("n_responses"),
            $"walk.pbytes".as("payload_bytes"),
            $"walk.furi".as("first_uri"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (SELECT doc_id AS media_id, n_chars,
                          (n_chars % 3) + 2 AS k
                   FROM documents WHERE doc_id % 20 = 14),
        r AS (SELECT media_id, k,
                CASE WHEN media_id % 3 = 2 THEN 'corrupt'
                     WHEN media_id % 7 = 3 THEN 'truncated'
                     ELSE 'ok' END AS status,
                g.j AS j,
                CASE WHEN g.j % 2 = 0
                  THEN '<html><title>p' || media_id || '-' || g.j ||
                       '</title><body>' ||
                       repeat('ab ', CAST((n_chars % 7) + g.j + 1 AS INT)) ||
                       '</body></html>'
                  ELSE 'meta ' || media_id || ' ' || g.j END AS payload
              FROM a, UNNEST(range(0, k)) AS g(j)),
        c AS (SELECT media_id, k, status,
                CAST(SUM(CASE WHEN j < (CASE WHEN status = 'truncated'
                                        THEN k - 1 ELSE k END)
                         THEN length(payload) ELSE 0 END) AS BIGINT) AS pb,
                CAST(SUM(CASE WHEN j < (CASE WHEN status = 'truncated'
                                        THEN k - 1 ELSE k END)
                              AND j % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS nr
              FROM r GROUP BY 1, 2, 3)
        SELECT media_id, status = 'ok' AS warc_ok, status,
               CAST(CASE WHEN status = 'corrupt' THEN -1
                         WHEN status = 'truncated' THEN k - 1
                         ELSE k END AS BIGINT) AS n_records,
               CASE WHEN status = 'corrupt' THEN CAST(-1 AS BIGINT)
                    ELSE nr END AS n_responses,
               CASE WHEN status = 'corrupt' THEN CAST(-1 AS BIGINT)
                    ELSE pb END AS payload_bytes,
               CASE WHEN status = 'corrupt' THEN '?'
                    ELSE 'http://ex.org/' || media_id || '/0' END AS first_uri
        FROM c ORDER BY media_id"""),
      doc = "WARC record walk (ISO 28500 — the container 100 TB crawl corpora arrive in): length-delimited header-then-payload records as ONE native aggregate() fold — magic check, header-block regexp fields, Content-Length stride, trailing-CRLF hop — m23's variable-stride idiom with a parsed TEXT header as the stride; corrupt archives fail the magic into sentinels, truncated archives keep every COMPLETE record with status 'truncated'; closed-form oracle rebuilds payloads from the plant recipe so one wrong offset breaks the match"),

    // ------------------------------------------------------------------
    // m25: TRAINED MEDIA CLASSIFIER — the media-side twin of t33 and
    // the entry that retires the last stub class (VERDICT r12 next #2):
    // a logistic model genuinely TRAINED IN-ENGINE over features from a
    // REAL image decode, then applied through the m04 batched-inference
    // plumbing with the LEARNED weights as the forward. Fixture: every
    // document renders a PNG — media_id % 2 = 1 gets the two-color
    // split (the planted positive class), % 2 = 0 a solid (both halves
    // the left color). Features come from decodeGridCols' REAL ImageIO
    // decode (integer grid-column luma sums, exact closed forms for
    // rendered splits — the m08/m09 discipline), scaled to O(1)
    // doubles by expressions stated identically in both engines:
    // f1 = |s_left − s_right|/1e5 (the separating signal), f2 = mean
    // luma, f3 = width. Training is logisticTrainMicro's exact-integer
    // gradient epochs (4 epochs, one partial-aggregated pass each, 4
    // BIGINTs of driver state); the oracle replays them through the
    // SAME epochSqlCtes generator as t33 onto bit-identical
    // micro-weights. Apply is typed batched inference (batch =
    // media_id div 16, the m04 contract) whose JVM scorer mirrors
    // zMicroSql's IEEE op sequence exactly — floor(z·10⁶) lands on the
    // same integer as the oracle's SQL.
    //   Scale: render+decode is map-parallel once into a checkpointed
    //   4-column integer frame; each epoch is one partial-aggregated
    //   scan of it; apply is one batch-keyed shuffle of integers.
    QueryDef(
      "m25_trained_media_classifier",
      (s, dir) => {
        import s.implicits._
        import graft.functions.TextFunctions
        val assets = MediaPipeline.splitAssets(s, dir)
          .select($"media_id", $"w", $"h", $"rgbl",
            when($"media_id" % 2 === 1, $"rgbr").otherwise($"rgbl").as("rgbr"))
          .as[(Long, Int, Int, Int, Int)]
        // one map-parallel render+decode pass → bounded integer frame,
        // pinned so 4 epochs + apply never re-render
        val grid = assets.mapPartitions(_.map { case (id, w, h, l, r) =>
            val gf = MediaPipeline.decodeGridCols(id,
              MediaPipeline.renderSplitPng(w, h, l, r))
            (gf.media_id, gf.s_left, gf.s_right, w)
          }).toDF("media_id", "s_left", "s_right", "w")
          .localCheckpoint()
        val feats = grid.select($"media_id",
          when($"media_id" % 2 === 1, 1.0).otherwise(0.0).as("y"),
          lit(1.0).as("f0"),
          expr("CAST(abs(s_left - s_right) AS DOUBLE) / 100000.0").as("f1"),
          expr("CAST(s_left + s_right AS DOUBLE) / 4080000.0").as("f2"),
          expr("CAST(w AS DOUBLE) / 100.0").as("f3"))
        val wts = TextFunctions.logisticTrainMicro(feats, nFeats = 4,
          epochs = 4, lrNum = 4L)
        // batched apply — m04's deterministic batch assembly with the
        // TRAINED model as the forward; the scorer repeats zMicroSql's
        // op sequence term by term so the floored micro-score is
        // engine-exact
        grid.select($"media_id", $"s_left", $"s_right", $"w")
          .as[(Long, Long, Long, Int)]
          .groupByKey(_._1 / 16)
          .flatMapGroups { (batchId: Long, it: Iterator[(Long, Long, Long, Int)]) =>
            val batch = it.toArray.sortBy(_._1)
            batch.iterator.map { case (id, sl, sr, w) =>
              val f1 = math.abs(sl - sr).toDouble / 100000.0
              val f2 = (sl + sr).toDouble / 4080000.0
              val f3 = w.toDouble / 100.0
              val z = (wts(0).toDouble * 1.0 + wts(1).toDouble * f1 +
                wts(2).toDouble * f2 + wts(3).toDouble * f3) / 1000000.0
              (id, batchId, batch.length, id % 2 == 1,
                math.floor(z * 1000000.0).toLong)
            }
          }
          .toDF("media_id", "batch_id", "batch_size", "label", "z_micro")
          .withColumn("predicted", $"z_micro" >= 0L)
          .orderBy($"media_id")
      },
      Some {
        val zF = graft.functions.TextFunctions.zMicroSql(
          (0 until 4).map(j => s"w$j"), Seq("f0", "f1", "f2", "f3"))
        s"""
        WITH px AS (
          SELECT doc_id AS media_id,
                 CAST((n_chars % 30) * 2 + 18 AS INTEGER) AS w,
                 ((doc_id % 16777216) * 2654435761) % 16777216 AS rgbl0,
                 ((doc_id % 16777216) * 40503) % 16777216 AS rgbr0
          FROM documents),
        cls AS (SELECT media_id, w, rgbl0 AS rgbl,
                       CASE WHEN media_id % 2 = 1 THEN rgbr0
                            ELSE rgbl0 END AS rgbr
                FROM px),
        lum AS (SELECT media_id, w,
                 8 * (299 * (rgbl // 65536) + 587 * ((rgbl // 256) % 256)
                      + 114 * (rgbl % 256)) AS sl,
                 8 * (299 * (rgbr // 65536) + 587 * ((rgbr // 256) % 256)
                      + 114 * (rgbr % 256)) AS sr
                FROM cls),
        feats AS (SELECT media_id,
                 CAST(CASE WHEN media_id % 2 = 1 THEN 1 ELSE 0 END
                      AS DOUBLE) AS y,
                 CAST(1.0 AS DOUBLE) AS f0,
                 CAST(abs(sl - sr) AS DOUBLE) / 100000.0 AS f1,
                 CAST(sl + sr AS DOUBLE) / 4080000.0 AS f2,
                 CAST(w AS DOUBLE) / 100.0 AS f3
          FROM lum),
        cnt AS (SELECT COUNT(*) AS n FROM feats),
        ${graft.functions.TextFunctions.epochSqlCtes(4, 4)}
        SELECT f.media_id, f.media_id // 16 AS batch_id,
               CAST(COUNT(*) OVER (PARTITION BY f.media_id // 16)
                    AS INTEGER) AS batch_size,
               f.y = 1.0 AS label,
               CAST(floor(($zF) * 1000000.0) AS BIGINT) AS z_micro,
               CAST(floor(($zF) * 1000000.0) AS BIGINT) >= 0 AS predicted
        FROM feats f CROSS JOIN e4
        ORDER BY f.media_id"""
      },
      doc = "TRAINED media classifier (t33's in-engine training applied to the media side — retires the last stub class): logistic regression over REAL-image-decode features (grid-column luma sums from decodeGridCols, closed-form for the rendered solid/split fixture), 4 exact-integer gradient epochs replayed by the oracle through the shared epochSqlCtes generator, applied through m04's batched-inference plumbing with the LEARNED weights as the forward — the JVM scorer mirrors zMicroSql's IEEE op sequence so floor(z*1e6) is engine-exact"),

    // ------------------------------------------------------------------
    // m26: MP4/ISO-BMFF BOX WALK — the VIDEO container (VERDICT r12
    // next #4): m15/m16 sniff FIXED-layout MP4s; this is the
    // variable-count top-level box walk — ftyp + moov(mvhd) + a
    // varying run of mdat boxes — as ONE native aggregate() fold
    // (m24's variable-stride idiom with a binary big-endian size word
    // as the stride, read through m23's hex/conv idiom). Streams are
    // synthesized on-executor from (id, n_chars) arithmetic; plants:
    // doc_id%3=2 drops the leading byte (the first box fails
    // ftyp-first validation → sentinels), doc_id%7=3 drops the last 5
    // bytes (the final mdat overruns EOF → status 'truncated' with
    // every COMPLETE box still counted — the crash-mid-write case).
    // The oracle is CLOSED-FORM: every expected count/field derives
    // from the recipe without parsing a byte, so one wrong stride or
    // endianness slip anywhere breaks the hash. Zero UDF in the walk;
    // map-parallel per asset; at 100 TB this is the router that turns
    // raw video objects into queryable track metadata without a
    // custom reader.
    QueryDef(
      "m26_mp4_box_walk",
      (s, dir) => {
        import s.implicits._
        val rows = graft.Tables.load(s, dir, "documents")
          .filter($"doc_id" % 20 === 10)
          .select($"doc_id".as("media_id"), $"n_chars").as[(Long, Long)]
        val assets = rows.mapPartitions(_.map { case (id, nc) =>
            val b0 = MediaPipeline.renderMp4Stream(id, nc)
            val b1 = if (id % 7 == 3) b0.dropRight(5) else b0
            (id, if (id % 3 == 2) b1.drop(1) else b1)
          }).toDF("media_id", "mp4")
        assets
          .withColumn("walk", expr(MediaPipeline.mp4WalkExpr("mp4", 8)))
          .select($"media_id",
            ($"walk.status" === "end").as("mp4_ok"),
            expr("CASE WHEN walk.status = 'end' THEN 'ok' ELSE walk.status END")
              .as("status"),
            $"walk.nbox".as("n_boxes"),
            $"walk.brand".as("brand"),
            $"walk.ts".as("timescale"),
            $"walk.dur".as("duration"),
            $"walk.mdat".as("mdat_bytes"))
          .orderBy($"media_id")
      },
      Some("""
        WITH a AS (SELECT doc_id AS media_id, n_chars,
                          (n_chars % 4) + 1 AS k,
                          (n_chars % 1000) + 600 AS ts,
                          (n_chars * 3) % 90000 AS dur,
                          CASE WHEN doc_id % 3 = 2 THEN 'corrupt'
                               WHEN doc_id % 7 = 3 THEN 'truncated'
                               ELSE 'ok' END AS status
                   FROM documents WHERE doc_id % 20 = 10),
        r AS (SELECT media_id, status, k, ts, dur, g.j AS j,
                     (n_chars % 50) + 10 * g.j + 1 AS p
              FROM a, UNNEST(range(0, k)) AS g(j)),
        c AS (SELECT media_id, status, k, ts, dur,
                CAST(SUM(CASE WHEN j < (CASE WHEN status = 'truncated'
                                        THEN k - 1 ELSE k END)
                         THEN p ELSE 0 END) AS BIGINT) AS mdat
              FROM r GROUP BY 1, 2, 3, 4, 5)
        SELECT media_id, status = 'ok' AS mp4_ok, status,
               CAST(CASE WHEN status = 'corrupt' THEN -1
                         WHEN status = 'truncated' THEN k + 1
                         ELSE k + 2 END AS BIGINT) AS n_boxes,
               CASE WHEN status = 'corrupt' THEN '?' ELSE 'isom' END AS brand,
               CASE WHEN status = 'corrupt' THEN CAST(-1 AS BIGINT)
                    ELSE CAST(ts AS BIGINT) END AS timescale,
               CASE WHEN status = 'corrupt' THEN CAST(-1 AS BIGINT)
                    ELSE CAST(dur AS BIGINT) END AS duration,
               CASE WHEN status = 'corrupt' THEN CAST(-1 AS BIGINT)
                    ELSE mdat END AS mdat_bytes
        FROM c ORDER BY media_id"""),
      doc = "MP4/ISO-BMFF top-level box walk (the video container): variable-count ftyp/moov(mvhd)/mdat-run strided by each box's big-endian size word as ONE native aggregate() fold — hex/conv big-endian reads, ftyp-first + size>=8 validation, mvhd timescale/duration at their fixed ISO offsets inside moov, mdat payload byte accounting; corrupt streams sentinel at box 1, truncated streams keep every COMPLETE box; closed-form oracle derives every field from the synthesis recipe so one wrong stride breaks the hash"),

    // ------------------------------------------------------------------
    // m27: TRAINED CROSS-MODAL ENCODER (VERDICT r13 next #5) — the
    // learned successor to m06's md5 stub encoder: a LINEAR PROJECTOR
    // from real-image-decode grid-luma features into t29's 16-dim
    // hashing space, trained in-engine over planted text↔image pairs
    // with linearTrainMicroK (the m25/t33 exact-integer epoch pattern,
    // k = 16 outputs) and then SERVING cross-modal retrieval: a text
    // query's hash vector ranks IMAGES by cosine between the query and
    // each image's PROJECTED embedding.
    //   The pair plant (how real paired data is shaped): each doc's
    // image is a 16-strip grayscale PNG whose strip-b gray ENCODES the
    // doc text's hash component b (g = 128 + c·127 div 1e6) — the
    // image genuinely carries the text's content, so a projector can
    // genuinely be learned from (image features, text vector) pairs.
    // Features come from decodeGridStrips' REAL ImageIO decode
    // (16 column-sample luma sums, closed form 8000·g_b for rendered
    // strips), centered/scaled by expressions stated identically both
    // sides; 12 half-step epochs (lr 1/2) × one partial-aggregated pass train 17×16
    // integer micro-weights the oracle replays through
    // projEpochSqlCtes onto bit-identical values.
    //   Serving is exact-integer end to end (the c24 convention):
    // projected embeddings floor to BIGINT micro components, cosine =
    // integer dot/norms with doubles only in the stated-identical
    // final sqrt/divide. Scale: render+decode is map-parallel once
    // into a checkpointed integer frame; each epoch is one scan of it;
    // driver state is 272 BIGINTs; retrieval is a broadcast query +
    // TakeOrdered top-5.
    QueryDef(
      "m27_crossmodal_trained",
      (s, dir) => {
        import s.implicits._
        import graft.functions.TextFunctions
        // spread the two expensive map lanes (guide §2.5 input skew):
        // the doc subset is a sub-split-size scan (ONE task), so the
        // tokenize+md5 pass ran serial (measured 1.8 s); likewise AQE
        // coalesces tvec to one partition, serializing the 1-per-doc
        // PNG render + ImageIO decode (measured 1.5 s). Conditional
        // round-robin spreads (no-ops at scale) buy full parallelism.
        val docs = graft.Tables.spread(graft.Tables
          .load(s, dir, "documents").filter($"doc_id" % 4 === 1))
        val tvec = TextQueries.hashVec16(docs, "doc_id", "text")
          .localCheckpoint()
        val rows = graft.Tables.spread(
          tvec.select($"doc_id", $"comps").as[(Long, Seq[Long])])
        // render the paired strip image from the text vector, decode
        // it back through the REAL ImageIO lane — once, pinned
        val grid = rows.mapPartitions(_.map { case (id, comps) =>
            val grays = comps.map(c =>
              (128L + (c * 127L) / 1000000L).toInt).toArray
            (id, MediaPipeline.decodeGridStrips(id,
              MediaPipeline.renderStripPng(64, 16, grays)).toSeq)
          }).toDF("doc_id", "strips").localCheckpoint()
        var feats = grid.join(tvec.select($"doc_id", $"comps"), "doc_id")
          .withColumn("f0", lit(0.5))
        for (b <- 0 until 16) {
          feats = feats
            .withColumn(s"f${b + 1}", expr(
              s"CAST(4 * (element_at(strips, ${b + 1}) - 1024000) AS DOUBLE) / 2040000.0"))
            .withColumn(s"y$b", expr(
              s"CAST(element_at(comps, ${b + 1}) AS DOUBLE) / 1000000.0"))
        }
        // pin the 33-column feature frame ONCE: the 12 training epochs,
        // the count, and the serving projection all read it — unpinned,
        // every epoch re-analyzed the grid⋈tvec join + 32 projections
        feats = feats.localCheckpoint()
        val wts = TextFunctions.linearTrainMicroK(feats,
          nFeats = 17, nOut = 16, epochs = 12, lrNum = 1L, lrDen = 2L)
        val fRefs = (0 until 17).map(j => s"f$j")
        val zCols = (0 until 16).map(k => expr(
          s"CAST(floor((${TextFunctions.zMicroSql(
            wts(k).map(_.toString).toSeq, fRefs)}) * 1000000.0) AS BIGINT)")
          .as(s"z$k"))
        val proj = feats.select(
          ($"doc_id".as("media_id") +: zCols): _*)
        val probeId = tvec.filter($"l2" > 0).agg(min($"doc_id"))
          .head().getLong(0)
        val q = tvec.filter($"doc_id" === probeId).select($"comps".as("qc"))
        val dotE = (0 until 16)
          .map(k => s"z$k * element_at(qc, ${k + 1})").mkString(" + ")
        val naE = (0 until 16).map(k => s"z$k * z$k").mkString(" + ")
        val nqE = (0 until 16)
          .map(k => s"element_at(qc, ${k + 1}) * element_at(qc, ${k + 1})")
          .mkString(" + ")
        val wR = Window.orderBy($"cosine".desc, $"media_id".asc)
        proj.crossJoin(broadcast(q))
          .select($"media_id", expr(
            s"""round(CAST($dotE AS DOUBLE) /
                (sqrt(CAST($naE AS DOUBLE)) * sqrt(CAST($nqE AS DOUBLE))), 9)""")
            .as("cosine"))
          .orderBy($"cosine".desc, $"media_id".asc).limit(5)
          .withColumn("rk", row_number().over(wR).cast("long"))
          .select($"rk", $"media_id", $"cosine")
          .orderBy($"rk")
      },
      Some(m27OracleSql),
      doc = "trained cross-modal encoder (retires m06's md5 stub as the encoder): a 17x16 linear projector from REAL-image-decode grid-luma features (decodeGridStrips, closed-form 8000*g per rendered strip) into t29's 16-dim hashing space, trained in-engine over planted text<->image pairs with linearTrainMicroK's exact-integer gradient epochs (oracle-replayed through projEpochSqlCtes onto bit-identical micro-weights), then serving cross-modal retrieval: text query hash vector vs projected image embeddings by exact-integer cosine, TakeOrdered top-5 — self-retrieval at rank 1 is the learned-signal proof the stub cannot produce")
  )

  /** Big-endian field read as a SQL fragment (for composing with `div`
    * etc. inside one expr).
    */
  private def beSql(pos: String, len: Int): String =
    s"CAST(conv(hex(substring(mp4, CAST($pos AS INT), $len)), 16, 10) AS BIGINT)"

  /** The m27 oracle: t29's hash-vectorizer replay over the pair subset
    * (the text side), the strip-image features by CLOSED FORM
    * (8000·g_b — renderStripPng/decodeGridStrips' documented
    * identity), the 12 projector epochs through projEpochSqlCtes onto
    * bit-identical 17×16 micro-weights, the floored projection, and
    * the exact-integer cosine retrieval.
    */
  private def m27OracleSql: String = {
    import graft.functions.TextFunctions
    val fRefs = (0 until 17).map(j => s"f$j")
    val fCols = (0 until 16).map(b =>
      s"""CAST(4 * (8000 * (128 + (cl[${b + 1}] * 127) // 1000000) - 1024000)
              AS DOUBLE) / 2040000.0 AS f${b + 1}""").mkString(",\n            ")
    val yCols = (0 until 16).map(b =>
      s"CAST(cl[${b + 1}] AS DOUBLE) / 1000000.0 AS y$b")
      .mkString(",\n            ")
    val zCols = (0 until 16).map(k =>
      s"""CAST(floor((${TextFunctions.zMicroSql(
        (0 until 17).map(j => s"e.w${k}_$j"), fRefs)}) * 1000000.0)
              AS BIGINT) AS z$k""").mkString(",\n            ")
    val dotE = (0 until 16).map(k => s"p.z$k * q.cl[${k + 1}]")
      .mkString(" + ")
    val naE = (0 until 16).map(k => s"p.z$k * p.z$k").mkString(" + ")
    val nqE = (0 until 16).map(k => s"q.cl[${k + 1}] * q.cl[${k + 1}]")
      .mkString(" + ")
    s"""
        WITH hvtoksraw AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                   AS t
          FROM documents WHERE doc_id % 4 = 1),
        hvtok AS (SELECT doc_id, t, md5(t) AS h FROM hvtoksraw WHERE t <> ''),
        hvhashed AS (
          SELECT doc_id,
                 CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1
                   AS BIGINT) AS bucket,
                 CASE WHEN substr(h, 2, 1) >= '8' THEN -1 ELSE 1 END AS sgn
          FROM hvtok),
        hvsums AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS v
                   FROM hvhashed GROUP BY doc_id, bucket),
        hvagg AS (SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS sq
                  FROM hvsums GROUP BY doc_id),
        hvspine AS (SELECT a.doc_id, sqrt(CAST(a.sq AS DOUBLE)) AS l2, bb.b
                    FROM hvagg a CROSS JOIN
                      (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS b) bb),
        hvfilled AS (SELECT sp.doc_id, sp.b, sp.l2, COALESCE(s.v, 0) AS v
                     FROM hvspine sp LEFT JOIN hvsums s
                       ON s.doc_id = sp.doc_id AND s.bucket = sp.b),
        tvec AS (SELECT doc_id,
                        list(CAST(round(CASE WHEN l2 = 0 THEN 0.0
                               ELSE 1000000 * v / l2 END, 0) AS BIGINT)
                             ORDER BY b) AS cl
                 FROM hvfilled GROUP BY doc_id),
        feats AS (SELECT doc_id,
            CAST(0.5 AS DOUBLE) AS f0,
            $fCols,
            $yCols
          FROM tvec),
        cnt AS (SELECT COUNT(*) AS n FROM feats),
        ${TextFunctions.projEpochSqlCtes(17, 16, 12, 1L, 2L)},
        proj AS (SELECT f.doc_id AS media_id,
            $zCols
          FROM feats f CROSS JOIN pe12 e),
        qsel AS (SELECT cl FROM tvec
                 WHERE doc_id = (SELECT MIN(a.doc_id) FROM hvagg a
                                 WHERE a.sq > 0)),
        sc AS (SELECT p.media_id,
                 round(CAST($dotE AS DOUBLE) /
                   (sqrt(CAST($naE AS DOUBLE)) * sqrt(CAST($nqE AS DOUBLE))),
                   9) AS cosine
               FROM proj p CROSS JOIN qsel q)
        SELECT * FROM (
          SELECT ROW_NUMBER() OVER (ORDER BY cosine DESC, media_id ASC)
                   AS rk, media_id, cosine
          FROM sc) t
        WHERE rk <= 5 ORDER BY rk"""
  }
}
