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

  // ImageIO's default stream cache is a TEMP FILE PER STREAM on executor
  // disk — at 32 concurrent decode tasks over a 500k-asset corpus the
  // cache-file churn is pure overhead and can fail outright ("Can't
  // create cache file!", the ×100 m11 sweep). Every asset here is
  // KB-sized, so the in-memory cache is strictly better; a real 100 TB
  // deployment wants the same setting for any decode that fits in a
  // task's arrow batch. Class-load-once: executors initialize it with
  // the object, the driver likewise.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Features a REAL image decode emits (vs the [[decodeStub]] fake):
    * pixel dimensions, channel count, sampled mean luminance (×1000,
    * integer — exact across engines) and a 64-bit dHash over a 9×8
    * nearest-neighbor grayscale grid. `decode_ok=false` rows carry
    * sentinel values for undecodable bytes (corrupt or non-image) —
    * a 100 TB crawl always contains some.
    */
  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, channels: Int,
      luma_x1000: Long, dhash: Long, decode_ok: Boolean)

  /** REAL image decoder on `javax.imageio` (JDK-built-in, headless-safe;
    * no container codec gap): PNG/JPEG/BMP/GIF bytes → [[ImageFeatures]].
    * Same per-partition iterator seam as [[decodeStub]], so the typed
    * pipeline (schema, partitioning, batch shape) is identical — the
    * m-series keeps the deterministic stub as its oracle path, and this
    * decoder exercises the seam with REAL bytes (m08 + MediaPipelineSpec).
    *
    * Determinism: scaling libraries vary, so the 9×8 grid samples pixels
    * directly (nearest neighbor via integer math) and luminance uses the
    * Rec.601 weights; ×1000 keeps the value integral (299r+587g+114b),
    * exact on any engine. dHash bit i*8+j compares grid (row i, col j+1)
    * vs (row i, col j) — the standard difference-hash layout (m07's
    * text-derived variant mirrors it).
    */
  def decodeImage(mediaId: Long, bytes: Array[Byte]): ImageFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null)
      ImageFeatures(mediaId, -1, -1, 0, -1L, 0L, decode_ok = false)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val grid = Array.tabulate(8, 9) { (y, x) =>
        val px = img.getRGB(math.min(x * w / 9, w - 1),
          math.min(y * h / 8, h - 1))
        299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
          114L * (px & 0xff)
      }
      var hash = 0L
      var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (grid(y)(x + 1) > grid(y)(x)) hash |= (1L << bit)
          bit += 1; x += 1
        }
        y += 1
      }
      ImageFeatures(mediaId, w, h, img.getColorModel.getNumComponents,
        grid.map(_.sum).sum / 72L, hash, decode_ok = true)
    }
  }

  /** Render a solid-color PNG — real `ImageIO.write` bytes, used by m08
    * and the spec to drive [[decodeImage]] with genuine image content
    * whose decoded stats have a closed form (solid ⇒ dhash 0, luma =
    * 299r+587g+114b).
    */
  def renderSolidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render a left/right two-color split PNG — the NON-SOLID real-decode
    * fixture (VERDICT r8 punch #6): columns [0, w/2) are `rgbLeft`,
    * [w/2, w) are `rgbRight`. With w even and ≥ 16 the 9-column sample
    * grid of [[decodeImage]] lands exactly 5 columns on the left color
    * and 4 on the right (floor(4w/9) < w/2 ≤ floor(5w/9)), so every
    * decoded feature has a closed form:
    *   luma_x1000 = (5·lumaL + 4·lumaR) div 9
    *   dhash      = 0x1010101010101010 iff lumaR > lumaL else 0
    *                (the single per-row transition sits at grid col 4→5,
    *                 bit y·8+4 for every y)
    */
  def renderSplitPng(w: Int, h: Int, rgbLeft: Int, rgbRight: Int): Array[Byte] = {
    require(w >= 16 && w % 2 == 0, s"closed form needs even w >= 16, got $w")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) rgbLeft else rgbRight)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Closed-form twin of decoding [[renderSplitPng]] bytes — the
    * oracle-deterministic STUB side of the config-keyed decoder routing
    * (and the arithmetic the m09 oracle states in SQL).
    */
  def splitFeatures(mediaId: Long, w: Int, h: Int,
      rgbLeft: Int, rgbRight: Int): ImageFeatures = {
    def luma(rgb: Int) = 299L * ((rgb >> 16) & 0xff) +
      587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
    val (ll, lr) = (luma(rgbLeft), luma(rgbRight))
    ImageFeatures(mediaId, w, h, channels = 3,
      luma_x1000 = (5 * ll + 4 * lr) / 9,
      dhash = if (lr > ll) 0x1010101010101010L else 0L,
      decode_ok = true)
  }

  /** Config key for decoder routing: `"stub"` (default) computes the
    * closed-form [[splitFeatures]] directly — deterministic on any
    * JVM; `"imageio"` renders each asset into REAL split-PNG bytes and
    * extracts via [[decodeImage]]. Both paths emit identical rows on
    * valid inputs (MediaPipelineSpec asserts row-for-row equality), so
    * a pipeline can flip to real decoding with one conf change and no
    * oracle churn.
    */
  val DecoderConf = "spark.graft.media.decoder"

  /** Deterministic split-PNG asset metadata derived from `documents`:
    * (media_id, w, h, rgbl, rgbr). Width is forced even and ≥ 18 so the
    * [[renderSplitPng]] closed form holds; both colors pre-reduce
    * media_id mod 2^24 before their Knuth multiplies (Long-overflow-safe
    * at any id, mirrored exactly in oracle SQL).
    */
  def splitAssets(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      ((col("n_chars") % 30) * 2 + 18).cast("int").as("w"),
      ((col("n_chars") * 7 % 24) * 2 + 16).cast("int").as("h"),
      pmod(pmod(col("doc_id"), lit(16777216L)) * 2654435761L,
        lit(16777216L)).cast("int").as("rgbl"),
      pmod(pmod(col("doc_id"), lit(16777216L)) * 40503L,
        lit(16777216L)).cast("int").as("rgbr"))
  }

  /** The config-keyed typed decode seam over [[splitAssets]] — see
    * [[DecoderConf]]. Per-partition map either way; the imageio lane is
    * the m08/m09-proven real path, the stub lane is its arithmetic twin.
    */
  def imageFeaturesRouted(spark: SparkSession, dir: String): Dataset[ImageFeatures] = {
    import spark.implicits._
    val real = spark.conf.getOption(DecoderConf).contains("imageio")
    val assets = splitAssets(spark, dir).as[(Long, Int, Int, Int, Int)]
    if (real)
      assets.mapPartitions(_.map { case (id, w, h, l, r) =>
        decodeImage(id, renderSplitPng(w, h, l, r)) })
    else
      assets.mapPartitions(_.map { case (id, w, h, l, r) =>
        splitFeatures(id, w, h, l, r) })
  }

  /** Features a REAL audio decode emits. All integral: for the square-
    * wave fixtures every statistic has an exact closed form (peak = A,
    * sum_abs = n·A, sum_sq = n·A², zero_crossings = (n−1) div P), so the
    * whole encode→decode→extract loop is hash-checked like m08/m09's
    * image path. `decode_ok=false` rows carry sentinels for undecodable
    * bytes.
    */
  final case class AudioFeatures(
      media_id: Long, n_samples: Long, sample_rate: Int, channels: Int,
      peak: Long, sum_abs: Long, sum_sq: Long, zero_crossings: Long,
      decode_ok: Boolean)

  /** Loudness-invariant perceptual audio fingerprint: per-window
    * zero-crossing counts over the REAL-decoded PCM stream (the audio
    * analog of m07's dHash strips — crossing structure survives gain
    * changes, re-encoding, and amplitude normalization, which is what
    * makes it a dedup key). `fp` is the dash-joined count vector.
    */
  final case class AudioFingerprint(
      media_id: Long, n_samples: Long, peak: Long, fp: String,
      decode_ok: Boolean)

  /** Decode `bytes` via javax.sound and fingerprint: split the sample
    * stream into `nWindows` equal spans (integer boundaries w·n/nW) and
    * count sign flips inside each span — amplitude never enters, so two
    * renditions of the same signal at different gain collide exactly.
    * `peak` is carried alongside to PROVE the loudness difference of
    * colliding assets downstream.
    */
  def audioFingerprint(mediaId: Long, bytes: Array[Byte],
      nWindows: Int): AudioFingerprint =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
      val data = in.readAllBytes()
      val n = data.length / 2
      def sample(i: Int): Int =
        (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
      var peak = 0L
      var i = 0
      while (i < n) {
        val a = math.abs(sample(i).toLong)
        if (a > peak) peak = a
        i += 1
      }
      val counts = (0 until nWindows).map { w =>
        val lo = w * n / nWindows
        val hi = (w + 1) * n / nWindows
        var c = 0
        var j = math.max(lo, 1)
        while (j < hi) {
          if (Integer.signum(sample(j)) != Integer.signum(sample(j - 1))) c += 1
          j += 1
        }
        c
      }
      AudioFingerprint(mediaId, n, peak, counts.mkString("-"),
        decode_ok = true)
    } catch { case _: Exception =>
      AudioFingerprint(mediaId, -1L, -1L, "", decode_ok = false)
    }

  /** Render a 16-bit mono PCM WAVE file of a square wave: sample i is
    * +amp when (i div period) is even, −amp otherwise — REAL RIFF/WAVE
    * bytes (44-byte header + LE PCM16), the audio analog of
    * [[renderSolidPng]]/[[renderSplitPng]].
    */
  def renderSquareWav(nSamples: Int, sampleRate: Int, amp: Int,
      period: Int): Array[Byte] = {
    require(amp > 0 && amp <= 32767 && period > 0 && nSamples > 0,
      s"bad wav params ($nSamples, $sampleRate, $amp, $period)")
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate); buf.putInt(sampleRate * 2)
    buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort((if ((i / period) % 2 == 0) amp else -amp).toShort)
      i += 1
    }
    buf.array()
  }

  /** Features of a RESIZED (thumbnailed) image — the routing features a
    * curation pipeline extracts at thumbnail cost instead of full
    * resolution. `thumb_luma_x1000` is the Rec.601 luma sum over every
    * thumbnail pixel; `corner_matches` counts thumbnail pixels equal to
    * the top-left thumbnail pixel (a uniformity score: 64 = flat image).
    */
  final case class ThumbFeatures(
      media_id: Long, width: Int, height: Int,
      thumb_luma_x1000: Long, corner_matches: Long, decode_ok: Boolean)

  /** Decode + RESIZE via deterministic center-point nearest-neighbor
    * resampling: thumbnail pixel (x, y) samples source pixel
    * (⌊(2x+1)·W / 2tw⌋, ⌊(2y+1)·H / 2th⌋) — the standard NN convention,
    * chosen over `Image.getScaledInstance` because its sampling is an
    * EXPLICIT integer kernel both engines can state exactly (AWT's
    * scaler is implementation-defined). The decode is a real ImageIO
    * PNG parse; the resample runs over genuinely decoded pixels.
    */
  def resizeImage(mediaId: Long, bytes: Array[Byte], tw: Int,
      th: Int): ThumbFeatures =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val c0 = img.getRGB(w / (2 * tw), h / (2 * th)) & 0xffffff
      var lum = 0L
      var corner = 0L
      var y = 0
      while (y < th) {
        val sy = (2 * y + 1) * h / (2 * th)
        var x = 0
        while (x < tw) {
          val sx = (2 * x + 1) * w / (2 * tw)
          val rgb = img.getRGB(sx, sy) & 0xffffff
          lum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          if (rgb == c0) corner += 1
          x += 1
        }
        y += 1
      }
      ThumbFeatures(mediaId, w, h, lum, corner, decode_ok = true)
    } catch { case _: Exception =>
      ThumbFeatures(mediaId, -1, -1, -1L, -1L, decode_ok = false)
    }

  /** One fixed-length analysis frame of a decoded audio stream — the
    * framing primitive every speech pipeline (VAD, diarization, ASR
    * feature extraction) runs before anything else. Integral features
    * only: `energy` = Σs² over the frame, `zero_crossings` counts
    * adjacent nonzero sign flips INSIDE the frame (no cross-frame
    * memory — frames must be independently recomputable on any
    * executor), `voiced` is the half-peak-energy VAD gate
    * (2·energy > frameLen·peak², peak taken over the whole stream).
    */
  final case class AudioFrame(
      media_id: Long, n_frames: Int, frame_idx: Int,
      energy: Long, zero_crossings: Long, voiced: Boolean,
      decode_ok: Boolean)

  /** Render a GATED square wave: samples [0, nActive) are the ±amp
    * square of the given period, samples [nActive, nSamples) are
    * digital silence — the speech-then-silence fixture whose per-frame
    * energy/ZCR/VAD features all have exact closed forms.
    */
  def renderGatedSquareWav(nSamples: Int, nActive: Int, sampleRate: Int,
      amp: Int, period: Int): Array[Byte] = {
    require(amp > 0 && amp <= 32767 && period > 0 && nSamples > 0 &&
      nActive > 0 && nActive <= nSamples,
      s"bad wav params ($nSamples, $nActive, $sampleRate, $amp, $period)")
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate); buf.putInt(sampleRate * 2)
    buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val s =
        if (i >= nActive) 0
        else if ((i / period) % 2 == 0) amp
        else -amp
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** Decode (real javax.sound WAV parse) + FRAME: split the PCM stream
    * into non-overlapping frames of `frameLen` samples (trailing
    * partial frame dropped — the standard framing rule) and emit one
    * [[AudioFrame]] per frame. Map-parallel per asset; undecodable
    * bytes yield a single sentinel row so corrupt assets stay visible
    * downstream instead of vanishing.
    */
  def frameAudio(mediaId: Long, bytes: Array[Byte],
      frameLen: Int): Seq[AudioFrame] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
      val data = in.readAllBytes()
      val n = data.length / 2
      def sample(i: Int): Long =
        (((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff))).toLong
      var peak = 0L
      var i = 0
      while (i < n) {
        val a = math.abs(sample(i)); if (a > peak) peak = a; i += 1
      }
      val nFrames = n / frameLen
      (0 until nFrames).map { f =>
        val s = f * frameLen
        var energy = 0L; var zc = 0L
        var j = s
        while (j < s + frameLen) {
          val v = sample(j)
          energy += v * v
          if (j > s) {
            val p = sample(j - 1)
            if (v != 0 && p != 0 &&
              java.lang.Long.signum(v) != java.lang.Long.signum(p)) zc += 1
          }
          j += 1
        }
        AudioFrame(mediaId, nFrames, f, energy, zc,
          voiced = 2 * energy > frameLen.toLong * peak * peak,
          decode_ok = true)
      }
    } catch { case _: Exception =>
      Seq(AudioFrame(mediaId, -1, -1, -1L, -1L, voiced = false,
        decode_ok = false))
    }

  /** Minimal ISO-BMFF (MP4) container: an `ftyp` box (major brand
    * `isom`, minor version 512, one compatible brand `mp42`) followed by
    * a `moov` box holding a version-0 `mvhd` with the given
    * timescale/duration — the box grammar m15 walks natively. All box
    * sizes and fields are big-endian per ISO 14496-12; the remaining
    * mvhd fields (rate already set to 1.0, volume/matrix/next_track_id)
    * stay zero, which keeps the box lengths honest without mattering to
    * the sniff.
    */
  def renderMp4(timescale: Int, duration: Int): Array[Byte] = {
    require(timescale > 0 && duration >= 0,
      s"bad mp4 params ($timescale, $duration)")
    val bb = java.nio.ByteBuffer.allocate(136) // 20 (ftyp) + 116 (moov)
    bb.putInt(20); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(512)
    bb.put("mp42".getBytes("US-ASCII"))
    bb.putInt(116); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(108); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0)               // version + flags
    bb.putInt(0); bb.putInt(0) // creation / modification time
    bb.putInt(timescale); bb.putInt(duration)
    bb.putInt(0x00010000)      // rate 1.0; rest of mvhd stays zero
    bb.array()
  }

  /** [[renderMp4]] extended with one VIDEO track: moov holds mvhd +
    * trak(tkhd + mdia(mdhd)) — the three-level box nesting m16 descends
    * dynamically. tkhd carries width/height as 16.16 fixed-point at box
    * offsets 84/88, mdhd the media timescale/duration at offsets 20/24
    * (ISO 14496-12 version-0 layouts; unwritten fields stay zero, box
    * sizes honest).
    */
  def renderMp4Video(mvhdTs: Int, mvhdDur: Int, w: Int, h: Int,
      mdTs: Int, mdDur: Int): Array[Byte] = {
    require(mvhdTs > 0 && w > 0 && h > 0 && mdTs > 0,
      s"bad mp4 video params ($mvhdTs, $w, $h, $mdTs)")
    val bb = java.nio.ByteBuffer.allocate(276) // ftyp 20 + moov 256
    bb.putInt(20); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(512)
    bb.put("mp42".getBytes("US-ASCII"))
    bb.putInt(256); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(108); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // ver/flags, ctime, mtime
    bb.putInt(mvhdTs); bb.putInt(mvhdDur); bb.putInt(0x00010000)
    bb.position(136) // rest of mvhd zero
    bb.putInt(140); bb.put("trak".getBytes("US-ASCII"))
    bb.putInt(92); bb.put("tkhd".getBytes("US-ASCII"))
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // ver/flags, ctime, mtime
    bb.putInt(1)        // track id
    bb.putInt(0)        // reserved
    bb.putInt(mvhdDur)  // track duration (movie timescale)
    bb.position(144 + 84) // reserved/layer/volume/matrix zero
    bb.putInt(w << 16); bb.putInt(h << 16)
    bb.putInt(40); bb.put("mdia".getBytes("US-ASCII"))
    bb.putInt(32); bb.put("mdhd".getBytes("US-ASCII"))
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // ver/flags, ctime, mtime
    bb.putInt(mdTs); bb.putInt(mdDur)        // language/predefined zero
    bb.array()
  }

  /** Minimal MP3: an ID3v2.3 tag (10-byte header whose 28-bit size is
    * SYNCSAFE-encoded — 7 data bits per byte, high bit always 0, per
    * id3.org §3.1 — followed by a zero-filled payload of `tagSize`
    * bytes) and then one MPEG-1 Layer III frame header (0xFF 0xFB, then
    * the bit-packed bitrate index in the high nibble and sample-rate
    * index in bits 3-2 of byte 3). The two decoding idioms m18 exercises
    * — syncsafe base-128 integers and sub-byte bit fields — are exactly
    * the ones PNG/WAVE/MP4 (m12/m13/m15) do not have.
    */
  def renderMp3(tagSize: Int, bitrateIdx: Int, srIdx: Int): Array[Byte] = {
    require(tagSize >= 0 && tagSize < (1 << 28) &&
      bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx >= 0 && srIdx <= 2,
      s"bad mp3 params ($tagSize, $bitrateIdx, $srIdx)")
    val out = new Array[Byte](10 + tagSize + 4)
    out(0) = 'I'.toByte; out(1) = 'D'.toByte; out(2) = '3'.toByte
    out(3) = 3; out(4) = 0 // ID3v2.3.0
    out(5) = 0             // flags
    out(6) = ((tagSize >> 21) & 0x7F).toByte
    out(7) = ((tagSize >> 14) & 0x7F).toByte
    out(8) = ((tagSize >> 7) & 0x7F).toByte
    out(9) = (tagSize & 0x7F).toByte
    // tag payload stays zero (ID3 padding); first audio frame follows
    val f = 10 + tagSize
    out(f) = 0xFF.toByte
    out(f + 1) = 0xFB.toByte // sync(3) + MPEG-1(11) + Layer III(01) + noCRC(1)
    out(f + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
    out(f + 3) = 0 // stereo, no mode extension
    out
  }

  /** An MP3 whose ID3v2.3 tag carries REAL text frames (TIT2 title,
    * TPE1 artist, TRCK track — id3.org v2.3 §4.2): each frame is
    * id(4) + size(4, plain big-endian in v2.3, unlike the tag header's
    * syncsafe size) + flags(2) + [encoding byte 0 = ISO-8859-1] + text,
    * followed by 16 bytes of zero padding (the spec's frame terminator
    * for walkers) and the same MPEG-1 Layer III audio frame header as
    * `renderMp3`. The frame DIRECTORY is what m23's variable-stride
    * walk parses — each stride is 10 + that frame's own parsed size.
    */
  def renderId3Mp3(title: String, artist: String, track: String): Array[Byte] = {
    def frame(id: String, text: String): Array[Byte] = {
      val t = text.getBytes("ISO-8859-1")
      val sz = t.length + 1 // encoding byte
      id.getBytes("ISO-8859-1") ++ Array(
        ((sz >> 24) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
        ((sz >> 8) & 0xFF).toByte, (sz & 0xFF).toByte,
        0.toByte, 0.toByte, 0.toByte) ++ t
    }
    val frames = frame("TIT2", title) ++ frame("TPE1", artist) ++
      frame("TRCK", track)
    val tagSize = frames.length + 16 // + padding
    val hdr = Array('I'.toByte, 'D'.toByte, '3'.toByte, 3.toByte, 0.toByte,
      0.toByte,
      ((tagSize >> 21) & 0x7F).toByte, ((tagSize >> 14) & 0x7F).toByte,
      ((tagSize >> 7) & 0x7F).toByte, (tagSize & 0x7F).toByte)
    val audio = Array(0xFF.toByte, 0xFB.toByte, 0x92.toByte, 0.toByte)
    hdr ++ frames ++ new Array[Byte](16) ++ audio
  }

  /** A REAL JPEG (ImageIO-encoded baseline JFIF) with a hand-built EXIF
    * APP1 segment spliced immediately after SOI — where the EXIF spec
    * puts it. The TIFF body inside APP1 is written in the REQUESTED
    * byte order ('II' little / 'MM' big — the only mainstream container
    * whose endianness is per-file data, not per-format), with IFD0
    * holding ImageWidth (0x0100, LONG), ImageLength (0x0101, LONG) and
    * Orientation (0x0112, SHORT — inline value left-justified in the
    * 4-byte field per TIFF 6.0) in ascending-tag order. The JPEG layer
    * around it (marker lengths, SOF dimensions) stays big-endian
    * regardless — m19's sniff must switch conventions mid-walk.
    */
  def renderJpegExif(w: Int, h: Int, orientation: Int,
      bigEndian: Boolean, gray: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && orientation >= 1 && orientation <= 8,
      s"bad jpeg params ($w, $h, $orientation)")
    val img = new java.awt.image.BufferedImage(w, h,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 7 + y * 13) % 255) * 0x010101); x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpg = bos.toByteArray
    val tiff = scala.collection.mutable.ArrayBuffer[Byte]()
    def u16(v: Int): Unit =
      if (bigEndian) tiff ++= Seq(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      else tiff ++= Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32(v: Int): Unit =
      if (bigEndian) { u16((v >> 16) & 0xFFFF); u16(v & 0xFFFF) }
      else { u16(v & 0xFFFF); u16((v >> 16) & 0xFFFF) }
    tiff ++= (if (bigEndian) "MM" else "II").getBytes("US-ASCII")
    u16(42); u32(8) // magic + IFD0 offset
    u16(3)          // three directory entries
    def entry(tag: Int, typ: Int, put: () => Unit): Unit = {
      u16(tag); u16(typ); u32(1); put()
    }
    entry(0x0100, 4, () => u32(w))
    entry(0x0101, 4, () => u32(h))
    entry(0x0112, 3, () => { u16(orientation); u16(0) }) // left-justified
    u32(0)          // no next IFD
    val app1 = scala.collection.mutable.ArrayBuffer[Byte](
      0xFF.toByte, 0xE1.toByte)
    val len = 2 + 6 + tiff.size // JPEG segment length is ALWAYS big-endian
    app1 ++= Seq(((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte)
    app1 ++= "Exif".getBytes("US-ASCII"); app1 ++= Seq(0.toByte, 0.toByte)
    app1 ++= tiff
    jpg.take(2) ++ app1 ++ jpg.drop(2)
  }

  /** REAL audio decoder on `javax.sound.sampled` (JDK-built-in; WAV/PCM
    * parsing is pure Java, no audio device or native codec needed):
    * bytes → [[AudioFeatures]] with exact integer statistics. Same
    * per-partition iterator seam as [[decodeImage]] — m10 drives it with
    * genuine rendered WAVs against a closed-form oracle, closing the
    * "audio decode is stubbed" gap the way m08 closed the image one.
    */
  def decodeAudio(mediaId: Long, bytes: Array[Byte]): AudioFeatures =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
      val data = in.readAllBytes()
      val n = data.length / 2
      var peak = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
      var prevSign = 0
      var i = 0
      while (i < n) {
        val s = ((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)).toLong
        val a = math.abs(s)
        if (a > peak) peak = a
        sumAbs += a; sumSq += s * s
        val sign = java.lang.Long.signum(s)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) zc += 1
          prevSign = sign
        }
        i += 1
      }
      AudioFeatures(mediaId, n, fmt.getSampleRate.toInt, fmt.getChannels,
        peak, sumAbs, sumSq, zc, decode_ok = true)
    } catch { case _: Exception =>
      AudioFeatures(mediaId, -1L, -1, 0, -1L, -1L, -1L, 0L,
        decode_ok = false)
    }

  /** One decoded frame of a multi-frame (animated) asset. */
  final case class FrameFeatures(
      media_id: Long, n_frames: Int, width: Int, height: Int,
      frame_idx: Int, luma_x1000: Long, decode_ok: Boolean)

  /** Render a REAL multi-frame animated GIF (one solid color per frame)
    * via the JDK's ImageIO GIF writer — the video-adjacent fixture:
    * GIF is lossless for ≤256 colors, so each frame's decoded color is
    * bit-exact and per-frame features have closed forms.
    */
  def renderGifFrames(w: Int, h: Int, rgbs: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    rgbs.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  /** REAL frame-sampling decoder over multi-frame GIF bytes (the m03
    * "sample every k-th frame" semantics, on genuine decoded frames):
    * ImageIO's GIF reader exposes the frame sequence; every `stride`-th
    * frame is decoded and reduced to the same 9×8 sampled Rec.601 luma
    * as [[decodeImage]]. Undecodable bytes yield one sentinel row.
    */
  def sampleFrames(mediaId: Long, bytes: Array[Byte],
      stride: Int): Seq[FrameFeatures] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      val rows = (0 until n by stride).map { i =>
        val img = reader.read(i)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val px = img.getRGB(math.min(x * w / 9, w - 1),
              math.min(y * h / 8, h - 1))
            sum += 299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
              114L * (px & 0xff)
            x += 1
          }
          y += 1
        }
        FrameFeatures(mediaId, n, w, h, i, sum / 72L, decode_ok = true)
      }
      reader.dispose()
      rows
    } catch { case _: Exception =>
      Seq(FrameFeatures(mediaId, -1, -1, -1, -1, -1L, decode_ok = false))
    }

  /** A VARIABLE-length ISO-BMFF (MP4) stream for m26's box walk —
    * where [[renderMp4]]/[[renderMp4Video]] are fixed-size sniff
    * fixtures, this one has a variable top-level box SEQUENCE the walk
    * must stride: ftyp(20) + moov(8 + mvhd 108) + k mdat boxes of
    * varying payload length, all fields big-endian per ISO 14496-12.
    * k, timescale, duration and the mdat payload lengths derive from
    * (nChars) arithmetic so the oracle can state every expected count
    * in closed form without parsing a byte.
    */
  def renderMp4Stream(id: Long, nChars: Long): Array[Byte] = {
    val ts = (nChars % 1000 + 600).toInt
    val dur = (nChars * 3 % 90000).toInt
    val k = (nChars % 4 + 1).toInt
    val payloads = (0 until k).map(j => (nChars % 50 + 10 * j + 1).toInt)
    val bb = java.nio.ByteBuffer.allocate(136 + payloads.map(_ + 8).sum)
    bb.putInt(20); bb.put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")); bb.putInt(512)
    bb.put("mp42".getBytes("US-ASCII"))
    bb.putInt(116); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(108); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0)               // version + flags
    bb.putInt(0); bb.putInt(0) // creation / modification time
    bb.putInt(ts); bb.putInt(dur)
    bb.putInt(0x00010000)      // rate 1.0; rest of mvhd stays zero
    bb.position(136)
    payloads.foreach { p =>
      bb.putInt(8 + p); bb.put("mdat".getBytes("US-ASCII"))
      bb.position(bb.position() + p) // payload bytes stay zero
    }
    bb.array()
  }

  /** The ISO-BMFF top-level box walk as ONE native aggregate() fold
    * over the binary column `c` — m24's variable-stride record walk
    * for the VIDEO container: each step reads the 4-byte big-endian
    * box size and the 4CC type (via hex(substring(...)) — m23's u8/hex
    * idiom, since box fields are binary, not ASCII lines), validates
    * ftyp-first and size ≥ 8, strides `size` bytes to the next box,
    * and carries (box count, mdat payload bytes, mvhd
    * timescale/duration parsed INSIDE moov at its fixed ISO offsets,
    * ftyp brand) through the state. A stream that fails the grammar at
    * box 1 (bad magic / undersized box) sentinels as 'corrupt'; one
    * whose current box overruns EOF stops with the COMPLETE-box counts
    * and status 'truncated' (the crash-mid-write case, m24's
    * convention). Header fields are let-bound via the single-element
    * transform so each big-endian read happens once per box. Zero UDF,
    * zero shuffle — the map-parallel router for video corpora.
    */
  def mp4WalkExpr(c: String, maxBox: Int): String = {
    val keep = "'off', st.off, 'nbox', st.nbox, 'mdat', st.mdat, " +
      "'ts', st.ts, 'dur', st.dur, 'brand', st.brand"
    def be(pos: String, len: Int) =
      s"CAST(conv(hex(substring($c, CAST($pos AS INT), $len)), 16, 10) AS BIGINT)"
    val corrupt = "named_struct('off', st.off, 'nbox', -1L, 'mdat', -1L, " +
      "'ts', -1L, 'dur', -1L, 'brand', '?', 'status', 'corrupt')"
    val step = s"""
      CASE WHEN st.status <> 'run' THEN st
           WHEN st.off > octet_length($c)
             THEN named_struct($keep, 'status', 'end')
           WHEN st.off + 7 > octet_length($c)
             THEN named_struct($keep, 'status', 'truncated')
           ELSE element_at(transform(array(named_struct(
                  'sz', ${be("st.off", 4)},
                  'typ', hex(substring($c, CAST(st.off + 4 AS INT), 4)))),
             h -> CASE
               WHEN h.sz < 8 THEN $corrupt
               WHEN st.nbox = 0L AND h.typ <> '66747970' THEN $corrupt
               WHEN st.off + h.sz - 1 > octet_length($c)
                 THEN named_struct($keep, 'status', 'truncated')
               ELSE named_struct(
                 'off', st.off + h.sz,
                 'nbox', st.nbox + 1L,
                 'mdat', st.mdat + IF(h.typ = '6D646174', h.sz - 8L, 0L),
                 'ts', IF(h.typ = '6D6F6F76', ${be("st.off + 28", 4)}, st.ts),
                 'dur', IF(h.typ = '6D6F6F76', ${be("st.off + 32", 4)}, st.dur),
                 'brand', IF(h.typ = '66747970',
                   decode(substring($c, CAST(st.off + 8 AS INT), 4), 'UTF-8'),
                   st.brand),
                 'status', 'run') END), 1) END"""
    s"""aggregate(sequence(1, $maxBox),
          named_struct('off', 1L, 'nbox', 0L, 'mdat', 0L, 'ts', -1L,
            'dur', -1L, 'brand', '?', 'status', 'run'),
          (st, i) -> $step)"""
  }

  /** Per-asset grid-COLUMN luma sums from a REAL image decode — m25's
    * training features: `s_left` is the sum over the 8 grid rows of
    * the Rec.601 luma sampled at grid column 0, `s_right` likewise at
    * column 8 (the same integer nearest-neighbor kernel as
    * [[decodeImage]]'s 9×8 grid). For a rendered [[renderSplitPng]]
    * with even w ≥ 16, column 0 lands on the left color and column 8
    * on the right (⌊8w/9⌋ ≥ w/2), so both sums have exact closed
    * forms: 8·luma(left) and 8·luma(right) — which is what lets the
    * oracle replay a REAL-decode feature pipeline in SQL.
    */
  final case class GridColFeatures(
      media_id: Long, s_left: Long, s_right: Long, decode_ok: Boolean)

  /** REAL ImageIO decode → [[GridColFeatures]]; sentinels for
    * undecodable bytes (the m-series convention).
    */
  def decodeGridCols(mediaId: Long, bytes: Array[Byte]): GridColFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) GridColFeatures(mediaId, -1L, -1L, decode_ok = false)
    else {
      val w = img.getWidth
      val h = img.getHeight
      def luma(x: Int, y: Int): Long = {
        val px = img.getRGB(math.min(x * w / 9, w - 1),
          math.min(y * h / 8, h - 1))
        299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
          114L * (px & 0xff)
      }
      var sl = 0L; var sr = 0L
      var y = 0
      while (y < 8) { sl += luma(0, y); sr += luma(8, y); y += 1 }
      GridColFeatures(mediaId, sl, sr, decode_ok = true)
    }
  }

  /** Render a 16-strip GRAYSCALE PNG (m27's paired-image fixture):
    * strip b spans columns [b·w/16, (b+1)·w/16) in the uniform gray
    * `grays(b)`. With w a positive multiple of 16, the
    * [[decodeGridStrips]] sample column b·w/16 lands inside strip b,
    * and luma of gray g is exactly (299+587+114)·g = 1000·g — so every
    * decoded strip sum has the closed form 8·1000·g_b the oracle can
    * state in SQL.
    */
  def renderStripPng(w: Int, h: Int, grays: Array[Int]): Array[Byte] = {
    require(w >= 16 && w % 16 == 0 && h >= 8 && grays.length == 16,
      s"closed form needs w % 16 = 0, h >= 8, 16 grays; got w=$w h=$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = grays(x * 16 / w) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL ImageIO decode → 16 grid-column luma sums ([[decodeGridCols]]
    * generalized from 2 sampled columns to 16 — the m08 discipline):
    * sample x = b·w/16 across 8 rows, sum the integer lumas. For
    * [[renderStripPng]] output each sum is exactly 8000·g_b. Sentinel
    * (all −1) on undecodable bytes, the m-series convention.
    */
  def decodeGridStrips(mediaId: Long, bytes: Array[Byte]): Array[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) Array.fill(16)(-1L)
    else {
      val w = img.getWidth
      val h = img.getHeight
      Array.tabulate(16) { b =>
        var s = 0L
        var y = 0
        while (y < 8) {
          val px = img.getRGB(math.min(b * w / 16, w - 1),
            math.min(y * h / 8, h - 1))
          s += 299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
            114L * (px & 0xff)
          y += 1
        }
        s
      }
    }
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
  /** One WARC/1.0 record (ISO 28500 §4): version line, named header
    * fields, Content-Length in BYTES, a blank line, the payload, and
    * the spec's two trailing CRLFs. Everything synthesized here is
    * ASCII, so byte length == char length and Content-Length is
    * payload.length — the premise m24/c23 document (WARC headers are
    * ASCII by spec; a binary-payload generalization walks the same
    * offsets through m23's u8/hex idiom instead of substring).
    */
  def renderWarcRecord(typ: String, uri: String, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  /** m24's archive fixture: K = (nChars % 3) + 2 records — even slots
    * are HTML responses with a length-varying body, odd slots metadata
    * records — so the walk must stride over MIXED types and sizes. The
    * recipe is pure (id, nChars)-arithmetic, so the oracle rebuilds the
    * same payload strings in SQL.
    */
  def renderWarc(id: Long, nChars: Long): String = {
    val k = (nChars % 3) + 2
    (0L until k).map { j =>
      if (j % 2 == 0)
        renderWarcRecord("response", s"http://ex.org/$id/$j",
          s"<html><title>p$id-$j</title><body>" +
            "ab " * ((nChars % 7) + j + 1).toInt + "</body></html>")
      else renderWarcRecord("metadata", s"http://ex.org/$id/$j", s"meta $id $j")
    }.mkString
  }

  /** The WARC record walk as ONE native aggregate() fold over the
    * archive string column `warcCol` — m23's variable-stride directory
    * walk generalized to length-delimited header-then-payload records:
    * each step validates the "WARC/1.0" magic, finds the header
    * terminator (locate CRLFCRLF), parses Content-Length / WARC-Type /
    * WARC-Target-URI out of the header block, strides
    * header + payload + trailing-CRLFCRLF to the next record, and
    * carries (record count, response count, payload bytes, first URI,
    * first response payload) through the state. Corrupt archives fail
    * the magic into sentinels at step 1 (the m23 convention); an
    * archive that ends mid-record (header never closes, or the payload
    * + trailer would overrun EOF) stops with status 'truncated' and
    * the COMPLETE-record counts — the crash-mid-write case a crawl
    * ingester must survive. `maxRec` bounds the fold (records + 1 step
    * to observe the clean end). Header fields are let-bound via the
    * t31 single-element-transform idiom so each regexp runs once per
    * record, not once per use. Zero UDF, zero shuffle — at 100 TB this
    * is the map-parallel router that turns raw crawl archives into
    * queryable records without a custom reader.
    */
  def warcWalkExpr(warcCol: String, maxRec: Int): String = {
    val keep = "'off', st.off, 'nrec', st.nrec, 'nresp', st.nresp, " +
      "'pbytes', st.pbytes, 'furi', st.furi, 'body', st.body"
    val hdrSub =
      s"substring($warcCol, CAST(st.off AS INT), CAST(hend - st.off AS INT))"
    val step = s"""
      CASE WHEN st.status <> 'run' THEN st
           WHEN st.off > length($warcCol)
             THEN named_struct($keep, 'status', 'end')
           WHEN substring($warcCol, CAST(st.off AS INT), 8) <> 'WARC/1.0'
             THEN named_struct('off', st.off, 'nrec', -1L, 'nresp', -1L,
                    'pbytes', -1L, 'furi', '?', 'body', '?',
                    'status', 'corrupt')
           ELSE element_at(transform(
             array(CAST(locate('\\r\\n\\r\\n', $warcCol, CAST(st.off AS INT)) AS BIGINT)),
             hend -> CASE WHEN hend = 0
               THEN named_struct($keep, 'status', 'truncated')
               ELSE element_at(transform(array(named_struct(
                      'cl', CAST(regexp_extract($hdrSub,
                              'Content-Length: ([0-9]+)', 1) AS BIGINT),
                      'typ', regexp_extract($hdrSub,
                               'WARC-Type: ([^\\r]+)', 1),
                      'uri', regexp_extract($hdrSub,
                               'WARC-Target-URI: ([^\\r]+)', 1))),
                 h -> CASE WHEN h.cl IS NULL
                             OR hend + 3 + h.cl + 4 > length($warcCol)
                        THEN named_struct($keep, 'status', 'truncated')
                        ELSE named_struct(
                          'off', hend + 8 + h.cl,
                          'nrec', st.nrec + 1L,
                          'nresp', st.nresp + IF(h.typ = 'response', 1L, 0L),
                          'pbytes', st.pbytes + h.cl,
                          'furi', IF(st.nrec = 0L, h.uri, st.furi),
                          'body', IF(h.typ = 'response' AND st.body = '',
                            substring($warcCol, CAST(hend + 4 AS INT),
                              CAST(h.cl AS INT)), st.body),
                          'status', 'run') END), 1) END), 1) END"""
    s"""aggregate(sequence(1, $maxRec),
          named_struct('off', 1L, 'nrec', 0L, 'nresp', 0L, 'pbytes', 0L,
            'furi', '?', 'body', '', 'status', 'run'),
          (st, i) -> $step)"""
  }

  /** Batched inference over the media table (m04). The forward step
    * here is deterministic placeholder arithmetic that exists to pin
    * the batch-assembly contract — deterministic membership, batch
    * ordering, provenance columns — which is the part Spark owns; a
    * GPU deployment would replace the `scores` line with the
    * accelerator call over `batch`. m25 is the genuinely TRAINED lane:
    * it assembles its own typed batches in MultimodalQueries (its rows
    * carry decoded integer features rather than raw bytes) and runs a
    * `logisticTrainMicro`-learned scorer through the same
    * groupByKey/flatMapGroups shape. (ADVICE r13: an injectable
    * forward parameter sat here with no non-default caller — dead
    * generality, removed.)
    */
  def inferBatched(spark: SparkSession, dir: String, batchSize: Int = 16)
      : Dataset[InferenceOut] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .groupByKey(_.media_id / batchSize)
      .flatMapGroups { (batchId: Long, rows: Iterator[MediaRow]) =>
        val batch = rows.toArray.sortBy(_.media_id) // assemble inference batch
        val scores = batch.zipWithIndex.map { case (r, i) =>
          r.content.length.toDouble * batch.length + i }
        batch.iterator.zipWithIndex.map { case (r, i) =>
          InferenceOut(r.media_id, batchId, batch.length, i, scores(i))
        }
      }
  }
}
