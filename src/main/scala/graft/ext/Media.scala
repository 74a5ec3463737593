package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `BINARY` columns with a typed metadata struct; decode / feature-extract
 * run as batched per-partition passes.
 *
 * The decode step is REAL for PPM (P6) — an uncompressed raster format that
 * needs no codec library, so [[decodePpm]] genuinely parses headers and
 * raster bytes, [[ppmFeatures]] extracts per-channel statistics, and
 * [[resizePpm]] resamples pixels (nearest-neighbor). For compressed codecs
 * (JPEG/MP3/H.264), which don't ship in this environment, [[stubDecode]]
 * stands in — the surrounding plumbing (schema, `mapPartitions` batch
 * shape, partition sizing, typed output) is identical either way.
 *
 * Scale design (100 TB): payload columns dominate row size, so feature
 * extraction must be a single narrow pass — `mapPartitions` (no shuffle),
 * with `spark.sql.files.maxPartitionBytes` bounding the per-task working
 * set. Outputs are small scalar features, so the expensive bytes are read
 * once and dropped before any shuffle. Never collect payloads to the driver.
 */
object Media {

  /** One media row: id + opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      content_md5: String,
      width: Int,    // stub-decoded
      height: Int,   // stub-decoded
      mean_byte: Double)

  /** Synthesize a media table from the documents table (UTF-8 text bytes as
   *  the opaque payload) — stands in for reading real image/audio files. */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("kind"),
      col("text").cast("binary").as("content")).as[MediaRow]
  }

  /** Deterministic fake decode: a real implementation would parse the codec
   *  header; the stub derives plausible dims from the byte length. */
  def stubDecode(bytes: Array[Byte]): (Int, Int) =
    (bytes.length % 640 + 1, bytes.length % 480 + 1)

  /** Batched per-partition feature extraction — the `mapPartitions` pass a
   *  real decoder plugs into. One narrow stage, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (a real codec would allocate its context here)
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.content).map("%02x".format(_)).mkString
        val (w, h) = stubDecode(r.content)
        val mean =
          if (r.content.isEmpty) 0.0
          else r.content.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / r.content.length
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, digest, w, h, mean)
      }
    }
  }

  /** Column-only equivalent of the md5/length features (no mapPartitions) —
   *  used by the oracle-compared query and to cross-check the typed path. */
  def featureColumns(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("content")).cast("long").as("byte_len"),
      md5(col("content")).as("content_md5"))

  /** One resized "image" row: stub pixels are a deterministic function of
   *  the source bytes + target dims (a real codec would decode + resample). */
  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int, thumb: Array[Byte])

  /** Resize pass — same mapPartitions batch shape as [[extractFeatures]];
   *  output payload is WxH "pixels" (bounded size per row, so downstream
   *  shuffles move thumbnails, never source bytes). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // stub resample: cycle source bytes into the target raster
        val out = Array.tabulate[Byte](w * h)(i =>
          if (r.content.isEmpty) 0 else r.content(i % r.content.length))
        ResizedMedia(r.media_id, r.kind, w, h, out)
      }
    }
  }

  /** One sampled "frame": a fixed-size byte window at a deterministic
   *  offset — the plumbing shape of video frame sampling (a real decoder
   *  would seek keyframes). */
  final case class MediaFrame(
      media_id: Long, frame_no: Int, offset: Long, frame: Array[Byte])

  /** Sample up to `nFrames` evenly-spaced fixed-size windows per payload.
   *  flatMap shape: one input row → few bounded rows, no shuffle. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int,
      frameBytes: Int = 16): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = math.min(nFrames, math.max(1, r.content.length / frameBytes))
      (0 until n).map { i =>
        val off = (r.content.length.toLong * i) / n
        val end = math.min(off + frameBytes, r.content.length.toLong).toInt
        MediaFrame(r.media_id, i, off, r.content.slice(off.toInt, end))
      }
    }
  }

  // ---- REAL codec path: binary PPM (P6) ------------------------------------

  /** A decoded 8-bit RGB raster: `pixels.length == width * height * 3`,
   *  row-major, channel-interleaved. */
  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  /** Encode an RGB raster as binary PPM (P6). */
  def encodePpm(img: PpmImage): Array[Byte] = {
    require(img.pixels.length.toLong == img.width.toLong * img.height * 3,
      s"raster ${img.pixels.length} != ${img.width}x${img.height}x3")
    s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ img.pixels
  }

  /** REAL decode of a binary PPM (P6) payload: parses the header per the
   *  netpbm spec (any whitespace between tokens, `#` comments to end of
   *  line, exactly one whitespace byte after maxval), validates maxval 255
   *  and the raster length. Malformed payloads throw — a corrupt record in
   *  a 100 TB corpus must fail (or be quarantined by the caller), never
   *  decode to garbage silently. */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad PPM payload: $msg")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var going = true
      while (going) {
        while (i < bytes.length && isWs(bytes(i))) i += 1
        if (i < bytes.length && bytes(i) == '#')
          while (i < bytes.length && bytes(i) != '\n') i += 1
        else going = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      if (i == start) fail("truncated header")
      new String(bytes, start, i - start, java.nio.charset.StandardCharsets.US_ASCII)
    }
    if (token() != "P6") fail("not a P6 magic")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    i += 1 // exactly ONE whitespace byte separates maxval from the raster
    // Long math: a crafted header like 65536x65536 overflows w*h*3 in Int,
    // letting the length check pass with a wrong-sized raster — bound dims
    // and compare in Long so malformed payloads throw, never decode short
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) fail(s"bad dims ${w}x$h")
    val expected = w.toLong * h * 3
    if ((bytes.length - i).toLong != expected)
      fail(s"raster has ${bytes.length - i} bytes, expected $expected")
    PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, i, bytes.length))
  }

  /** Nearest-neighbor resample — the real pixel math a thumbnail pipeline
   *  runs (box/bilinear would slot in the same loop). */
  def resizePpm(img: PpmImage, tw: Int, th: Int): PpmImage = {
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        val s = (sy * img.width + sx) * 3
        val d = (y * tw + x) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1); out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(tw, th, out)
  }

  /** Features out of the REAL decoder. Channel means are exact rationals
   *  (integer sum / pixel count) so they reproduce bit-identically. */
  final case class PpmFeatures(
      media_id: Long, width: Int, height: Int, n_pixels: Long, byte_len: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Decode + per-channel stats in one narrow mapPartitions pass. */
  def ppmFeatures(media: Dataset[MediaRow]): Dataset[PpmFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodePpm(r.content)
        var sr = 0L; var sg = 0L; var sb = 0L
        var p = 0
        while (p < img.pixels.length) {
          sr += img.pixels(p) & 0xff
          sg += img.pixels(p + 1) & 0xff
          sb += img.pixels(p + 2) & 0xff
          p += 3
        }
        val n = img.width.toLong * img.height
        PpmFeatures(r.media_id, img.width, img.height, n, r.content.length.toLong,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
  }

  /** Synthesize deterministic PPM payloads from the documents table: dims
   *  are small mod-functions of `doc_id`, pixels an md5 keystream of the
   *  text — so tests and the oracle can predict dims/sizes while the
   *  DECODER (not the synthesizer) produces every output value. */
  def synthesizePpmFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { case (id, text) =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        md.reset()
        val seed = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val pixels = Array.tabulate[Byte](w * h * 3)(i =>
          (seed(i % seed.length) ^ (i & 0x7f)).toByte)
        MediaRow(id, "image/ppm", encodePpm(PpmImage(w, h, pixels)))
      }
    }
  }

  // ---- PERCEPTUAL HASH (aHash) over the real PPM decode --------------------

  /**
   * 8×8 mean-threshold AVERAGE HASH (aHash) of a PPM payload — the
   * perceptual-dedup primitive for image corpora: byte-level noise
   * (re-encodes, slight brightness jitter) that never crosses the image's
   * own luma mean leaves the hash IDENTICAL, so near-duplicate images
   * collapse to one 64-bit key and dedup becomes the same equi-join
   * machinery text fingerprints use. Pipeline: real decode → nearest-
   * neighbor resize to 8×8 → integer luma per cell → bit (r·8+c) set iff
   * luma > mean. Deterministic integer arithmetic end-to-end.
   */
  def ppmAHash(bytes: Array[Byte]): Long = {
    val small = resizePpm(decodePpm(bytes), 8, 8)
    val luma = Array.tabulate(64) { i =>
      val p = i * 3
      ((small.pixels(p) & 0xff) + (small.pixels(p + 1) & 0xff) +
        (small.pixels(p + 2) & 0xff)) / 3
    }
    val mean = luma.sum / 64 // integer mean: exact, replayable
    luma.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
      if (v > mean) h | (1L << i) else h
    }
  }

  final case class PpmHash(media_id: Long, ahash: Long, byte_len: Long)

  /** Decode + aHash in one narrow mapPartitions pass (the batch shape). */
  def ppmAHashes(media: Dataset[MediaRow]): Dataset[PpmHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      PpmHash(r.media_id, ppmAHash(r.content), r.content.length.toLong)))
  }

  /**
   * aHash FIXTURE with analytic structure: 8×8 images whose BRIGHT ROW is
   * `doc_id % 7` (values 200 + id%40, always above the image mean) over a
   * dim background (10 + id%15, always below) — so every image's BYTES are
   * id-distinct (no two payloads equal) while its aHash depends ONLY on the
   * bright-row index: hash = 0xFF << (8·(id%7)), exactly replayable in SQL.
   * This is the perceptual-dedup property in miniature: byte-noise within
   * the luma bands never moves the hash.
   */
  def synthesizeAHashPpms(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val bright = (200 + (id % 40)).toInt
      val bg = (10 + (id % 15)).toInt
      val row = (id % 7).toInt
      val pixels = Array.tabulate[Byte](8 * 8 * 3) { i =>
        val r = (i / 3) / 8
        (if (r == row) bright else bg).toByte
      }
      MediaRow(id, "image/ppm", encodePpm(PpmImage(8, 8, pixels)))
    })
  }

  // ---- REAL codec path: WAV (RIFF, 16-bit PCM) -----------------------------

  /** Decoded mono/stereo 16-bit PCM audio: `samples` is channel-interleaved,
   *  so frame count = samples.length / channels. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Encode as canonical 44-byte-header RIFF/WAVE PCM16. */
  def encodeWav(a: WavAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val blockAlign = a.channels * 2
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ascii)).putInt(36 + dataLen).put("WAVE".getBytes(ascii))
    out.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * blockAlign)         // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16.toShort)                      // bits/sample
    out.put("data".getBytes(ascii)).putInt(dataLen)
    a.samples.foreach(s => out.putShort(s))
    out.array()
  }

  /** REAL decode of a RIFF/WAVE payload: walks the chunk list (skipping
   *  unknown chunks such as LIST/INFO, with RIFF's odd-size pad byte, the
   *  way real-world files demand), requires uncompressed 16-bit PCM, and
   *  validates the data length. Malformed payloads throw. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad WAV payload: $msg")
    if (bytes.length < 12) fail("truncated RIFF header")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    if (fourcc() != "RIFF") fail("not a RIFF container")
    buf.getInt // declared riff size (not trusted; we walk to the buffer end)
    if (fourcc() != "WAVE") fail("not a WAVE form")
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[Array[Short]] = None
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) fail(s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          val audioFormat = buf.getShort
          if (audioFormat != 1) fail(s"unsupported audio format $audioFormat (PCM only)")
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          if (bits != 16) fail(s"unsupported bit depth $bits (16-bit only)")
          buf.position(buf.position() + (size - 16)) // fmt extensions
          fmt = Some((channels, rate))
        case "data" =>
          if (size % 2 != 0) fail("odd PCM16 data length")
          val samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          data = Some(samples)
        case _ => // unknown chunk (LIST, INFO, fact, ...): skip + pad byte
          buf.position(buf.position() + size + (size % 2))
      }
    }
    val (channels, rate) = fmt.getOrElse(fail("missing fmt chunk"))
    val samples = data.getOrElse(fail("missing data chunk"))
    if (channels < 1) fail("zero channels")
    if (samples.length % channels != 0) fail("data length not frame-aligned")
    WavAudio(rate, channels, samples)
  }

  /** Features out of the REAL audio decoder: frame count, exact integer
   *  duration, peak, zero-crossing count (integers reproduce exactly;
   *  RMS is a double but derives from an exact integer energy sum). */
  final case class WavFeatures(
      media_id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      duration_us: Long, byte_len: Long, peak: Int, zero_crossings: Long,
      rms: Double)

  /** Decode + PCM stats (first channel) in one narrow mapPartitions pass. */
  def wavFeatures(media: Dataset[MediaRow]): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val a = decodeWav(r.content)
        var energy = 0L; var peak = 0; var zc = 0L
        var i = 0
        while (i < a.samples.length) {
          val s = a.samples(i).toInt
          energy += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s)
          // zero-crossings on the first channel's stream
          if (i >= a.channels &&
              ((a.samples(i - a.channels) < 0) != (s < 0))) zc += 1
          i += a.channels
        }
        val frames = (a.samples.length / a.channels).toLong
        WavFeatures(r.media_id, a.sampleRate, a.channels, frames,
          frames * 1000000L / a.sampleRate, r.content.length.toLong, peak, zc,
          math.sqrt(energy.toDouble / math.max(1L, frames)))
      }
    }
  }

  /** Deterministic mono PCM16 payloads from the documents table: 8 kHz,
   *  frame count a mod-function of `doc_id`, samples an md5 keystream —
   *  dims/sizes predictable for the oracle while every compared value
   *  flows out of the chunk parser. */
  def synthesizeWavFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { case (id, text) =>
        val n = 50 + (id % 200).toInt
        md.reset()
        val seed = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val samples = Array.tabulate[Short](n)(i =>
          (((seed(i % seed.length) & 0xff) - 128) * 257).toShort)
        MediaRow(id, "audio/wav", encodeWav(WavAudio(8000, 1, samples)))
      }
    }
  }

  /**
   * Audio-fingerprint FIXTURE with analytic structure: fixed-length (800
   * frame) square waves whose HALF-PERIOD is `1 + doc_id % 5` samples and
   * whose AMPLITUDE is `1000 + doc_id % 4000` — every payload's bytes are
   * id-distinct (amplitude), while the zero-crossing count depends ONLY on
   * the half-period: `floor(799 / half)`, exactly replayable in SQL. The
   * acoustic-dedup property in miniature: loudness changes (re-encodes,
   * gain) never move the crossing signature.
   */
  def synthesizeSquareWavs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val half = 1 + (id % 5).toInt
      val amp = (1000 + (id % 4000)).toInt
      val samples = Array.tabulate[Short](800)(i =>
        (if ((i / half) % 2 == 0) amp else -amp).toShort)
      MediaRow(id, "audio/wav", encodeWav(WavAudio(8000, 1, samples)))
    })
  }

  // ---- REAL codec path: Y4M video (YUV4MPEG2, raw 4:2:0 frames) ------------

  /** Decoded raw video: per-frame YUV 4:2:0 planes
   *  (`width*height*3/2` bytes each). Dims must be even (chroma subsampling). */
  final case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Array[Array[Byte]])

  private def y4mFrameBytes(w: Int, h: Int): Int = w * h * 3 / 2

  /** Encode as YUV4MPEG2 with the standard stream header + per-frame FRAME
   *  markers. */
  def encodeY4m(v: Y4mVideo): Array[Byte] = {
    require(v.width % 2 == 0 && v.height % 2 == 0, "4:2:0 needs even dims")
    val fb = y4mFrameBytes(v.width, v.height)
    v.frames.foreach(f => require(f.length == fb, s"frame ${f.length} != $fb"))
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C420jpeg\n"
        .getBytes(ascii)
    val marker = "FRAME\n".getBytes(ascii)
    val buf = new java.io.ByteArrayOutputStream(
      header.length + v.frames.length * (marker.length + fb))
    buf.write(header)
    v.frames.foreach { f => buf.write(marker); buf.write(f) }
    buf.toByteArray
  }

  /** REAL decode of a YUV4MPEG2 payload: parses the parameter line
   *  (W/H/F required, unknown parameters tolerated, chroma must be a 420
   *  variant or absent), then walks FRAME markers — each may carry its own
   *  parameters up to the newline, which real encoders do emit — and slices
   *  fixed-size 4:2:0 rasters. Malformed payloads throw. */
  def decodeY4m(bytes: Array[Byte]): Y4mVideo = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad Y4M payload: $msg")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    var i = 0
    def line(): String = {
      val start = i
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) fail("truncated header line")
      val s = new String(bytes, start, i - start, ascii)
      i += 1 // consume the newline
      s
    }
    val header = line()
    if (!header.startsWith("YUV4MPEG2")) fail("not a YUV4MPEG2 stream")
    var w = -1; var h = -1; var fn = -1; var fd = -1
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { p =>
      p.head match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'F' => p.tail.split(':') match {
          case Array(a, b) => fn = a.toInt; fd = b.toInt
          case _ => fail(s"bad frame rate $p")
        }
        case 'C' => if (!p.tail.startsWith("420")) fail(s"unsupported chroma ${p.tail}")
        case _ => // interlacing, aspect, extensions: tolerated
      }
    }
    if (w <= 0 || h <= 0) fail("missing W/H")
    if (fn <= 0 || fd <= 0) fail("missing F rate")
    if (w % 2 != 0 || h % 2 != 0) fail("odd dims with 4:2:0 chroma")
    val fb = y4mFrameBytes(w, h)
    val frames = Seq.newBuilder[Array[Byte]]
    while (i < bytes.length) {
      val marker = line()
      if (!marker.startsWith("FRAME")) fail(s"expected FRAME marker, got '$marker'")
      if (bytes.length - i < fb) fail("truncated frame raster")
      frames += java.util.Arrays.copyOfRange(bytes, i, i + fb)
      i += fb
    }
    Y4mVideo(w, h, fn, fd, frames.result().toArray)
  }

  /** One sampled decoded frame: luma statistics of every `stride`-th frame —
   *  the video-side training-data op (keyframe-ish sampling on a raw
   *  container seeks markers instead). */
  final case class SampledFrame(
      media_id: Long, frame_no: Int, width: Int, height: Int, mean_luma: Double)

  /** Decode + sample every `stride`-th frame in one narrow flatMap pass. */
  def sampleY4mFrames(media: Dataset[MediaRow], stride: Int): Dataset[SampledFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val v = decodeY4m(r.content)
      val n = v.width * v.height // luma plane
      v.frames.zipWithIndex.collect { case (f, idx) if idx % stride == 0 =>
        var s = 0L; var p = 0
        while (p < n) { s += f(p) & 0xff; p += 1 }
        SampledFrame(r.media_id, idx, v.width, v.height, s.toDouble / n)
      }
    }
  }

  /** Video-level features out of the REAL decoder. */
  final case class Y4mFeatures(
      media_id: Long, width: Int, height: Int, n_frames: Long,
      duration_us: Long, byte_len: Long)

  def y4mFeatures(media: Dataset[MediaRow]): Dataset[Y4mFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val v = decodeY4m(r.content)
        val n = v.frames.length.toLong
        Y4mFeatures(r.media_id, v.width, v.height, n,
          n * 1000000L * v.fpsDen / v.fpsNum, r.content.length.toLong)
      }
    }
  }

  /** Deterministic Y4M payloads from the documents table: even dims and
   *  frame counts are mod-functions of `doc_id` (single-digit dims → fixed
   *  39-byte stream header), planes an md5 keystream, 25 fps. */
  /**
   * Scene-cut FIXTURE with analytic structure: 4×4 videos of `7 + id % 4`
   * solid-luma frames with ONE hard cut at frame `1 + id % 5` — luma jumps
   * from a dim band (40 + id % 30) to a bright one (160 + id % 60), so the
   * per-frame mean-luma delta is ≥ 91 at the cut and exactly 0 inside
   * either segment. Byte-distinct payloads (luma jitter), analytic cut
   * position — SQL-replayable while Spark runs the real stream parser.
   */
  def synthesizeSceneCutY4ms(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val n = 7 + (id % 4).toInt
      val cut = 1 + (id % 5).toInt
      val dim = (40 + (id % 30)).toInt
      val bright = (160 + (id % 60)).toInt
      val fb = y4mFrameBytes(4, 4)
      val luma = 4 * 4
      val frames = Array.tabulate(n) { f =>
        val l = if (f < cut) dim else bright
        Array.tabulate[Byte](fb)(i => (if (i < luma) l else 128).toByte)
      }
      MediaRow(id, "video/y4m", encodeY4m(Y4mVideo(4, 4, 25, 1, frames)))
    })
  }

  def synthesizeY4mFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { case (id, text) =>
        val w = 4 + (id % 3).toInt * 2 // 4, 6, 8
        val h = 2 + (id % 2).toInt * 2 // 2, 4
        val n = 3 + (id % 6).toInt
        md.reset()
        val seed = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val fb = y4mFrameBytes(w, h)
        val frames = Array.tabulate(n)(fi =>
          Array.tabulate[Byte](fb)(i => (seed((fi + i) % seed.length) ^ (i & 0x3f)).toByte))
        MediaRow(id, "video/y4m", encodeY4m(Y4mVideo(w, h, 25, 1, frames)))
      }
    }
  }
}
