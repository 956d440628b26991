package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata.
  *
  * Decode comes in three tiers. UNCOMPRESSED container formats get
  * hand-rolled REAL decoders below — RIFF/WAV 16-bit PCM (magic
  * validation, chunk walking, little-endian sample reads) and 24-bit BMP
  * (data offset, bottom-up rows, 4-byte padding, BGR order) —
  * oracle-checked end-to-end via MM-WAV-DECODE / MM-BMP-DECODE.
  * COMPRESSED image formats the JDK ships codecs for (PNG, JPEG, GIF,
  * TIFF via `javax.imageio` — no external libraries) decode through
  * [[decodeImage]], oracle-checked via MM-PNG-DECODE (PNG is lossless, so
  * the per-channel means match the generative formula EXACTLY) and
  * MM-JPEG-DECODE (lossy — dimensions exact, means tolerance-checked).
  * Only codec-less formats (MP3/H.264) remain a clearly-marked
  * deterministic STUB. Everything around the decode — schema, batching,
  * partition-parallel execution via `mapPartitions`, typed `Dataset`
  * encoders — is the real Spark plumbing: a narrow per-partition pass, no
  * shuffle, partition sizing controlled by the upstream source split size.
  */
object Multimodal {

  /** An opaque media payload + metadata row. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features for one media row (stub-decoded). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, width: Int, height: Int)

  /** Byte-level metadata over a binary column — pure SQL expressions
    * (codegen'd), no decode: (media_id, n_bytes, digest, head_hex). */
  def binaryMeta(media: DataFrame, idCol: String = "media_id",
                 payloadCol: String = "payload"): DataFrame =
    media.select(
      col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      md5(col(payloadCol)).as("digest"),
      upper(hex(substring(col(payloadCol), 1, 8))).as("head_hex"))

  /** STUB decoder for the codec-less kinds ONLY (MP3/H.264 — no JVM codec
    * exists in this environment): deterministic fake dimensions from an
    * FNV checksum. Image kinds never reach this — [[decodeOne]] routes
    * them through the real JDK codecs. */
  private def fnv(payload: Array[Byte]): Long =
    payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)

  private def stubDecode(r: MediaRow): MediaFeatures = {
    // ??? <- MP3/H.264 codec call would go here; deterministic fake below
    val checksum = fnv(r.payload)
    MediaFeatures(r.media_id, r.kind, r.payload.length, checksum,
      width = math.abs(checksum % 1920).toInt + 1,
      height = math.abs(checksum % 1080).toInt + 1)
  }

  /** Per-row decode dispatch: every format the JVM can actually decode is
    * REAL — images (png/jpeg/jpg/gif/bmp/tiff) through [[decodeImage]],
    * wav through [[decodeWav]] (width = sample count); only codec-less
    * kinds (mp3, h264, opaque "text") fall back to the labeled stub. */
  private def decodeOne(r: MediaRow): MediaFeatures = r.kind match {
    case "png" | "jpeg" | "jpg" | "gif" | "bmp" | "tiff" =>
      val i = decodeImage(r.payload)
      MediaFeatures(r.media_id, r.kind, r.payload.length, fnv(r.payload),
        i.width, i.height)
    case "wav" =>
      val w = decodeWav(r.payload)
      MediaFeatures(r.media_id, r.kind, r.payload.length, fnv(r.payload),
        width = w.nSamples, height = 1)
    case _ => stubDecode(r)
  }

  /** Partition-parallel feature extraction over opaque payloads. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeOne))
  }

  /** Fixture adapter: treat document text bytes as an opaque payload so the
    * multimodal path is exercised on real testdata. */
  def documentsAsMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      lit("text").as("kind"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }

  // ------------------------------------------------------------------
  // REAL decoders for the uncompressed container formats a JVM can parse
  // without codec libraries: RIFF/WAV 16-bit PCM and 24-bit BMP. These
  // replace the stub for these formats — header validation, chunk
  // walking, little-endian sample reads, BMP row padding and bottom-up
  // layout are the genuine article. Compressed IMAGE formats go through
  // the JDK's ImageIO codecs ([[decodeImage]]: PNG/JPEG/GIF/TIFF); only
  // MP3/H.264 remain environment-blocked — no JVM codec exists.

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decoded PCM summary: rate, sample count, mean |amplitude|. */
  final case class WavInfo(sampleRate: Int, nSamples: Int, meanAbs: Double)

  /** Encode mono 16-bit PCM as a standard RIFF/WAV blob (44-byte header). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = new Array[Byte](44 + dataSize)
    "RIFF".getBytes.copyToArray(b, 0); putLe32(b, 4, 36 + dataSize)
    "WAVE".getBytes.copyToArray(b, 8)
    "fmt ".getBytes.copyToArray(b, 12); putLe32(b, 16, 16)
    putLe16(b, 20, 1); putLe16(b, 22, 1) // PCM, mono
    putLe32(b, 24, sampleRate); putLe32(b, 28, sampleRate * 2)
    putLe16(b, 32, 2); putLe16(b, 34, 16) // block align, bits
    "data".getBytes.copyToArray(b, 36); putLe32(b, 40, dataSize)
    var i = 0
    while (i < samples.length) { putLe16(b, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    b
  }

  /** Parse a RIFF/WAV blob: validates magics, WALKS chunks (fmt may not
    * be adjacent to data — LIST/INFO chunks are common in the wild),
    * requires 16-bit PCM, reads little-endian samples. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE blob")
    var off = 12
    var rate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      if (id == "fmt ") {
        require(le16(bytes, off + 8) == 1, "not PCM")
        require(le16(bytes, off + 10) == 1, "not mono")
        rate = le32(bytes, off + 12)
        bits = le16(bytes, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(rate > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(bits == 16, s"expected 16-bit PCM, got $bits")
    require(dataOff + dataLen <= bytes.length, "truncated data chunk")
    val n = dataLen / 2
    var sum = 0L
    var i = 0
    while (i < n) {
      val s = le16(bytes, dataOff + 2 * i).toShort
      sum += math.abs(s.toInt)
      i += 1
    }
    WavInfo(rate, n, if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Decoded image summary: dimensions + per-channel means. */
  final case class BmpInfo(width: Int, height: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  /** Encode a 24-bit bottom-up BMP (BITMAPINFOHEADER, 4-byte row pad). */
  def encodeBmp(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val b = new Array[Byte](54 + dataSize)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, 54 + dataSize); putLe32(b, 10, 54)
    putLe32(b, 14, 40); putLe32(b, 18, width); putLe32(b, 22, height)
    putLe16(b, 26, 1); putLe16(b, 28, 24)
    putLe32(b, 34, dataSize)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        b(rowOff + 3 * x) = (bl & 0xff).toByte // BGR order
        b(rowOff + 3 * x + 1) = (g & 0xff).toByte
        b(rowOff + 3 * x + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Parse a 24-bit BMP: magic, data offset, dimensions, bottom-up rows
    * with 4-byte padding, BGR byte order. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    require(le16(bytes, 28) == 24, "expected 24-bit BMP")
    require(width > 0 && height > 0, "top-down/degenerate BMP unsupported")
    val rowBytes = (width * 3 + 3) & ~3
    require(dataOff + rowBytes * height <= bytes.length, "truncated pixel data")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      val rowOff = dataOff + (height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        sb += bytes(rowOff + 3 * x) & 0xff
        sg += bytes(rowOff + 3 * x + 1) & 0xff
        sr += bytes(rowOff + 3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    BmpInfo(width, height, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ------------------------------------------------- feature extraction

  /** Raw PCM access: sample rate + the decoded 16-bit samples (the
    * summary-only [[decodeWav]] stays the cheap one-number path). */
  final case class WavSamples(sampleRate: Int, samples: Array[Short])

  def decodeWavSamples(bytes: Array[Byte]): WavSamples = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE blob")
    var off = 12
    var rate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      if (id == "fmt ") {
        require(le16(bytes, off + 8) == 1 && le16(bytes, off + 10) == 1 &&
          le16(bytes, off + 22) == 16, "expected mono 16-bit PCM")
        rate = le32(bytes, off + 12)
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    require(rate > 0 && dataOff >= 0 && dataOff + dataLen <= bytes.length,
      "missing or truncated fmt/data chunk")
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = le16(bytes, dataOff + 2 * i).toShort; i += 1 }
    WavSamples(rate, out)
  }

  /** Per-window RMS energy over complete windows of `window` samples —
    * the basic audio feature (silence detection, loudness curves, VAD
    * front-ends). Tail samples short of a full window are dropped, so
    * every window is the same length and the value is comparable. */
  def wavRms(bytes: Array[Byte], window: Int): Array[Double] = {
    require(window > 0, "window must be positive")
    val s = decodeWavSamples(bytes).samples
    val nw = s.length / window
    val out = new Array[Double](nw)
    var w = 0
    while (w < nw) {
      var sq = 0.0
      var i = w * window
      val end = i + window
      while (i < end) { val v = s(i).toDouble; sq += v * v; i += 1 }
      out(w) = math.sqrt(sq / window)
      w += 1
    }
    out
  }

  /** Dominant DFT bin per complete `window` of samples — the basic
    * frequency feature (pitch/tone detection, the first column of any
    * audio-ML featurizer). Per window w and candidate bin b in
    * [1, window/2): Goertzel-style magnitude
    * `|Σ s[i]·e^(-2πi·b·i/window)|²`; returns the argmax bin (ties to the
    * LOWER bin — deterministic). Direct per-bin evaluation (O(window²)
    * per window) keeps the code obviously correct; windows are small and
    * the work is per-row executor-side, so the 100 TB shape is the same
    * narrow `mapPartitions` pass as every other decoder here. A pure tone
    * at an exact bin frequency yields that bin for every window — the
    * MM-WAV-SPECTRUM oracle contract. */
  def wavDominantBin(bytes: Array[Byte], window: Int): Array[Int] = {
    require(window >= 4, "window must be >= 4")
    val s = decodeWavSamples(bytes).samples
    val nw = s.length / window
    val out = new Array[Int](nw)
    var w = 0
    while (w < nw) {
      var best = 1
      var bestMag = -1.0
      var b = 1
      while (b < window / 2) {
        var re = 0.0
        var im = 0.0
        var i = 0
        while (i < window) {
          val ang = -2.0 * math.Pi * b * i / window
          val v = s(w * window + i).toDouble
          re += v * math.cos(ang)
          im += v * math.sin(ang)
          i += 1
        }
        val mag = re * re + im * im
        if (mag > bestMag + 1e-9) { bestMag = mag; best = b }
        b += 1
      }
      out(w) = best
      w += 1
    }
    out
  }

  /** Nearest-neighbor resize of a 24-bit BMP: dst pixel (x, y) samples src
    * (⌊x·srcW/dstW⌋, ⌊y·srcH/dstH⌋). Returns a genuine BMP blob again, so
    * resized thumbnails flow through the same decode/feature operators.
    * Pure pixel math — the real Spark-side work a thumbnailing pipeline
    * does per row, minus only the exotic-codec parsing this sandbox can't
    * host. */
  // ----------------------------------------- JDK ImageIO codecs (PNG/JPEG)

  /** Decoded image summary + the container format ImageIO sniffed. */
  final case class ImageInfo(width: Int, height: Int,
                             meanR: Double, meanG: Double, meanB: Double,
                             format: String)

  // ImageIO's default scratch-file cache would do disk I/O per decode on
  // every executor; in-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  private def renderRgb(width: Int, height: Int,
                        pixel: (Int, Int) => (Int, Int, Int)): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeImage(fmt: String, width: Int, height: Int,
                          pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(renderRgb(width, height, pixel), fmt, baos)
    require(ok, s"no JDK ImageIO writer for format '$fmt'")
    baos.toByteArray
  }

  /** Encode deterministic pixels as a REAL PNG (deflate-compressed,
    * lossless) via the JDK's built-in codec — no external libraries. */
  def encodePng(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeImage("png", width, height, pixel)

  /** Encode deterministic pixels as a REAL JPEG (DCT-lossy, default
    * quality) via the JDK's built-in codec. */
  def encodeJpeg(width: Int, height: Int,
                 pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeImage("jpg", width, height, pixel)

  /** Encode as a REAL GIF (LZW — lossless, and palette-exact whenever the
    * image has ≤256 distinct colors) via the JDK's built-in codec. */
  def encodeGif(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeImage("gif", width, height, pixel)

  /** Encode as a REAL TIFF (lossless RGB) via the JDK's built-in codec. */
  def encodeTiff(width: Int, height: Int,
                 pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeImage("tiff", width, height, pixel)

  /** Encode a REAL multi-frame (animated) GIF via the JDK codec's
    * sequence API (`prepareWriteSequence`/`writeToSequence`): each frame
    * is written WHOLE (no inter-frame delta), so reading frame i back
    * returns exactly frame i's raster. Frames with ≤256 distinct colors
    * are palette-exact — the MM-GIF-FRAMES oracle contract.
    * `pixel(frame, x, y)` → (r, g, b). */
  def encodeAnimatedGif(width: Int, height: Int, nFrames: Int,
                        pixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(nFrames >= 1, "need at least one frame")
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no JDK GIF writer")
    val writer = writers.next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = renderRgb(width, height, (x, y) => pixel(f, x, y))
        val md = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
          writer.getDefaultWriteParam)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose(); ios.close()
    }
    baos.toByteArray
  }

  /** Decode EVERY frame of a (possibly animated) GIF: per-frame
    * dimensions + channel means, in frame order. Per-row executor-side
    * work like every decoder here. */
  def decodeGifFrames(bytes: Array[Byte]): Seq[ImageInfo] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no JDK ImageIO codec recognizes this payload")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      require(reader.getFormatName.equalsIgnoreCase("gif"),
        s"expected a GIF, ImageIO sniffed ${reader.getFormatName}")
      val n = reader.getNumImages(true)
      (0 until n).map { f =>
        val img = reader.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        ImageInfo(w, h, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np, "gif")
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Keyframe sampling over an animated GIF: every `step`-th frame
    * (0, step, 2·step, …) with its decoded summary — the video-pipeline
    * frame-sample shape, on the one motion format a bare JVM can decode. */
  def gifFrameSample(bytes: Array[Byte], step: Int): Seq[(Int, ImageInfo)] = {
    require(step >= 1, "step must be >= 1")
    decodeGifFrames(bytes).zipWithIndex.collect {
      case (info, idx) if idx % step == 0 => (idx, info)
    }
  }

  /** Decode any image format the JDK ships a codec for (PNG, JPEG, GIF,
    * BMP, TIFF, WBMP) and summarize: dimensions + per-channel means +
    * sniffed format name. PNG round-trips losslessly, so means computed
    * here match the generative formula EXACTLY (the MM-PNG-DECODE oracle
    * contract); JPEG is lossy, so only dimensions are exact.
    *
    * Per-row executor-side work (called from `mapPartitions`) — decode
    * never touches the driver, and the per-channel fold reads the raster
    * in one bulk `getRGB` row sweep. */
  def decodeImage(bytes: Array[Byte]): ImageInfo = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no JDK ImageIO codec recognizes this payload")
    val reader = readers.next()
    val fmt = reader.getFormatName.toLowerCase
    val img =
      try { reader.setInput(iis); reader.read(0) }
      finally { reader.dispose(); iis.close() }
    val (w, h) = (img.getWidth, img.getHeight)
    require(w > 0 && h > 0, "degenerate image")
    var (sr, sg, sb) = (0L, 0L, 0L)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageInfo(w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, fmt)
  }

  def resizeBmpNearest(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, "target dimensions must be positive")
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOff = le32(bytes, 10)
    val srcW = le32(bytes, 18)
    val srcH = le32(bytes, 22)
    require(le16(bytes, 28) == 24, "expected 24-bit BMP")
    val srcRow = (srcW * 3 + 3) & ~3
    encodeBmp(dstW, dstH, (x, y) => {
      val sx = x * srcW / dstW
      val sy = y * srcH / dstH
      val o = dataOff + (srcH - 1 - sy) * srcRow + 3 * sx
      ((bytes(o + 2) & 0xff), (bytes(o + 1) & 0xff), (bytes(o) & 0xff))
    })
  }
}
