package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = { tables(); Multimodal.documentsAsMedia(spark, spark.table("documents")) }

  test("binaryMeta: n_bytes equals text length (ascii fixture), digest = md5") {
    val meta = Multimodal.binaryMeta(media.toDF())
    val joined = meta.join(spark.table("documents"),
      meta("media_id") === col("doc_id"))
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() === 0)
    assert(joined.filter(col("digest") =!= md5(col("text").cast("binary"))).count() === 0)
  }

  test("decodeFeatures: partition-parallel stub decode is deterministic and total") {
    val feats = Multimodal.decodeFeatures(media).cache()
    assert(feats.count() === media.count())
    val r = feats.filter(col("width") < 1 || col("width") > 1920 ||
      col("height") < 1 || col("height") > 1080)
    assert(r.count() === 0)
    val a = canon(feats.orderBy("media_id").limit(10).toDF())
    val b = canon(Multimodal.decodeFeatures(media).orderBy("media_id").limit(10).toDF())
    assert(a === b)
    feats.unpersist()
  }

  test("WAV codec: round-trip exact, chunk walking, malformed rejected") {
    val rnd = new scala.util.Random(5)
    val samples = Array.fill(1000)(rnd.nextInt(65536).toShort)
    val blob = Multimodal.encodeWav(44100, samples)
    val w = Multimodal.decodeWav(blob)
    assert(w.sampleRate === 44100 && w.nSamples === 1000)
    val expected = samples.map(x => math.abs(x.toInt).toLong).sum.toDouble / 1000
    assert(w.meanAbs === expected)
    // decoder must WALK chunks: splice a LIST chunk between fmt and data
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = blob.slice(0, 36) ++ listChunk ++ blob.slice(36, blob.length)
    // patch RIFF size
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte; spliced(7) = ((total >> 24) & 0xff).toByte
    val w2 = Multimodal.decodeWav(spliced)
    assert(w2.nSamples === 1000 && w2.meanAbs === expected)
    intercept[IllegalArgumentException] { Multimodal.decodeWav("nope".getBytes) }
    intercept[IllegalArgumentException] { Multimodal.decodeWav(blob.slice(0, 50)) }
    // empty data chunk decodes to zero samples, not a crash
    assert(Multimodal.decodeWav(Multimodal.encodeWav(8000, Array.empty)).nSamples === 0)
  }

  test("BMP codec: round-trip exact across padded and unpadded widths") {
    val rnd = new scala.util.Random(9)
    // width 5 -> rowBytes 16 (padded); width 4 -> 12 (unpadded)
    for (w <- Seq(4, 5, 16, 23); h <- Seq(1, 3, 11)) {
      val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val blob = Multimodal.encodeBmp(w, h, (x, y) => px(y)(x))
      val b = Multimodal.decodeBmp(blob)
      assert(b.width === w && b.height === h)
      def mean(f: ((Int, Int, Int)) => Int) =
        px.flatten.map(p => f(p).toLong).sum.toDouble / (w * h)
      assert(b.meanR === mean(_._1) && b.meanG === mean(_._2) && b.meanB === mean(_._3),
        s"w=$w h=$h")
    }
    intercept[IllegalArgumentException] { Multimodal.decodeBmp(Array[Byte](1, 2, 3)) }
  }

  test("windowed RMS: exact on known signals, tail dropped") {
    // constant amplitude A -> RMS = A in every window
    val const = Multimodal.encodeWav(8000, Array.fill(250)(100.toShort))
    assert(Multimodal.wavRms(const, 100).toSeq === Seq(100.0, 100.0)) // 50 tail dropped
    // alternating +-A -> RMS = A; half-zero window -> A/sqrt(2)
    val alt = Array.tabulate(100)(i => (if (i % 2 == 0) 80 else -80).toShort)
    assert(Multimodal.wavRms(Multimodal.encodeWav(8000, alt), 100).toSeq === Seq(80.0))
    val half = Array.tabulate(100)(i => (if (i < 50) 60 else 0).toShort)
    val r = Multimodal.wavRms(Multimodal.encodeWav(8000, half), 100)(0)
    assert(math.abs(r - 60.0 / math.sqrt(2)) < 1e-9)
    // shorter than one window -> no windows
    assert(Multimodal.wavRms(Multimodal.encodeWav(8000, Array.fill(99)(5.toShort)), 100).isEmpty)
  }

  test("nearest-neighbor resize: identity at same size, exact sampling when shrinking") {
    val rnd = new scala.util.Random(11)
    val (w, h) = (10, 6)
    val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val blob = Multimodal.encodeBmp(w, h, (x, y) => px(y)(x))
    // identity resize reproduces the blob's pixel content exactly
    val same = Multimodal.decodeBmp(Multimodal.resizeBmpNearest(blob, w, h))
    val orig = Multimodal.decodeBmp(blob)
    assert(same === orig)
    // 2x shrink samples (2x, 2y): verify against a hand-built expectation
    val small = Multimodal.decodeBmp(Multimodal.resizeBmpNearest(blob, 5, 3))
    val exp = for (y <- 0 until 3; x <- 0 until 5) yield px(y * 2)(x * 2)
    def mean(f: ((Int, Int, Int)) => Int) = exp.map(p => f(p).toLong).sum.toDouble / 15
    assert(small.width === 5 && small.height === 3)
    assert(small.meanR === mean(_._1) && small.meanG === mean(_._2) && small.meanB === mean(_._3))
    // upscale replicates pixels (means preserved for integer factors)
    val big = Multimodal.decodeBmp(Multimodal.resizeBmpNearest(blob, w * 2, h * 2))
    assert(big.width === w * 2 && big.meanR === orig.meanR && big.meanB === orig.meanB)
  }

  test("PNG codec: lossless round-trip, exact per-pixel means, format sniffed") {
    val rnd = new scala.util.Random(42)
    val (w, h) = (23, 11)
    val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val blob = Multimodal.encodePng(w, h, (x, y) => px(y)(x))
    // real PNG magic
    assert((blob(0) & 0xff) === 0x89 && blob(1) === 'P' && blob(2) === 'N' && blob(3) === 'G')
    val i = Multimodal.decodeImage(blob)
    assert(i.format === "png" && i.width === w && i.height === h)
    def mean(f: ((Int, Int, Int)) => Int) =
      px.flatten.map(p => f(p).toLong).sum.toDouble / (w * h)
    // lossless: EXACT equality, random (worst-case-entropy) pixels
    assert(i.meanR === mean(_._1) && i.meanG === mean(_._2) && i.meanB === mean(_._3))
  }

  test("JPEG codec: dimensions exact, smooth-field means within tolerance") {
    val (w, h) = (24, 12)
    def pix(x: Int, y: Int) =
      (math.min(255, 40 + x * 3 + y * 2), math.min(255, 30 + x * 2 + y * 4),
        math.min(255, 20 + x + y * 3))
    val blob = Multimodal.encodeJpeg(w, h, pix)
    // real JFIF magic
    assert((blob(0) & 0xff) === 0xff && (blob(1) & 0xff) === 0xd8)
    val i = Multimodal.decodeImage(blob)
    assert(i.format === "jpeg" && i.width === w && i.height === h)
    val px = for (y <- 0 until h; x <- 0 until w) yield pix(x, y)
    def mean(f: ((Int, Int, Int)) => Int) = px.map(p => f(p).toLong).sum.toDouble / (w * h)
    assert(math.abs(i.meanR - mean(_._1)) < 8, s"${i.meanR} vs ${mean(_._1)}")
    assert(math.abs(i.meanG - mean(_._2)) < 8)
    assert(math.abs(i.meanB - mean(_._3)) < 8)
  }

  test("decodeImage rejects non-image payloads; decodeFeatures routes real codecs") {
    val sq = spark; import sq.implicits._
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage("definitely not an image".getBytes)
    }
    // dispatch: png/wav rows decode REAL dims; unknown kinds hit the stub
    val png = Multimodal.encodePng(9, 7, (x, y) => (x * 20 % 256, y * 30 % 256, 7))
    val wav = Multimodal.encodeWav(8000, Array.tabulate(250)(i => (i * 13 % 500).toShort))
    val rows = Seq(
      Multimodal.MediaRow(1L, "png", png),
      Multimodal.MediaRow(2L, "wav", wav),
      Multimodal.MediaRow(3L, "mp3", Array[Byte](1, 2, 3)))
    val out = Multimodal.decodeFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width === 9 && out(1L).height === 7)
    assert(out(2L).width === 250 && out(2L).height === 1)
    assert(out(3L).width > 0) // stub fallback, deterministic fake
  }

  test("GIF/TIFF codecs: lossless round-trips under their constraints") {
    // GIF: <=256 distinct colors keeps the palette exact — 64 grays
    val (w, h) = (19, 13)
    def gray(x: Int, y: Int) = { val v = ((x * 5 + y * 7) % 64) * 4; (v, v, v) }
    val gif = Multimodal.decodeImage(Multimodal.encodeGif(w, h, gray))
    assert(gif.format === "gif" && gif.width === w && gif.height === h)
    val gm = (for (y <- 0 until h; x <- 0 until w) yield gray(x, y)._1.toLong)
      .sum.toDouble / (w * h)
    assert(gif.meanR === gm && gif.meanG === gm && gif.meanB === gm)
    // TIFF: full-RGB lossless, arbitrary pixels
    val rnd = new scala.util.Random(7)
    val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val tif = Multimodal.decodeImage(Multimodal.encodeTiff(w, h, (x, y) => px(y)(x)))
    assert(tif.format === "tif" && tif.width === w && tif.height === h)
    def mean(f: ((Int, Int, Int)) => Int) =
      px.flatten.map(p => f(p).toLong).sum.toDouble / (w * h)
    assert(tif.meanR === mean(_._1) && tif.meanG === mean(_._2) && tif.meanB === mean(_._3))
  }
}
