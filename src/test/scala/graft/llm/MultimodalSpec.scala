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
}
