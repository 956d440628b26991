package graft.ingest

import org.scalacheck.Gen

import graft.SparkSpec
import SignalFxProto._

class SignalFxProtoSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02x").mkString

  test("encode matches the hand-computed protobuf wire bytes") {
    val p = SfxPoint(null, "cpu", 1000L, null, Some(1.5), None, "GAUGE",
      Map("host" -> "a"))
    // field 2 "cpu" | field 3 varint 1000 | field 4 Datum{doubleValue=1.5}
    // | field 6 Dimension{key="host", value="a"} — per the public protobuf
    // encoding spec (tag = field<<3 | wire; doubles little-endian fixed64)
    val expected =
      "1203637075" +                 // 0x12 len=3 "cpu"
      "18e807" +                     // 0x18 varint(1000)
      "220911000000000000f83f" +     // 0x22 len=9, 0x11 + LE bits of 1.5
      "32090a04686f7374120161"       // 0x32 len=9, key="host" value="a"
    assert(hex(encodeDataPoint(p)) === expected)
    assert(decodeDataPoint(encodeDataPoint(p)) === p)
  }

  test("upload round-trips arbitrary datapoints (property)") {
    val strGen = Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    val pointGen = for {
      src   <- Gen.option(strGen)
      m     <- strGen
      ts    <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      sv    <- Gen.option(strGen)
      dv    <- Gen.option(Gen.chooseNum(-1e12, 1e12))
      iv    <- Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      mt    <- Gen.oneOf(MetricTypes)
      dims  <- Gen.mapOfN(3, Gen.zip(strGen, strGen))
    } yield SfxPoint(src.orNull, m, ts, sv.orNull, dv, iv, mt, dims)
    val points = Gen.listOfN(50, pointGen).sample.get
    assert(decodeUpload(encodeUpload(points.iterator)) === points)
  }

  test("decoder skips unknown fields of every wire type") {
    val p = SfxPoint("src", "mem", -42L, null, None, Some(-7L), "COUNTER", Map())
    val base = encodeDataPoint(p)
    // splice unknown fields in front: 99 varint, 98 length-delim, 97
    // fixed64, 96 fixed32 — a conforming decoder must skip all of them
    val extra = Array[Int](
      0x98, 0x31, 0x05,                         // field 99 wire 0, varint 5
      0x92, 0x31, 0x02, 0xAA, 0xBB,             // field 98 wire 2, 2 bytes
      0x89, 0x31, 1, 2, 3, 4, 5, 6, 7, 8,       // field 97 wire 1
      0x85, 0x31, 9, 9, 9, 9                    // field 96 wire 5
    ).map(_.toByte)
    assert(decodeDataPoint(extra ++ base) === p)
  }

  test("Spark decode explodes upload payloads into datapoint rows") {
    val sq = spark
    import sq.implicits._
    val a = (1 to 5).map(i => SfxPoint(null, s"m$i", i * 1000L, null,
      Some(i * 0.5), None, "GAUGE", Map("host" -> s"h$i")))
    val b = Seq(SfxPoint("agent", "up", 99L, null, None, Some(1L),
      "CUMULATIVE_COUNTER", Map()))
    val payloads = Seq(encodeUpload(a.iterator), encodeUpload(b.iterator))
      .toDF("payload")
    val rows = SignalFxProto.decode(payloads).collect().toSet
    assert(rows === (a ++ b).toSet)
  }

  test("Spark encode packs partitions; decode(encode(x)) == x") {
    val sq = spark
    import sq.implicits._
    val pts = (1 to 40).map(i => SfxPoint(null, s"m${i % 7}", i.toLong, null,
      Some(i.toDouble), None, "GAUGE", Map("k" -> "v")))
    val ds = sq.createDataset(pts).repartition(4)
    val encoded = SignalFxProto.encode(ds)
    assert(encoded.count() <= 4) // one payload per non-empty partition
    val back = SignalFxProto.decode(encoded).collect().toSet
    assert(back === pts.toSet)
  }

  test("event upload round-trips arbitrary events (property)") {
    val strGen = Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    val eventGen = for {
      et   <- strGen
      cat  <- Gen.oneOf(EventCategories)
      dims <- Gen.mapOfN(3, Gen.zip(strGen, strGen))
      prps <- Gen.mapOfN(2, Gen.zip(strGen, strGen))
      ts   <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield SfxEvent(et, cat, dims, prps, ts)
    val events = Gen.listOfN(40, eventGen).sample.get
    assert(decodeEventUpload(encodeEventUpload(events.iterator)) === events)
  }

  test("event category encodes the sparse public enum wire values") {
    // AUDIT = 200000 on the wire (not list index 2): tag 0x20 (field 4,
    // varint) followed by varint(200000) = c0 9a 0c
    val e = SfxEvent("x", "AUDIT", Map(), Map(), 7L)
    assert(hex(encodeEvent(e)).contains("20c09a0c"))
    assert(decodeEvent(encodeEvent(e), 0, encodeEvent(e).length).category === "AUDIT")
    // USER_DEFINED is the proto2 default (first declared value) → omitted
    val ud = encodeEvent(SfxEvent("x", "USER_DEFINED", Map(), Map(), 7L))
    assert(!hex(ud).contains("20")
      || decodeEvent(ud, 0, ud.length).category === "USER_DEFINED")
    // a decoded unknown wire value surfaces as UNKNOWN_<v> and re-encodes
    // as that value (round-trip), not silently as the default
    val w = SfxEvent("x", "UNKNOWN_424242", Map(), Map(), 7L)
    assert(decodeEvent(encodeEvent(w), 0, encodeEvent(w).length).category
      === "UNKNOWN_424242")
    // a category that is neither a known name nor UNKNOWN_<v> is an error
    intercept[IllegalArgumentException] {
      encodeEvent(SfxEvent("x", "NOT_A_CATEGORY", Map(), Map(), 7L))
    }
  }

  test("truncated payloads throw typed errors; lenient decode drops them") {
    val sq = spark
    import sq.implicits._
    val good = encodeUpload(Iterator(
      SfxPoint(null, "cpu", 1000L, null, Some(1.5), None, "GAUGE", Map())))
    // cut inside the nested DataPoint message: strict decode must raise the
    // typed malformed-payload error (not AIOOBE, not silently-wrong data)
    val truncated = good.take(good.length - 3)
    intercept[SignalFxProto.MalformedPayloadException] {
      decodeUpload(truncated)
    }
    // a length prefix pointing past the end must also be typed
    intercept[SignalFxProto.MalformedPayloadException] {
      decodeUpload(Array[Byte](0x0A, 0x7F, 0x01))
    }
    // a HUGE length prefix (varint 0x7FFFFFFF) must not overflow the bound
    // check (pos + n wraps negative) into a raw AIOOBE — typed error, so
    // the lenient arm still drops it instead of failing the micro-batch
    val huge = Array[Byte](0x0A, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte, 0x07)
    intercept[SignalFxProto.MalformedPayloadException] { decodeUpload(huge) }
    // the lenient listener arm drops the bad payloads, keeps the good one,
    // and counts every drop in the named accumulator (observability: the
    // reference listener's dropped-point stat keeper, not silent loss)
    val (ds, dropped) = SignalFxProto.decodeLenientCounted(
      Seq(good, truncated, huge).toDF("payload"))
    val rows = ds.collect()
    assert(rows.length === 1 && rows(0).metric === "cpu")
    assert(dropped.value === 2L)
  }

  test("event decoder normalizes non-string PropertyValue arms") {
    // hand-build an Event with double/int/bool property values: the decoder
    // must render them as strings (the engine's event property type)
    def prop(k: String, valueBytes: Array[Byte]): Array[Byte] = {
      val kb = k.getBytes("UTF-8")
      Array[Byte](0x0A.toByte, kb.length.toByte) ++ kb ++
        Array[Byte](0x12.toByte, valueBytes.length.toByte) ++ valueBytes
    }
    val dbl = Array[Byte](0x11.toByte) ++ // field 2 wire 1
      java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(2.5).array()
    val int = Array[Byte](0x18.toByte, 0x2A.toByte)       // field 3 varint 42
    val bool = Array[Byte](0x20.toByte, 0x01.toByte)      // field 4 varint 1
    val et = "deploy".getBytes("UTF-8")
    val body = Array[Byte](0x0A.toByte, et.length.toByte) ++ et ++
      Seq(prop("d", dbl), prop("i", int), prop("b", bool)).flatMap { p =>
        Array[Byte](0x1A.toByte, p.length.toByte) ++ p
      } ++ Array[Byte](0x28.toByte, 0x07.toByte) // timestamp=7
    val e = decodeEvent(body, 0, body.length)
    assert(e.eventType === "deploy")
    assert(e.properties === Map("d" -> "2.5", "i" -> "42", "b" -> "true"))
    assert(e.timestamp === 7L)
  }

  test("Spark event decode explodes payloads; JSON arm agrees on shape") {
    val sq = spark
    import sq.implicits._
    val evs = (1 to 6).map(i => SfxEvent(s"deploy$i", "AUDIT",
      Map("svc" -> s"s$i"), Map("ok" -> "true"), i * 1000L))
    val payloads = Seq(encodeEventUpload(evs.iterator)).toDF("payload")
    val back = SignalFxProto.decodeEvents(payloads).collect().toSet
    assert(back === evs.toSet)
    // JSON arm: same logical event through /v2/event JSON decodes to the
    // same (eventType, category, dimensions, properties) values
    val json = """[{"eventType":"deploy1","category":"AUDIT","dimensions":{"svc":"s1"},
      |"properties":{"ok":"true"},"timestamp":1000}]""".stripMargin.replace("\n", "")
    val row = SignalFxJson.decodeEvents(Seq(json).toDF("body")).collect()(0)
    assert(row.getString(0) === "deploy1")
    assert(row.getString(1) === "AUDIT")
    assert(row.getMap[String, String](2) === Map("svc" -> "s1"))
    assert(row.getMap[String, String](3) === Map("ok" -> "true"))
  }

  test("pipeline assembles a binary sfxproto listener end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("sfxpipe").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    val pts = (1 to 20).map(i => SfxPoint(null, s"m${i % 3}", i * 1000L, null,
      Some(i * 0.5), None, "GAUGE", Map("host" -> "h")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/in/upload1.pb"),
      encodeUpload(pts.iterator))
    val cfg = graft.streaming.Pipeline.GraftConfig(
      listenFrom = graft.streaming.Pipeline.ListenFrom("binary", path = s"$root/in",
        codec = "sfxproto"),
      forwardTo = Seq(graft.streaming.Pipeline.ForwardTo("csv", "debug", s"$root/csv")))
    val q = graft.streaming.Pipeline.assemble(spark, cfg)
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable(); q.stop()
    val out = spark.read.csv(s"$root/csv")
    assert(out.count() === 20)
  }

  test("protobuf forwarder is idempotent per batchId") {
    val sq = spark
    import sq.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sfxfwd").toString
    val batch = Seq(("cpu", 0.5, 10L), ("mem", 0.7, 11L))
      .toDF("metric", "value", "epoch")
    val fwd = graft.streaming.StreamingOps.SignalFxProtoForwarder("sfx", dir)
    fwd.write(batch, 3L); fwd.write(batch, 3L) // replay must overwrite
    val rows = SignalFxProto.decode(sq.read.parquet(s"$dir/batch=3")).collect()
    assert(rows.map(p => (p.metric, p.doubleValue.get, p.timestamp)).toSet ===
      Set(("cpu", 0.5, 10000L), ("mem", 0.7, 11000L)))
  }
}
