package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SignalFx protobuf wire codec — the reference's PRIMARY efficient ingest
  * format and forwarder payload (SURVEY.md §2a rows 7b/11,
  * `protocol/signalfx/` [P]). The message schema is the public
  * `com.signalfx.metrics.protobuf` set (signalfx_metrics.proto [P]):
  *
  * {{{
  * message DataPointUploadMessage { repeated DataPoint datapoints = 1; }
  * message DataPoint {
  *   optional string     source     = 1;
  *   optional string     metric     = 2;
  *   optional int64      timestamp  = 3;   // epoch millis
  *   optional Datum      value      = 4;
  *   optional MetricType metricType = 5;
  *   repeated Dimension  dimensions = 6;
  * }
  * message Datum { optional string strValue = 1; optional double doubleValue = 2;
  *                 optional int64 intValue = 3; }
  * message Dimension { optional string key = 1; optional string value = 2; }
  * enum MetricType { GAUGE = 0; COUNTER = 1; ENUM = 2; CUMULATIVE_COUNTER = 3; }
  * }}}
  *
  * No protobuf runtime exists in this environment (and `from_protobuf`
  * needs a compiled descriptor set), so the proto2 WIRE FORMAT itself is
  * implemented here — varint / fixed64 / length-delimited framing per the
  * public protobuf encoding spec. The codec is deliberately tiny: four
  * fixed messages, unknown fields skipped (forward-compatible, as proto
  * requires), deterministic field-order encoding.
  *
  * PRODUCTION SWAP-IN (the idiomatic route where the spark-protobuf
  * module + a protoc toolchain exist): compile the schema above to a
  * descriptor set once —
  * `protoc --include_imports --descriptor_set_out=sfx.desc signalfx.proto`
  * — then replace [[decodeUpload]] with the built-in codegen path:
  * {{{
  * import org.apache.spark.sql.protobuf.functions.from_protobuf
  * payloads.select(from_protobuf($"payload", "DataPointUploadMessage",
  *     "/path/sfx.desc").as("m"))
  *   .select(explode($"m.datapoints").as("p")).select("p.*")
  * }}}
  * Column shapes match this codec's output, so everything downstream
  * (Pipeline codec arm, forwarders, PARSE-SFXPROTO) is unchanged; keep
  * [[encodeUpload]]'s `mapPartitions` batching or swap it for
  * `to_protobuf` symmetrically. This hand codec remains the
  * dependency-free fallback and the wire-format documentation.
  *
  * Spark-side shape: decode is a typed narrow `flatMap` over a binary
  * payload column (one upload message → N datapoint rows, no shuffle —
  * the same per-partition opaque-codec pattern as
  * [[graft.llm.Multimodal]]); encode packs each partition's rows into one
  * upload payload via `mapPartitions` (the unit a forwarder would POST).
  */
object SignalFxProto {

  /** Typed wire-level decode failure: truncated or corrupt payload bytes.
    * Extends IllegalArgumentException so callers treating decode errors
    * generically keep working; [[decodeLenient]] / the Pipeline binary arm
    * catch THIS type and drop the payload (the binary twin of the line
    * codecs' log-and-skip contract). */
  final class MalformedPayloadException(msg: String)
    extends IllegalArgumentException(msg)

  /** Decoded datapoint row; Datum arms kept separate (a oneof in spirit). */
  final case class SfxPoint(source: String, metric: String, timestamp: Long,
                            strValue: String, doubleValue: Option[Double],
                            intValue: Option[Long], metricType: String,
                            dimensions: Map[String, String])

  val MetricTypes: IndexedSeq[String] =
    IndexedSeq("GAUGE", "COUNTER", "ENUM", "CUMULATIVE_COUNTER")

  private def typeCode(name: String): Int = {
    val i = MetricTypes.indexOf(name)
    if (i >= 0) i else 0
  }

  // ---------------------------------------------------------------- wire IO

  /** Minimal protobuf writer: varint (two's-complement int64, 1–10 bytes),
    * little-endian fixed64, and length-delimited chunks. */
  private final class Writer {
    val out = new ByteArrayOutputStream(64)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def fixed64(bits: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def lenDelim(field: Int, bytes: Array[Byte]): Unit = {
      tag(field, 2); varint(bytes.length.toLong); out.write(bytes, 0, bytes.length)
    }
    def str(field: Int, s: String): Unit = lenDelim(field, s.getBytes(UTF_8))
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Minimal protobuf reader over a byte slice; unknown fields skipped.
    * Every read bound-checks against `end`: a truncated nested message must
    * surface as a typed [[MalformedPayloadException]], never silently
    * consume bytes from the enclosing message or escape as a raw
    * ArrayIndexOutOfBoundsException. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    private def need(n: Int): Unit =
      // overflow-safe form: `pos + n` wraps negative when a corrupt length
      // prefix decodes to a huge positive n (e.g. varint 0x7FFFFFFF) and
      // the naive check passes; `end - pos` cannot overflow (both bounded
      // by the array length)
      if (n < 0 || n > end - pos) throw new MalformedPayloadException(
        s"truncated payload: need $n bytes at offset $pos (end $end)")
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new MalformedPayloadException("malformed varint")
    }
    def fixed64(): Long = {
      need(8)
      var bits = 0L; var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; bits
    }
    def fixed32(): Long = {
      need(4)
      var bits = 0L; var i = 0
      while (i < 4) { bits |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 4; bits
    }
    /** Returns a sub-reader over the next length-delimited chunk. */
    def chunk(): Reader = {
      val len = varint().toInt
      need(len)
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def str(): String = {
      val len = varint().toInt
      need(len)
      val s = new String(buf, pos, len, UTF_8)
      pos += len; s
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => need(8); pos += 8
      case 2 => val len = varint().toInt; need(len); pos += len
      case 5 => need(4); pos += 4
      case w => throw new MalformedPayloadException(s"unsupported wire type $w")
    }
  }

  // ------------------------------------------------------------- encode

  private def encodeDatum(p: SfxPoint): Array[Byte] = {
    val w = new Writer
    if (p.strValue != null) w.str(1, p.strValue)
    p.doubleValue.foreach { d => w.tag(2, 1); w.fixed64(java.lang.Double.doubleToLongBits(d)) }
    p.intValue.foreach { v => w.tag(3, 0); w.varint(v) }
    w.bytes
  }

  def encodeDataPoint(p: SfxPoint): Array[Byte] = {
    val w = new Writer
    if (p.source != null) w.str(1, p.source)
    if (p.metric != null) w.str(2, p.metric)
    w.tag(3, 0); w.varint(p.timestamp)
    w.lenDelim(4, encodeDatum(p))
    val tc = typeCode(p.metricType)
    if (tc != 0) { w.tag(5, 0); w.varint(tc.toLong) } // proto2 default omitted
    p.dimensions.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val dw = new Writer; dw.str(1, k); dw.str(2, v)
      w.lenDelim(6, dw.bytes)
    }
    w.bytes
  }

  /** One `DataPointUploadMessage` over the given points — the POST body
    * unit of the reference's protobuf forwarder. */
  def encodeUpload(points: Iterator[SfxPoint]): Array[Byte] = {
    val w = new Writer
    points.foreach(p => w.lenDelim(1, encodeDataPoint(p)))
    w.bytes
  }

  // ------------------------------------------------------------- decode

  private def decodeDatum(r: Reader): (String, Option[Double], Option[Long]) = {
    var sv: String = null; var dv: Option[Double] = None; var iv: Option[Long] = None
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 2) => sv = r.str()
        case (2, 1) => dv = Some(java.lang.Double.longBitsToDouble(r.fixed64()))
        case (3, 0) => iv = Some(r.varint())
        case _      => r.skip(wire)
      }
    }
    (sv, dv, iv)
  }

  def decodeDataPoint(bytes: Array[Byte], from: Int = 0, to: Int = -1): SfxPoint = {
    val r = new Reader(bytes, from, if (to < 0) bytes.length else to)
    var source: String = null; var metric: String = null; var ts = 0L
    var sv: String = null; var dv: Option[Double] = None; var iv: Option[Long] = None
    var mtype = 0; val dims = Map.newBuilder[String, String]
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 2) => source = r.str()
        case (2, 2) => metric = r.str()
        case (3, 0) => ts = r.varint()
        case (4, 2) =>
          val d = decodeDatum(r.chunk()); sv = d._1; dv = d._2; iv = d._3
        case (5, 0) => mtype = r.varint().toInt
        case (6, 2) =>
          val dr = r.chunk()
          var k: String = null; var v: String = null
          while (dr.hasMore) {
            val dk = dr.varint(); val df = (dk >>> 3).toInt; val dwire = (dk & 7).toInt
            (df, dwire) match {
              case (1, 2) => k = dr.str()
              case (2, 2) => v = dr.str()
              case _      => dr.skip(dwire)
            }
          }
          if (k != null) dims += (k -> (if (v == null) "" else v))
        case _ => r.skip(wire)
      }
    }
    val tname = if (mtype >= 0 && mtype < MetricTypes.length) MetricTypes(mtype)
                else s"UNKNOWN_$mtype"
    SfxPoint(source, metric, ts, sv, dv, iv, tname, dims.result())
  }

  /** Decode one `DataPointUploadMessage` payload into its datapoints. */
  def decodeUpload(bytes: Array[Byte]): Seq[SfxPoint] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[SfxPoint]
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      if (field == 1 && wire == 2) {
        val c = r.chunk()
        out += decodeDataPoint(bytes, c.pos, c.end)
      } else r.skip(wire)
    }
    out.result()
  }

  // ------------------------------------------------------------- events

  /** Decoded `/v2/event` row (Event message [P]: eventType=1, dimensions=2,
    * properties=3, category=4, timestamp=5; properties carry a
    * PropertyValue oneof — normalized here to strings, the engine's event
    * property representation). */
  final case class SfxEvent(eventType: String, category: String,
                            dimensions: Map[String, String],
                            properties: Map[String, String], timestamp: Long)

  val EventCategories: IndexedSeq[String] =
    IndexedSeq("USER_DEFINED", "ALERT", "AUDIT", "JOB", "COLLECTD",
      "POLICY", "SERVICE_DISCOVERY", "EXCEPTION")

  /** Wire values of the public com.signalfx.metrics.protobuf EventCategory
    * enum — the enum is SPARSE (values are NOT declaration indices), so
    * encoding list positions would be wire-incompatible with real SignalFx
    * producers/consumers. USER_DEFINED is the first declared value, hence
    * the proto2 default for an absent optional field. */
  val EventCategoryValues: Map[String, Int] = Map(
    "USER_DEFINED" -> 1000000, "ALERT" -> 100000, "AUDIT" -> 200000,
    "JOB" -> 300000, "COLLECTD" -> 400000, "POLICY" -> 500000,
    "SERVICE_DISCOVERY" -> 600000, "EXCEPTION" -> 700000)
  private val EventCategoryNames: Map[Int, String] =
    EventCategoryValues.map(_.swap)
  private val UnknownCat = "UNKNOWN_(\\d+)".r

  def encodeEvent(e: SfxEvent): Array[Byte] = {
    val w = new Writer
    if (e.eventType != null) w.str(1, e.eventType)
    e.dimensions.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val dw = new Writer; dw.str(1, k); dw.str(2, v)
      w.lenDelim(2, dw.bytes)
    }
    e.properties.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val vw = new Writer; vw.str(1, v) // PropertyValue.strValue
      val pw = new Writer; pw.str(1, k); pw.lenDelim(2, vw.bytes)
      w.lenDelim(3, pw.bytes)
    }
    // USER_DEFINED is the proto2 default → legitimately omitted; a decoded
    // UNKNOWN_<v> carries its numeric value back out (round-trips instead
    // of silently re-encoding as the default); anything else is an error.
    val cat = e.category match {
      case null | "USER_DEFINED" => 0
      case c => EventCategoryValues.getOrElse(c, c match {
        case UnknownCat(v) => v.toInt
        case _ => throw new IllegalArgumentException(s"unknown event category '$c'")
      })
    }
    if (cat != 0) { w.tag(4, 0); w.varint(cat.toLong) }
    w.tag(5, 0); w.varint(e.timestamp)
    w.bytes
  }

  /** One `EventUploadMessage` (repeated Event = 1) over the given events. */
  def encodeEventUpload(events: Iterator[SfxEvent]): Array[Byte] = {
    val w = new Writer
    events.foreach(e => w.lenDelim(1, encodeEvent(e)))
    w.bytes
  }

  private def decodeKeyValue(r: Reader): (String, String) = {
    var k: String = null; var v: String = null
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 2) => k = r.str()
        case (2, 2) => v = r.str()
        case _      => r.skip(wire)
      }
    }
    (k, if (v == null) "" else v)
  }

  private def decodePropertyValue(r: Reader): String = {
    var out = ""
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 2) => out = r.str()
        case (2, 1) => out = java.lang.Double.longBitsToDouble(r.fixed64()).toString
        case (3, 0) => out = r.varint().toString
        case (4, 0) => out = (r.varint() != 0L).toString
        case _      => r.skip(wire)
      }
    }
    out
  }

  def decodeEvent(bytes: Array[Byte], from: Int, to: Int): SfxEvent = {
    val r = new Reader(bytes, from, to)
    var etype: String = null; var cat = -1; var ts = 0L
    val dims = Map.newBuilder[String, String]
    val props = Map.newBuilder[String, String]
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 2) => etype = r.str()
        case (2, 2) => val kv = decodeKeyValue(r.chunk()); if (kv._1 != null) dims += kv
        case (3, 2) =>
          val pr = r.chunk()
          var k: String = null; var v = ""
          while (pr.hasMore) {
            val pk = pr.varint(); val pf = (pk >>> 3).toInt; val pwire = (pk & 7).toInt
            (pf, pwire) match {
              case (1, 2) => k = pr.str()
              case (2, 2) => v = decodePropertyValue(pr.chunk())
              case _      => pr.skip(pwire)
            }
          }
          if (k != null) props += (k -> v)
        case (4, 0) => cat = r.varint().toInt
        case (5, 0) => ts = r.varint()
        case _      => r.skip(wire)
      }
    }
    // absent field → proto2 default (USER_DEFINED, the first declared value)
    val cname = if (cat < 0) "USER_DEFINED"
                else EventCategoryNames.getOrElse(cat, s"UNKNOWN_$cat")
    SfxEvent(etype, cname, dims.result(), props.result(), ts)
  }

  /** Decode one `EventUploadMessage` payload into its events. */
  def decodeEventUpload(bytes: Array[Byte]): Seq[SfxEvent] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Seq.newBuilder[SfxEvent]
    while (r.hasMore) {
      val key = r.varint(); val field = (key >>> 3).toInt; val wire = (key & 7).toInt
      if (field == 1 && wire == 2) {
        val c = r.chunk()
        out += decodeEvent(bytes, c.pos, c.end)
      } else r.skip(wire)
    }
    out.result()
  }

  // ------------------------------------------------------------- Spark

  /** Listener arm: binary upload payloads → datapoint rows. A typed narrow
    * flatMap — no shuffle; batch and streaming sources both compose. */
  def decode(payloads: DataFrame, binCol: String = "payload"): Dataset[SfxPoint] = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select(col(binCol)).as[Array[Byte]].flatMap(decodeUpload(_))
  }

  /** Listener arm that DROPS malformed payloads (truncated/corrupt wire
    * bytes) instead of failing the whole micro-batch — the binary twin of
    * the line codecs' log-and-skip contract (carbonlistener.go [P]). The
    * strict [[decode]] stays the default for self-encoded payloads, where
    * an error is a bug that must surface. */
  def decodeLenient(payloads: DataFrame, binCol: String = "payload"): Dataset[SfxPoint] =
    decodeLenientCounted(payloads, binCol)._1

  /** [[decodeLenient]] plus the drop counter: each dropped payload is
    * logged (size + cause) and counted in a named LongAccumulator, so the
    * log-and-skip contract has the reference listener's observability
    * (dropped-point stat keepers [P]) instead of silent data loss. The
    * accumulator shows up in the Spark UI per stage and is returned for
    * programmatic assertion. */
  def decodeLenientCounted(payloads: DataFrame, binCol: String = "payload")
      : (Dataset[SfxPoint], org.apache.spark.util.LongAccumulator) = {
    val s = payloads.sparkSession
    import s.implicits._
    val dropped = s.sparkContext.longAccumulator("graft.sfxproto.dropped_payloads")
    val ds = payloads.select(col(binCol)).as[Array[Byte]].flatMap { b =>
      try decodeUpload(b)
      catch {
        case e: MalformedPayloadException =>
          dropped.add(1L)
          log.warn(s"dropping malformed payload (${b.length} bytes): ${e.getMessage}")
          Nil
      }
    }
    (ds, dropped)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.ingest.SignalFxProto")

  /** Forwarder arm: pack each partition's datapoints into ONE upload
    * payload (the reference forwarder's batched POST body unit). */
  def encode(points: Dataset[SfxPoint]): DataFrame = {
    val s = points.sparkSession
    import s.implicits._
    points.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty else Iterator.single(encodeUpload(it))
    }.toDF("payload")
  }

  /** Event listener arm: binary `EventUploadMessage` payloads → event rows. */
  def decodeEvents(payloads: DataFrame, binCol: String = "payload"): Dataset[SfxEvent] = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select(col(binCol)).as[Array[Byte]].flatMap(decodeEventUpload(_))
  }

  /** Event forwarder arm: one `EventUploadMessage` payload per partition. */
  def encodeEvents(events: Dataset[SfxEvent]): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty else Iterator.single(encodeEventUpload(it))
    }.toDF("payload")
  }
}
