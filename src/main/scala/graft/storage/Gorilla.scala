package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gorilla-style time-series block compression (Pelkonen et al.,
  * "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
  * VLDB 2015 — public paper; this is a from-scratch implementation of the
  * published bit formats, not a port of any engine).
  *
  * Two streams inside one block:
  *  - timestamps: delta-of-delta, variable-width buckets
  *      dod = 0                  → '0'
  *      dod ∈ [-63, 64]          → '10'  + 7 bits
  *      dod ∈ [-255, 256]        → '110' + 9 bits
  *      dod ∈ [-2047, 2048]      → '1110' + 12 bits
  *      otherwise                → '1111' + 64 bits
  *  - values: XOR against the previous value
  *      xor = 0                  → '0'
  *      fits previous window     → '10' + meaningful bits
  *      new window               → '11' + 6b leading + 6b (len-1) + bits
  *
  * The round trip is bit-exact for every double (XOR carries the raw IEEE
  * bits, NaN payloads included) and every int64 timestamp.
  *
  * Spark surface: [[compact]] packs one block per group (group keys SHOULD
  * include a time bucket so block state stays bounded — the 100 TB contract:
  * a (series, 6h) chunk is a few thousand points whatever the corpus size),
  * [[restore]] explodes blocks back to rows. Both are single-shuffle
  * group-by pipelines; blocks travel as opaque binary columns, so a 16
  * bytes/point raw series typically ships as 2–4 bytes/point.
  */
object Gorilla {

  // ------------------------------------------------------------- bit I/O
  private[storage] final class BitWriter(initialBytes: Int = 64) {
    private var buf = new Array[Byte](initialBytes)
    private var bitPos = 0 // next free bit index

    private def ensure(extraBits: Int): Unit = {
      val needed = (bitPos + extraBits + 7) / 8
      if (needed > buf.length) {
        val grown = new Array[Byte](math.max(buf.length * 2, needed))
        System.arraycopy(buf, 0, grown, 0, buf.length)
        buf = grown
      }
    }

    /** Append the low `n` bits of `v`, most-significant first. */
    def write(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) {
        if (((v >>> i) & 1L) != 0L)
          buf(bitPos >> 3) = (buf(bitPos >> 3) | (1 << (7 - (bitPos & 7)))).toByte
        bitPos += 1
        i -= 1
      }
    }

    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) / 8)
  }

  private[storage] final class BitReader(bytes: Array[Byte]) {
    private var bitPos = 0
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(bitPos >> 3) >> (7 - (bitPos & 7))) & 1L)
        bitPos += 1
        i += 1
      }
      v
    }
    def readBit(): Int = read(1).toInt
  }

  // ------------------------------------------------------------- encode
  /** Encode parallel (ts, value) arrays (caller sorts; ties keep caller
    * order) into one block. Layout: 32-bit count, then for n>0 the raw
    * first point (64+64 bits) followed by the two compressed streams
    * interleaved point-by-point (ts bits then value bits). */
  def encode(ts: Array[Long], vs: Array[Double]): Array[Byte] = {
    require(ts.length == vs.length,
      s"ts/value length mismatch: ${ts.length} vs ${vs.length}")
    val n = ts.length
    val w = new BitWriter(16 + n * 4)
    w.write(n.toLong, 32)
    if (n == 0) return w.toBytes
    w.write(ts(0), 64)
    w.write(java.lang.Double.doubleToRawLongBits(vs(0)), 64)
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToRawLongBits(vs(0))
    var prevLead = -1 // no previous window
    var prevLen = 0
    var i = 1
    while (i < n) {
      // --- timestamp: delta-of-delta
      val delta = ts(i) - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.write(0L, 1)
      else if (dod >= -63 && dod <= 64) { w.write(2L, 2); w.write(dod + 63, 7) }
      else if (dod >= -255 && dod <= 256) { w.write(6L, 3); w.write(dod + 255, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.write(14L, 4); w.write(dod + 2047, 12) }
      else { w.write(15L, 4); w.write(dod, 64) }
      prevTs = ts(i)
      prevDelta = delta
      // --- value: XOR
      val bits = java.lang.Double.doubleToRawLongBits(vs(i))
      val xor = bits ^ prevBits
      if (xor == 0L) w.write(0L, 1)
      else {
        val lead = math.min(java.lang.Long.numberOfLeadingZeros(xor), 63)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        val len = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead && (64 - lead - len) >= (64 - prevLead - prevLen)) {
          // fits inside the previous meaningful window: reuse it
          w.write(2L, 2)
          w.write(xor >>> (64 - prevLead - prevLen), prevLen)
        } else {
          w.write(3L, 2)
          w.write(lead.toLong, 6)
          w.write((len - 1).toLong, 6)
          w.write(xor >>> trail, len)
          prevLead = lead
          prevLen = len
        }
      }
      prevBits = bits
      i += 1
    }
    w.toBytes
  }

  // ------------------------------------------------------------- decode
  def decode(bytes: Array[Byte]): (Array[Long], Array[Double]) = {
    val r = new BitReader(bytes)
    val n = r.read(32).toInt
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    if (n == 0) return (ts, vs)
    ts(0) = r.read(64)
    var prevBits = r.read(64)
    vs(0) = java.lang.Double.longBitsToDouble(prevBits)
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevLead = 0
    var prevLen = 0
    var i = 1
    while (i < n) {
      val dod =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) r.read(7) - 63
        else if (r.readBit() == 0) r.read(9) - 255
        else if (r.readBit() == 0) r.read(12) - 2047
        else r.read(64)
      prevDelta += dod
      prevTs += prevDelta
      ts(i) = prevTs
      if (r.readBit() == 1) {
        if (r.readBit() == 0) {
          // previous window
          val bits = r.read(prevLen)
          prevBits ^= bits << (64 - prevLead - prevLen)
        } else {
          prevLead = r.read(6).toInt
          prevLen = r.read(6).toInt + 1
          val bits = r.read(prevLen)
          val trail = 64 - prevLead - prevLen
          prevBits ^= bits << trail
        }
      }
      vs(i) = java.lang.Double.longBitsToDouble(prevBits)
      i += 1
    }
    (ts, vs)
  }

  // ------------------------------------------------------ Spark surface
  private val encodeUdf =
    udf { (t: Seq[Long], v: Seq[Double]) => encode(t.toArray, v.toArray) }
  private val decodeUdf = udf { (b: Array[Byte]) =>
    val (t, v) = decode(b)
    t.zip(v)
  }

  /** Pack `df` into one Gorilla block per group of `keyCols`. Points are
    * sorted by (ts, value) inside the block (deterministic under ties —
    * lineitem-style fixtures have no unique series key). One shuffle on the
    * group keys; include a time-bucket column in `keyCols` to bound block
    * size at corpus scale. Output: keyCols + n + blob. */
  def compact(df: DataFrame, keyCols: Seq[String], tsCol: String,
              valCol: String): DataFrame = {
    val sorted = df
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(tsCol).cast("long").as("t"),
        col(valCol).cast("double").as("v")))).as("pts"))
    sorted.select(keyCols.map(col) ++ Seq(
      size(col("pts")).as("n"),
      encodeUdf(col("pts.t"), col("pts.v")).as("blob")): _*)
  }

  /** Inverse of [[compact]]: one row per encoded point. */
  def restore(df: DataFrame, keyCols: Seq[String], tsName: String = "t",
              valName: String = "v"): DataFrame = {
    df.select(keyCols.map(col) :+ explode(decodeUdf(col("blob"))).as("pt"): _*)
      .select(keyCols.map(col) ++ Seq(
        col("pt._1").as(tsName), col("pt._2").as(valName)): _*)
  }
}
