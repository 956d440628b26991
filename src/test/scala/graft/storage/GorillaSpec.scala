package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GorillaSpec extends SparkSpec {

  private def roundTrip(ts: Array[Long], vs: Array[Double]): Unit = {
    val blob = Gorilla.encode(ts, vs)
    val (t2, v2) = Gorilla.decode(blob)
    assert(t2.toSeq === ts.toSeq)
    // bit-exact, not ==-exact: NaN != NaN but its payload must survive
    assert(v2.map(java.lang.Double.doubleToRawLongBits).toSeq ===
      vs.map(java.lang.Double.doubleToRawLongBits).toSeq)
  }

  test("round-trips empty, single, and constant blocks") {
    roundTrip(Array.empty, Array.empty)
    roundTrip(Array(17L), Array(3.25))
    roundTrip(Array.tabulate(100)(i => 1000L + 60L * i), Array.fill(100)(42.0))
  }

  test("round-trips special doubles bit-exactly") {
    val vs = Array(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, Double.MaxValue,
      -Double.MaxValue, 1.0, -1.0, math.Pi,
      java.lang.Double.longBitsToDouble(0x7ff8000000abcdefL)) // NaN payload
    roundTrip(Array.tabulate(vs.length)(_.toLong), vs)
  }

  test("round-trips every dod bucket, including irregular jumps") {
    val ts = Array[Long](0, 60, 120, 121, 185, 186, 500, 3000, 3001,
      1000000, 1000001, Long.MaxValue / 2)
    val vs = Array.tabulate(ts.length)(i => math.sin(i.toDouble) * 100)
    roundTrip(ts, vs)
    // negative timestamps and descending-then-ascending deltas
    roundTrip(Array(-5000L, -4000L, -3999L, 0L, 1L), Array.fill(5)(7.5))
  }

  test("round-trips 10k-point pseudorandom walks (fixed seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      var t = 1704067200L
      var v = 100.0
      val ts = Array.fill(10000) { t += 30 + rnd.nextInt(90); t }
      val vs = Array.fill(10000) { v += rnd.nextGaussian(); v }
      roundTrip(ts, vs)
    }
  }

  test("regular metrics series compress well below raw 16 bytes/point") {
    // 60 s cadence, gauge that changes slightly each minute — the shape the
    // paper's 12x number comes from. Raw = 16 B/pt; assert < 6 B/pt here
    // (values are full-entropy doubles; production gauges do better).
    val n = 10000
    val rnd = new scala.util.Random(7)
    val ts = Array.tabulate(n)(i => 1704067200L + 60L * i)
    var v = 500.0
    val vs = Array.fill(n) { v += (rnd.nextInt(5) - 2) * 0.25; v }
    val bytes = Gorilla.encode(ts, vs).length
    assert(bytes.toDouble / n < 6.0, s"got ${bytes.toDouble / n} B/pt")
    // constant series: timestamps 1 bit/pt, values 1 bit/pt
    val flat = Gorilla.encode(ts, Array.fill(n)(42.0)).length
    assert(flat.toDouble / n < 0.5, s"flat series got ${flat.toDouble / n} B/pt")
  }

  test("Spark compact/restore reproduces the events fixture exactly") {
    tables()
    val ev = spark.table("events").select(col("user_id"),
        col("ts").cast("bigint").as("et"), col("value"))
      .withColumn("bucket", (floor(col("et") / 21600) * 21600).cast("bigint"))
    val blocks = Gorilla.compact(ev, Seq("user_id", "bucket"), "et", "value")
    val back = Gorilla.restore(blocks, Seq("user_id", "bucket"), "et", "value")
    val orig = canon(ev.select("user_id", "bucket", "et", "value")
      .orderBy("user_id", "bucket", "et", "value"))
    val rt = canon(back.select("user_id", "bucket", "et", "value")
      .orderBy("user_id", "bucket", "et", "value"))
    assert(rt === orig)
    // blocks group points (sf0.001 series are sparse — ~1.3 points per
    // 6 h chunk — so only assert grouping happened, not a ratio; the
    // compression-ratio contract lives in the synthetic tests above)
    assert(blocks.count() < ev.count())
  }
}
