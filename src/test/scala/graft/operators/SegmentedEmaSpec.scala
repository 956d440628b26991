package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Segmented-affine EMA vs the sequential ordered fold: the re-association
  * is algebraically exact, so at the contract's 4-decimal rounding the two
  * must agree — across bucket counts (chunk boundaries move), degenerate
  * sizes, and random data. */
class SegmentedEmaSpec extends SparkSpec {

  /** Sequential reference: driver-side fold in exact series order. */
  private def seqEma(vals: Seq[Double]): Double =
    vals.tail.foldLeft(vals.head)((acc, x) => acc * 0.7 + x * 0.3)

  test("matches the sequential fold on the events fixture across bucket counts") {
    tables()
    val ev = spark.table("events")
    val expected = ev
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues { rows =>
        val vals = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
          .map(_.getDouble(3)).toSeq
        (vals.size.toLong, BigDecimal(seqEma(vals)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      }.toMap
    Seq(1, 2, 7, 64, 1024).foreach { nb =>
      val got = SegmentedEma.emaFinal(ev, Seq("event_type"),
          col("ts").cast("double"), Seq(col("ts"), col("event_id")), col("value"),
          buckets = nb)
        .select(col("event_type"), col("n"), round(col("ema"), 4).as("ema"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
        .toMap
      assert(got === expected, s"buckets=$nb diverged from the sequential fold")
    }
  }

  test("degenerate series: single element, two elements, identical order keys") {
    val sq = spark
    import sq.implicits._
    val t = Seq(
      ("a", 1.0, 1L, 10.0),              // singleton: ema == value
      ("b", 1.0, 1L, 1.0), ("b", 2.0, 2L, 2.0),
      ("c", 5.0, 1L, 3.0), ("c", 5.0, 2L, 9.0), ("c", 5.0, 3L, 6.0)
    ).toDF("s", "k", "id", "v")
    val got = SegmentedEma.emaFinal(t, Seq("s"), col("k"),
        Seq(col("k"), col("id")), col("v"), buckets = 16)
      .select(col("s"), col("n"), round(col("ema"), 4).as("ema"))
      .orderBy("s").collect()
    assert(got(0).getLong(1) === 1L && got(0).getDouble(2) === 10.0)
    assert(got(1).getDouble(2) === BigDecimal(seqEma(Seq(1.0, 2.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2).getDouble(2) === BigDecimal(seqEma(Seq(3.0, 9.0, 6.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("random series: segmented == sequential at 4dp for every bucket count") {
    val sq = spark
    import sq.implicits._
    val rnd = new scala.util.Random(42)
    val rows = for {
      s <- Seq("x", "y", "z")
      i <- 1 to 500
    } yield (s, rnd.nextDouble() * 1e6, i.toLong, rnd.nextDouble() * 200 - 100)
    val t = rows.toDF("s", "k", "id", "v")
    val expected = rows.groupBy(_._1).view.mapValues { rs =>
      val vals = rs.sortBy(r => (r._2, r._3)).map(_._4)
      BigDecimal(seqEma(vals)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    Seq(1, 3, 33, 500).foreach { nb =>
      val got = SegmentedEma.emaFinal(t, Seq("s"), col("k"),
          Seq(col("k"), col("id")), col("v"), buckets = nb)
        .select(col("s"), round(col("ema"), 4).as("ema"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected, s"buckets=$nb diverged")
    }
  }

  test("decay/weight parameters other than the 0.7/0.3 contract pair") {
    val sq = spark
    import sq.implicits._
    val vals = Seq(4.0, 8.0, 15.0, 16.0, 23.0, 42.0)
    val t = vals.zipWithIndex.map { case (v, i) => ("s", i.toDouble, i.toLong, v) }
      .toDF("s", "k", "id", "v")
    val exp = vals.tail.foldLeft(vals.head)((acc, x) => acc * 0.9 + x * 0.1)
    val got = SegmentedEma.emaFinal(t, Seq("s"), col("k"),
        Seq(col("k"), col("id")), col("v"), decay = 0.9, weight = 0.1, buckets = 3)
      .select(round(col("ema"), 6)).head().getDouble(0)
    assert(got === BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
