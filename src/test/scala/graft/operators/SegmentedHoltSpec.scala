package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Segmented matrix-affine Holt vs the sequential (level, trend) fold —
  * the 2×2 generalization of SegmentedEmaSpec's checks. */
class SegmentedHoltSpec extends SparkSpec {

  private def seqHolt(vals: Seq[Double], a: Double = 0.3, b: Double = 0.2): (Double, Double) =
    vals.tail.foldLeft((vals.head, 0.0)) { case ((l, t), x) =>
      val l2 = a * x + (1 - a) * (l + t)
      (l2, b * (l2 - l) + (1 - b) * t)
    }

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

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
        val (l, t) = seqHolt(vals)
        (vals.size.toLong, r4(l), r4(t))
      }.toMap
    Seq(1, 2, 7, 64, 1024).foreach { nb =>
      val got = SegmentedHolt.holtFinal(ev, Seq("event_type"),
          col("ts").cast("double"), Seq(col("ts"), col("event_id")), col("value"),
          buckets = nb)
        .select(col("event_type"), col("n"),
          round(col("level"), 4).as("l"), round(col("trend"), 4).as("t"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(got === expected, s"buckets=$nb diverged from the sequential fold")
    }
  }

  test("degenerate series and non-default smoothing parameters") {
    val sq = spark
    import sq.implicits._
    val t = Seq(
      ("a", 1.0, 1L, 10.0), // singleton: level == value, trend == 0
      ("b", 1.0, 1L, 4.0), ("b", 2.0, 2L, 2.0), ("b", 3.0, 3L, 6.0)
    ).toDF("s", "k", "id", "v")
    val got = SegmentedHolt.holtFinal(t, Seq("s"), col("k"),
        Seq(col("k"), col("id")), col("v"), alpha = 0.5, beta = 0.4, buckets = 8)
      .select(col("s"), col("n"), round(col("level"), 6).as("l"), round(col("trend"), 6).as("t"))
      .orderBy("s").collect()
    assert(got(0).getLong(1) === 1L && got(0).getDouble(2) === 10.0 && got(0).getDouble(3) === 0.0)
    val exp = Seq(4.0, 2.0, 6.0).tail.foldLeft((4.0, 0.0)) { case ((l, tr), x) =>
      val l2 = 0.5 * x + 0.5 * (l + tr)
      (l2, 0.4 * (l2 - l) + 0.6 * tr)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1).getDouble(2) === r6(exp._1) && got(1).getDouble(3) === r6(exp._2))
  }

  test("random series: segmented == sequential at 4dp for every bucket count") {
    val sq = spark
    import sq.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      s <- Seq("x", "y")
      i <- 1 to 400
    } yield (s, rnd.nextDouble() * 1e6, i.toLong, rnd.nextDouble() * 200 - 100)
    val t = rows.toDF("s", "k", "id", "v")
    val expected = rows.groupBy(_._1).view.mapValues { rs =>
      val vals = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val (l, tr) = seqHolt(vals)
      (r4(l), r4(tr))
    }.toMap
    Seq(1, 3, 33, 400).foreach { nb =>
      val got = SegmentedHolt.holtFinal(t, Seq("s"), col("k"),
          Seq(col("k"), col("id")), col("v"), buckets = nb)
        .select(col("s"), round(col("level"), 4).as("l"), round(col("trend"), 4).as("t"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(got === expected, s"buckets=$nb diverged")
    }
  }
}
