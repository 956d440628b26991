package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Segmented 6×6 matrix-affine Holt-Winters vs the sequential
  * rotating-state fold — the d=6 generalization of SegmentedHoltSpec. */
class SegmentedAffineSpec extends SparkSpec {

  // sequential HW additive with rotating seasonal slot (the contract)
  private def seqHw(vals: Seq[Double], a: Double = 0.3, b: Double = 0.2,
                    g: Double = 0.3): Array[Double] =
    vals.tail.foldLeft(Array(vals.head, 0.0, 0.0, 0.0, 0.0, 0.0)) { (st, y) =>
      val l2 = a * (y - st(2)) + (1 - a) * (st(0) + st(1))
      Array(l2, b * (l2 - st(0)) + (1 - b) * st(1),
        st(3), st(4), st(5), g * (y - l2) + (1 - g) * st(2))
    }

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def run(df: org.apache.spark.sql.DataFrame, nb: Int) = {
    val (m, c) = SegmentedAffine.holtWintersStep(0.3, 0.2, 0.3)
    SegmentedAffine.affineFinal(df, Seq("event_type"),
        col("ts").cast("double"), Seq(col("ts"), col("event_id")), col("value"),
        m, c, buckets = nb)
      .select(col("event_type"), col("n"),
        round(element_at(col("s"), 1), 4).as("l"),
        round(element_at(col("s"), 2), 4).as("t"),
        round(element_at(col("s"), 3), 4).as("sn"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
  }

  test("matches the sequential rotating-state fold on the fixture across bucket counts") {
    tables()
    val ev = spark.table("events")
    val expected = ev
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues { rows =>
        val vals = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
          .map(_.getDouble(3)).toSeq
        val st = seqHw(vals)
        (vals.size.toLong, r4(st(0)), r4(st(1)), r4(st(2)))
      }.toMap
    Seq(1, 2, 7, 64, 1024).foreach { nb =>
      assert(run(ev, nb) === expected, s"buckets=$nb drifted from sequential fold")
    }
  }

  test("random series: segmented == sequential at 4dp for every bucket count") {
    val sq = spark; import sq.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (new java.sql.Timestamp(i * 1000L), i.toLong, s"s${i % 3}",
        rnd.nextDouble() * 100 - 50)
    }
    val df = rows.toDF("ts", "event_id", "event_type", "value")
    val expected = rows.groupBy(_._3).view.mapValues { rs =>
      val vals = rs.sortBy(r => (r._1.getTime, r._2)).map(_._4).toSeq
      val st = seqHw(vals)
      (vals.size.toLong, r4(st(0)), r4(st(1)), r4(st(2)))
    }.toMap
    Seq(1, 3, 16, 256).foreach { nb =>
      assert(run(df, nb) === expected, s"buckets=$nb drifted on random data")
    }
  }
}
