package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Quadratic reference: p on the frontier iff no q dominates it. */
  private def naive(df: DataFrame): Set[(Double, Int)] = {
    val pts = df.collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq
    pts.filter { case (p1, p2) =>
      !pts.exists { case (q1, q2) =>
        q1 <= p1 && q2 >= p2 && (q1 < p1 || q2 > p2)
      }
    }.toSet
  }

  test("pareto2d matches the quadratic dominance reference on a known set") {
    val df = Seq(
      (1.0, 5), (2.0, 7), (2.0, 7), (3.0, 7), (1.5, 5), (1.0, 4),
      (4.0, 9), (5.0, 8), (0.5, 1), (4.0, 2)).toDF("price", "size")
    val got = Skyline.pareto2d(df, "price", "size")
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
    assert(got === naive(df))
    assert(got === Set((0.5, 1), (1.0, 5), (2.0, 7), (4.0, 9)))
  }

  test("pareto2d matches the quadratic reference on fixture data under any partitioning") {
    tables()
    val df = spark.table("part")
      .select(col("p_retailprice").as("price"), col("p_size").as("size"))
    val expect = naive(df)
    for (parts <- Seq(1, 3, 16)) {
      val got = Skyline.pareto2d(df.repartition(parts), "price", "size")
        .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
      assert(got === expect, s"frontier diverged at $parts partitions")
    }
  }

  test("frontier is mutually non-dominated and sorted-unique on price") {
    tables()
    val got = Skyline.pareto2d(
        spark.table("part").select(col("p_retailprice").as("price"), col("p_size").as("size")),
        "price", "size")
      .orderBy("price").collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq
    assert(got.map(_._1).distinct.size === got.size)
    // along increasing price, size must strictly increase (else dominated)
    assert(got.sliding(2).forall {
      case Seq((p1, s1), (p2, s2)) => p1 < p2 && s1 < s2
      case _ => true
    })
  }
}
