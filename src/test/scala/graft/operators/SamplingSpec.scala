package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** hashSplit: total, disjoint, stable, and proportionate. */
class SamplingSpec extends SparkSpec {

  private def df = {
    val sq = spark; import sq.implicits._
    (1L to 20000L).toDF("id")
  }

  test("every row gets exactly one split; assignment is stable") {
    val s1 = Sampling.hashSplit(df, col("id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(s1.where(col("split").isNull).count() === 0)
    assert(s1.count() === 20000)
    // re-evaluation yields the identical assignment (no randomSplit re-roll)
    val a = s1.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(df, col("id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("proportions land near the declared percentages") {
    val counts = Sampling.hashSplit(df, col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 16000L) < 800, counts.toString)
    assert(math.abs(counts("val") - 2000L) < 400, counts.toString)
    assert(math.abs(counts("test") - 2000L) < 400, counts.toString)
  }

  test("invalid percentages are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 50, "b" -> 40))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 100, "b" -> 0))
    }
  }
}
