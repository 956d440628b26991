package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain equi-join on a skewed key distribution") {
    val sq = spark
    import sq.implicits._
    // 90% of rows share one hot key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B")).toDF("k", "tag")

    val plain = canon(large.join(small, Seq("k")).orderBy("k", "v", "tag"))
    val salted = canon(Skew.saltedJoin(large, small, "k", salts = 8)
      .orderBy("k", "v", "tag"))
    assert(salted === plain)
  }

  test("saltedJoin preserves left-outer semantics") {
    val sq = spark
    import sq.implicits._
    val large = Seq(("hot", 1), ("hot", 2), ("miss", 3)).toDF("k", "v")
    val small = Seq(("hot", "H")).toDF("k", "tag")
    val out = Skew.saltedJoin(large, small, "k", salts = 4, joinType = "left")
      .orderBy("k", "v").collect()
    assert(out.length === 3)
    assert(out.count(_.isNullAt(2)) === 1) // 'miss' survives with null tag
  }

  test("salting spreads the hot key over multiple shuffle partitions") {
    val sq = spark
    import sq.implicits._
    val large = (1 to 2000).map(i => ("hot", i)).toDF("k", "v")
    val small = Seq(("hot", "H")).toDF("k", "tag")
    val joined = Skew.saltedJoin(large, small, "k", salts = 8)
    val partsUsed = joined
      .select(spark_partition_id().as("p")).distinct().count()
    assert(partsUsed > 1, s"hot key still lands on a single partition")
  }
}
