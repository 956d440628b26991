package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew.bloomPrunedJoin: semi-join reduction must be exact (no false
  * negatives) while actually pruning the large side before the shuffle. */
class BloomPrunedJoinSpec extends SparkSpec {

  test("long keys: pruned inner join == plain inner join; pruning bites") {
    import spark.implicits._
    val large = (1L to 50000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = (1L to 500L).filter(_ % 5 == 0).map(i => (i * 97, s"dim$i"))
      .toDF("dk", "name")
    val plain = large.join(small, col("k") === col("dk")).collect()
      .map(_.mkString("|")).sorted.toSeq
    val bloomed = Skew.bloomPrunedJoin(large, small, "k", "dk",
      expectedItems = 1000, fpp = 0.01)
    val got = bloomed.collect().map(_.mkString("|")).sorted.toSeq
    assert(got === plain)
    // the probe must discard the overwhelming majority of the large side
    graft.functions.expressions.GraftFunctions.register(spark)
    val bf = small.stat.bloomFilter("dk", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val survivors = large.where(call_function("graft_bloom_might_contain",
      col("k"), lit(bos.toByteArray))).count()
    assert(survivors < 2000, s"bloom pruned only to $survivors of 50000")
  }

  test("string keys hash compatibly with stat.bloomFilter") {
    import spark.implicits._
    val large = (1 to 20000).map(i => (s"key$i", i)).toDF("k", "v")
    val small = (1 to 100).map(i => (s"key${i * 123}", i)).toDF("dk", "w")
    val plain = large.join(small, col("k") === col("dk")).collect()
      .map(_.mkString("|")).sorted.toSeq
    val got = Skew.bloomPrunedJoin(large, small, "k", "dk", 200, 0.01)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got === plain)
    assert(plain.nonEmpty, "fixture must actually join")
  }

  test("left_semi works; outer/anti are rejected") {
    import spark.implicits._
    val large = (1L to 1000L).toDF("k")
    val small = Seq(3L, 500L, 999L).toDF("dk")
    val semi = Skew.bloomPrunedJoin(large, small, "k", "dk", 10, 0.01, "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(semi === Seq(3L, 500L, 999L))
    intercept[IllegalArgumentException] {
      Skew.bloomPrunedJoin(large, small, "k", "dk", 10, 0.01, "left_anti")
    }
  }

  test("hash-family mismatch (string vs bigint keys) is rejected, not silently empty") {
    import spark.implicits._
    val large = Seq("42", "7").toDF("k")
    val small = Seq(42L).toDF("dk")
    val err = intercept[IllegalArgumentException] {
      Skew.bloomPrunedJoin(large, small, "k", "dk", 10, 0.01)
    }
    assert(err.getMessage.contains("hash family"), err.getMessage)
  }

  test("probe stays inside whole-stage codegen") {
    import spark.implicits._
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate
    // the probe at optimization time and leave no physical plan to audit
    val large = spark.range(1L, 101L).toDF("k")
    val small = Seq(1L, 2L).toDF("dk")
    val d = Skew.bloomPrunedJoin(large, small, "k", "dk", 10, 0.01)
    d.collect() // finalize AQE so the executed plan shows codegen spans
    val plan = d.queryExecution.executedPlan.toString
    // the star prefix is the codegen-span marker in the compact plan print
    assert("""\*\(\d+\) Filter graft_bloom_might_contain""".r.findFirstIn(plan).isDefined,
      s"probe filter must sit inside a whole-stage-codegen span:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
      s"probe must not be a UDF:\n$plan")
  }
}
