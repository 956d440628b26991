package graft.operators

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: interleave math + the property that actually matters —
  * each written file covers a small rectangle of the 2-D value domain, so
  * min-max stats prune box predicates on BOTH columns. */
class LayoutSpec extends SparkSpec {

  import graft.functions.expressions.ZOrderInterleave.interleave

  test("interleave: bit placement, bounds, monotone locality") {
    assert(interleave(0L, 0L) === 0L)
    assert(interleave(1L, 0L) === 1L)
    assert(interleave(0L, 1L) === 2L)
    assert(interleave(3L, 3L) === 15L)
    // x bits land at even positions, y at odd — recoverable exactly
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val x = rnd.nextInt(Int.MaxValue).toLong
      val y = rnd.nextInt(Int.MaxValue).toLong
      val z = interleave(x, y)
      var rx = 0L; var ry = 0L
      (0 until 31).foreach { i =>
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(rx === x && ry === y)
    }
    // points sharing high bucket bits share high z bits (quadrant nesting)
    assert((interleave(0x40000000L >> 1, 0L) >> 60) === (interleave(
      (0x40000000L >> 1) | 1L, 1L) >> 60))
  }

  test("z-order write: files cover small rectangles; row-order files span the domain") {
    val sq = spark
    import sq.implicits._
    val rnd = new Random(42)
    val pts = (1 to 60000).map(_ => (rnd.nextDouble(), rnd.nextDouble()))
      .toDF("x", "y").repartition(8).cache()
    pts.count()

    def meanFileBoxArea(path: String): Double = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(((max("x") - min("x")) * (max("y") - min("y"))).as("area"))
      val n = per.count()
      assert(n >= 8, s"expected >= 8 files, got $n")
      per.agg(avg("area")).head().getDouble(0)
    }

    val base = Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(pts, "x", "y", s"$base/z", numFiles = 16)
    pts.repartition(16).write.parquet(s"$base/plain")

    val zArea = meanFileBoxArea(s"$base/z")
    val plainArea = meanFileBoxArea(s"$base/plain")
    // 16 z-ordered files ≈ 1/16 of the unit square each; round-robin files
    // each span essentially the whole square
    assert(zArea < 0.35 * plainArea,
      f"z-order locality missing: z=$zArea%.3f plain=$plainArea%.3f")
    assert(zArea < 0.25, f"each z file should cover a small rectangle, got $zArea%.3f")

    // and the rewrite is lossless
    val a = spark.read.parquet(s"$base/z").agg(count(lit(1)), round(sum("x"), 6)).head()
    val b = pts.agg(count(lit(1)), round(sum("x"), 6)).head()
    assert(a === b)
  }

  test("bucketed co-located join: zero Exchange on either side, results exact") {
    tables()
    val li = spark.table("lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.table("orders").select("o_orderkey", "o_totalprice")
    Layout.bucketedWrite(li, "l_orderkey", 8, "li_bkt")
    Layout.bucketedWrite(ord, "o_orderkey", 8, "ord_bkt")
    try {
      // force the merge-join path: a broadcast join would skip the
      // shuffle trivially and prove nothing about the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucket pruning metadata missing:\n$plan")
      // and it is the same join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("compact: small files merge to the computed count, rows intact") {
    val sq = spark; import sq.implicits._
    val in = Files.createTempDirectory("compact_in").toString
    val out = Files.createTempDirectory("compact_out").toString
    val df = (1 to 20000).map(i => (i.toLong, s"row_$i")).toDF("k", "s")
    df.repartition(40).write.mode("overwrite").parquet(in)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val nIn = parquetFiles(in).length
    assert(nIn === 40)
    val bytes = parquetFiles(in).map(_.length()).sum
    // target a quarter of the input → expect ceil(bytes / (bytes/4)) ≈ 4
    val n = Layout.compact(spark, in, out, targetBytes = bytes / 4)
    assert(parquetFiles(out).length === n && n < nIn && n >= 2)
    // contents unchanged
    val back = spark.read.parquet(out)
    assert(back.count() === 20000)
    assert(back.agg(sum("k")).head().getLong(0) === 20000L * 20001 / 2)
  }

  test("compact with sortCol: files carry non-overlapping key ranges") {
    val sq = spark; import sq.implicits._
    val in = Files.createTempDirectory("compacts_in").toString
    val out = Files.createTempDirectory("compacts_out").toString
    val rnd = new Random(3)
    (1 to 30000).map(_ => rnd.nextLong()).toDF("k")
      .repartition(50).write.mode("overwrite").parquet(in)
    val bytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = Layout.compact(spark, in, out, targetBytes = bytes / 5,
      sortCol = Some("k"))
    assert(n >= 3)
    // per-file min-max ranges must be disjoint → a k-predicate scan
    // prunes whole files (the clustering half of the pass)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping files")
      case _ =>
    }
    assert(spark.read.parquet(out).count() === 30000)
  }

  test("compact refuses in-place rewrites") {
    val in = Files.createTempDirectory("compact_ip").toString
    intercept[IllegalArgumentException] {
      Layout.compact(spark, in, in)
    }
  }

  test("partition retention: old partition dirs drop without any scan") {
    val sq = spark; import sq.implicits._
    val base = Files.createTempDirectory("ret").toString
    Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
      .flatMap { case (d, v) => Seq.fill(100)((d, v)) }
      .toDF("day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(base)
    val dropped = Layout.dropPartitionsOlderThan(spark, base, "day", "2024-01-03")
    assert(dropped === Seq("2024-01-01", "2024-01-02"))
    val left = spark.read.parquet(base)
    // the partition value is type-inferred (DATE here) — compare as string
    assert(left.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq === Seq("2024-01-03"))
    assert(left.count() === 100)
    // idempotent: nothing left below the cutoff
    assert(Layout.dropPartitionsOlderThan(spark, base, "day", "2024-01-03").isEmpty)
  }

  test("partitioned compaction: each partition merges independently") {
    val sq = spark; import sq.implicits._
    val in = Files.createTempDirectory("cp_in").toString
    val out = Files.createTempDirectory("cp_out").toString
    (1 to 9000).map(i => (s"2024-01-0${i % 3 + 1}", i.toLong)).toDF("day", "v")
      .repartition(20).write.partitionBy("day").mode("overwrite").parquet(in)
    val perPart = new java.io.File(in).listFiles().filter(_.getName.startsWith("day="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(perPart.values.forall(_ > 5), s"fixture should start fragmented: $perPart")
    val n = Layout.compactPartitioned(spark, in, out, "day",
      targetBytes = 1L << 30)
    assert(n.keySet === Set("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(n.values.forall(_ === 1), n.toString)
    val back = spark.read.parquet(out)
    assert(back.count() === 9000)
    assert(back.agg(sum("v")).head().getLong(0) === 9000L * 9001 / 2)
  }

  test("z-order write degenerate inputs: empty frame and constant dimension fall back") {
    val sq = spark
    import sq.implicits._
    val base = Files.createTempDirectory("zorder-degen").toString
    // empty input: min/max are null — plain write, no NPE
    Layout.zorderWrite(Seq.empty[(Double, Double)].toDF("x", "y"),
      "x", "y", s"$base/empty", numFiles = 4)
    assert(spark.read.schema("x double, y double").parquet(s"$base/empty").count() === 0)
    // constant y (a realistic partition slice): unit-domain widening makes
    // the z-key a 1-D sort on x instead of a require() crash
    val constY = (1 to 1000).map(i => (i.toDouble, 5.0)).toDF("x", "y")
    Layout.zorderWrite(constY, "x", "y", s"$base/const", numFiles = 4)
    val back = spark.read.parquet(s"$base/const")
    assert(back.count() === 1000)
    val mm = back.groupBy(input_file_name().as("f")).agg((max("x") - min("x")).as("span"))
    assert(mm.agg(avg("span")).head().getDouble(0) < 500.0,
      "constant-y fallback should still cluster on x")
  }
}
