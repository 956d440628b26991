package graft.core

import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The "scale profile" contract: ONE call flips the contract-shape SQL a
  * naive user writes onto the partitioned/bounded-memory scale operators.
  * Each assertion drives a shape through `spark.sql` with the profile on
  * and checks the REWRITTEN plan (and, where the rewrite is exact,
  * identical results). */
class GraftConfSpec extends SparkSpec {

  private def withProfile[T](p: GraftConf.ScaleProfile)(f: => T): T = {
    GraftConf.scaleDefaults(spark, p)
    try f finally GraftConf.reset(spark)
  }

  test("scaleDefaults returns and sets the documented keys; reset clears them") {
    val kv = GraftConf.scaleDefaults(spark)
    assert(kv.keySet === Set(
      "spark.graft.rangeJoin.bucketWidth",
      "spark.graft.rangeJoin.maxBucketsPerInterval",
      "spark.graft.asofJoin.rewrite",
      "spark.graft.rewrite.globalWindow"))
    kv.foreach { case (k, v) => assert(spark.conf.get(k) === v) }
    // exact by default: the result-changing approximations stay off
    assert(spark.conf.getOption("spark.graft.approx.countDistinct").isEmpty)
    GraftConf.reset(spark)
    kv.keys.foreach(k => assert(spark.conf.getOption(k).isEmpty, k))
    // registering twice never duplicates rules
    GraftConf.registerRules(spark)
    GraftConf.registerRules(spark)
    val names = spark.experimental.extraOptimizations.map(_.ruleName)
    assert(names.distinct.size === names.size, s"duplicated rules: $names")
  }

  test("profile plans the band-join shape onto the grid equi-join, same rows") {
    val sq = spark; import sq.implicits._
    val pts = spark.range(400).select((col("id") * 13L % 9000L).as("p"))
    val bands = spark.range(300)
      .select(((col("id") * 91L) % 9000L).as("lo"))
      .withColumn("hi", col("lo") + 500L)
    pts.createOrReplaceTempView("gc_pts"); bands.createOrReplaceTempView("gc_bands")
    val sql = "SELECT count(*) AS n FROM gc_pts JOIN gc_bands ON p >= lo AND p <= hi"
    val exact = spark.sql(sql).head.getLong(0)
    withProfile(GraftConf.ScaleProfile(rangeJoinBucketWidth = 500.0)) {
      val d = spark.sql(sql)
      d.collect()
      val p = d.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"band join must become a grid equi-join under the profile:\n$p")
      assert(d.head.getLong(0) === exact)
    }
  }

  test("profile plans the interval-overlap shape onto the grid join too") {
    val sq = spark; import sq.implicits._
    val a = spark.range(300).select(col("id").as("aid"),
        ((col("id") * 37L) % 5000L).as("al"))
      .withColumn("ah", col("al") + 200L)
    val b = spark.range(400).select(col("id").as("bid"),
        ((col("id") * 91L) % 5000L).as("bl"))
      .withColumn("bh", col("bl") + 150L)
    a.createOrReplaceTempView("gc_ia"); b.createOrReplaceTempView("gc_ib")
    val sql = """SELECT count(*) AS n FROM gc_ia JOIN gc_ib
                |  ON al <= bh AND bl <= ah""".stripMargin
    val exact = spark.sql(sql).head.getLong(0)
    withProfile(GraftConf.ScaleProfile(rangeJoinBucketWidth = 250.0)) {
      val d = spark.sql(sql)
      d.collect()
      val p = d.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"interval overlap must become the canonical-cell grid join:\n$p")
      assert(d.head.getLong(0) === exact)
    }
  }

  test("profile plans the theta as-of shape onto the running-window plan") {
    val sq = spark; import sq.implicits._
    val l = (1 to 200).map(i => (i.toLong % 10, i.toLong * 3)).toDF("k", "lts")
    val r = (1 to 100).map(i => (i.toLong % 10, i.toLong * 7)).toDF("k", "rts")
    l.createOrReplaceTempView("gc_l"); r.createOrReplaceTempView("gc_r")
    val sql =
      """SELECT r.rts, max(l.lts) AS asof FROM gc_r r
        |LEFT JOIN gc_l l ON l.k = r.k AND l.lts <= r.rts
        |GROUP BY r.rts""".stripMargin
    val exact = canon(spark.sql(sql).orderBy("rts"))
    withProfile(GraftConf.ScaleProfile()) {
      val d = spark.sql(sql)
      val opt = d.queryExecution.optimizedPlan
      assert(opt.collect { case j: LJoin => j }.isEmpty,
        s"as-of theta join must be gone:\n$opt")
      assert(opt.collect { case w: LWindow => w }.nonEmpty,
        s"expected the running-window as-of plan:\n$opt")
      assert(canon(d.orderBy("rts")) === exact)
    }
  }

  test("profile plans entire-frame window aggregates without a global Window") {
    val sq = spark; import sq.implicits._
    val t = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    t.createOrReplaceTempView("gc_w")
    val sql = "SELECT id, v / sum(v) OVER () AS share FROM gc_w"
    val exact = canon(spark.sql(sql).orderBy("id"))
    withProfile(GraftConf.ScaleProfile()) {
      val d = spark.sql(sql)
      d.collect()
      val p = d.queryExecution.executedPlan.toString
      assert(!p.contains("WindowExec") && !p.contains("Window ("),
        s"unpartitioned Window must be rewritten:\n$p")
      assert(canon(d.orderBy("id")) === exact)
    }
  }

  test("approx = true additionally flips count-distinct onto HLL++") {
    tables()
    val sql = "SELECT count(DISTINCT o_custkey) AS nd FROM orders"
    val exact = spark.sql(sql).head.getLong(0)
    withProfile(GraftConf.ScaleProfile(approx = true, rsd = 0.02)) {
      val d = spark.sql(sql)
      d.collect()
      val p = d.queryExecution.executedPlan.toString
      assert(p.contains("approx_count_distinct") || p.contains("hyperloglog"),
        s"expected the HLL++ plan:\n$p")
      val nd = d.head.getLong(0)
      assert(math.abs(nd - exact).toDouble / exact <= 0.15, s"$nd vs $exact")
    }
  }
}
