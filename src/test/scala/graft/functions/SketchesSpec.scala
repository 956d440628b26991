package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error-bound assertions for the approximate sketch operators against the
  * EXACT answers (the AGG-DISTINCT / AGG-MEDIAN ground truth). Sketches are
  * deterministic on fixed data, so these are hard assertions, not flaky
  * statistical ones. */
class SketchesSpec extends SparkSpec {

  test("approxDistinct: relative error within 3x rsd of exact per group") {
    tables()
    val ev = spark.table("events")
    val rows = Sketches.approxDistinct(ev, "event_type", "user_id", rsd = 0.05)
      .join(ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("exact")), "event_type")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val apx = r.getAs[Long]("approx_nd").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      val relErr = math.abs(apx - exact) / math.max(exact, 1.0)
      assert(relErr <= 0.15, s"${r.get(0)}: approx=$apx exact=$exact relErr=$relErr")
    }
  }

  test("kll quantile sketches: rank error bounded, rollup needs no raw-data rescan") {
    tables()
    val ev = spark.table("events").where(col("value").isNotNull)
    // fine grain: per-(event_type, user bucket) sketches — the shape a
    // 100 TB pipeline materializes once per partition/hour
    val fine = Sketches.kllSketch(
      ev.withColumn("shard", (col("user_id") % 8).cast("int")),
      Seq("event_type", "shard"), "value")
    // coarse: union shards per event_type, then read quantiles
    val rolled = Sketches.kllRollup(fine, Seq("event_type"))
      .select(col("event_type"),
        Sketches.kllQuantile(col("kll"), 0.5).as("q50"),
        Sketches.kllQuantile(col("kll"), 0.9).as("q90"))
    val got = rolled.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    // verify by RANK (the KLL guarantee): the estimated quantile's true
    // rank must be within ~3x the 1.65% one-sided bound of the target
    val values = ev.select(col("event_type"), col("value").cast("double"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    got.foreach { case (g, (q50, q90)) =>
      val vs = values(g)
      def rank(x: Double): Double = vs.count(_ <= x).toDouble / vs.length
      assert(math.abs(rank(q50) - 0.5) <= 0.05, s"$g q50 rank=${rank(q50)}")
      assert(math.abs(rank(q90) - 0.9) <= 0.05, s"$g q90 rank=${rank(q90)}")
    }
  }

  test("kll rollup across groupings: day-level answers from hour-level sketches") {
    tables()
    val ev = spark.table("events").where(col("value").isNotNull)
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withColumn("day", date_trunc("day", col("ts")))
    val hourly = Sketches.kllSketch(ev, Seq("day", "hour"), "value")
    val daily = Sketches.kllRollup(hourly, Seq("day"))
      .select(col("day"), Sketches.kllQuantile(col("kll"), 0.5).as("q50"))
    val gotDays = daily.collect().map(r => r.get(0).toString -> r.getDouble(1)).toMap
    val exact = ev.groupBy("day").agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.get(0).toString -> r.getDouble(1)).toMap
    assert(gotDays.nonEmpty && gotDays.keySet === exact.keySet)
    // medians land near the exact per-day median (value-domain tolerance:
    // rank 0.5 ± 5% of a smooth-ish distribution)
    gotDays.foreach { case (d, q) =>
      assert(!q.isNaN)
      assert(math.abs(q - exact(d)) / math.max(math.abs(exact(d)), 1.0) <= 0.25,
        s"$d kll=$q exact=${exact(d)}")
    }
  }

  test("theta sketches: exact below nominal; set algebra matches ground truth") {
    val sq = spark
    import sq.implicits._
    // A = [0, 2000), B = [1000, 3000): union 3000, intersect 1000, diff 1000
    val df = ((0L until 2000L).map(("a", _)) ++ (1000L until 3000L).map(("b", _)))
      .toDF("seg", "uid")
    val sk = Sketches.thetaSketch(df, Seq("seg"), "uid") // lgK=12 > 3000: exact mode
    val r = sk.where(col("seg") === "a").select(col("theta").as("ta"))
      .crossJoin(sk.where(col("seg") === "b").select(col("theta").as("tb")))
      .select(
        Sketches.thetaEstimate(Sketches.thetaUnionPair(col("ta"), col("tb"))).as("u"),
        Sketches.thetaEstimate(Sketches.thetaIntersect(col("ta"), col("tb"))).as("i"),
        Sketches.thetaEstimate(Sketches.thetaANotB(col("ta"), col("tb"))).as("d"))
      .head()
    assert(math.abs(r.getDouble(0) - 3000.0) < 1e-6, s"union=${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 1000.0) < 1e-6, s"inter=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 1000.0) < 1e-6, s"diff=${r.getDouble(2)}")
  }

  test("theta estimation mode: bounded error on set ops, rollup without rescan") {
    val sq = spark
    import sq.implicits._
    // 120k-element segments with 50% overlap, lgK=10 (1024 retained):
    // rse ~ 3.1%, assert a 5-sigma-ish 15% (deterministic on fixed data)
    val n = 120000L
    val df = ((0L until n).map(("a", _)) ++ ((n / 2) until (n / 2 + n)).map(("b", _)))
      .toDF("seg", "uid").repartition(8)
    val sk = Sketches.thetaSketch(df, Seq("seg"), "uid", lgK = 10)
    val r = sk.where(col("seg") === "a").select(col("theta").as("ta"))
      .crossJoin(sk.where(col("seg") === "b").select(col("theta").as("tb")))
      .select(
        Sketches.thetaEstimate(Sketches.thetaUnionPair(col("ta"), col("tb"))).as("u"),
        Sketches.thetaEstimate(Sketches.thetaIntersect(col("ta"), col("tb"))).as("i"),
        Sketches.thetaEstimate(Sketches.thetaANotB(col("ta"), col("tb"))).as("d"))
      .head()
    def relErr(est: Double, exact: Double) = math.abs(est - exact) / exact
    assert(relErr(r.getDouble(0), 1.5 * n) <= 0.15, s"union=${r.getDouble(0)}")
    assert(relErr(r.getDouble(1), 0.5 * n) <= 0.15, s"inter=${r.getDouble(1)}")
    assert(relErr(r.getDouble(2), 0.5 * n) <= 0.15, s"diff=${r.getDouble(2)}")
    // rollup: per-(seg, shard) sketches union to per-seg estimates with
    // the same bound — the no-rescan re-aggregation contract
    val fine = Sketches.thetaSketch(
      df.withColumn("sh", pmod(col("uid"), lit(16))), Seq("seg", "sh"), "uid", lgK = 10)
    assert(fine.count() === 32)
    val rolled = Sketches.thetaRollup(fine, Seq("seg"), lgK = 10)
      .select(col("seg"), Sketches.thetaEstimate(col("theta")).as("est"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(relErr(rolled("a"), n.toDouble) <= 0.15, s"rolled a=${rolled("a")}")
    assert(relErr(rolled("b"), n.toDouble) <= 0.15, s"rolled b=${rolled("b")}")
  }

  test("theta pairwise union preserves input precision (no lgK-12 downsample)") {
    val sq = spark
    import sq.implicits._
    // disjoint 150k-uid segments at lgK=14 (16384 retained each, ~0.8% rse):
    // the pairwise union must size itself from the inputs, not the builder
    // default (4096 = lgK 12), or the result silently carries 2x the error
    val n = 150000L
    val df = ((0L until n).map(("a", _)) ++ (n until 2 * n).map(("b", _)))
      .toDF("seg", "uid").repartition(8)
    val sk = Sketches.thetaSketch(df, Seq("seg"), "uid", lgK = 14)
    val union = sk.where(col("seg") === "a").select(col("theta").as("ta"))
      .crossJoin(sk.where(col("seg") === "b").select(col("theta").as("tb")))
      .select(Sketches.thetaUnionPair(col("ta"), col("tb")).as("u")).head()
      .getAs[Array[Byte]](0)
    val heap = org.apache.datasketches.theta.Sketches.heapifySketch(
      org.apache.datasketches.memory.Memory.wrap(union))
    assert(heap.getRetainedEntries(true) > 8192,
      s"union downsampled to ${heap.getRetainedEntries(true)} entries " +
        "(lgK-12 default) despite lgK=14 inputs")
    val est = heap.getEstimate
    assert(math.abs(est - 2.0 * n) / (2.0 * n) <= 0.05, s"union est=$est")
  }

  test("kll rank readout inverts quantile within the rank-error bound") {
    tables()
    val ev = spark.table("events").where(col("value").isNotNull)
    val sk = Sketches.kllSketch(ev, Seq("event_type"), "value")
      .select(col("event_type"),
        Sketches.kllQuantile(col("kll"), 0.7).as("q70"))
    // rank(quantile(0.7)) must come back ~0.7 on the SAME sketch
    val both = Sketches.kllSketch(ev, Seq("event_type"), "value")
      .join(sk, "event_type")
      .select(col("event_type"), Sketches.kllRank(col("kll"), col("q70")).as("r"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { x =>
      assert(math.abs(x.getDouble(1) - 0.7) <= 0.05,
        s"${x.getString(0)}: rank(q70)=${x.getDouble(1)}")
    }
  }

  test("kll quantile of an all-null group reads out null, not a crash") {
    val sq = spark
    import sq.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", None), ("b", None))
      .toDF("g", "value")
    val got = Sketches.kllSketch(df, Seq("g"), "value")
      .select(col("g"), Sketches.kllQuantile(col("kll"), 0.5).as("q"))
      .orderBy("g").collect()
    assert(got(0).getString(0) === "a" && !got(0).isNullAt(1))
    assert(got(1).getString(0) === "b" && got(1).isNullAt(1),
      "an empty sketch (all-null group) must yield a null quantile")
  }

  test("hll sketches merge: rollup of fine-grained sketches matches the direct estimate") {
    tables()
    val ev = spark.table("events")
    // sketch per (event_type, user_id bucket) — the "per shard" fine grain —
    // then roll up to event_type WITHOUT rescanning events
    val fine = Sketches.hllSketch(
      ev.withColumn("shard", pmod(col("user_id"), lit(8))),
      Seq("event_type", "shard"), "user_id", lgK = 12)
    val rolled = Sketches.hllRollup(fine, Seq("event_type"))
      .select(col("event_type"), Sketches.hllEstimate(col("hll")).as("est"))
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("exact"))
    val rows = rolled.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est").toDouble
      val ex = r.getAs[Long]("exact").toDouble
      // lgK=12 → ~1.6% rsd; assert 3-sigma + small-count slack
      assert(math.abs(est - ex) <= math.max(ex * 0.05, 2.0),
        s"${r.get(0)}: merged est=$est exact=$ex")
    }
  }

  test("hll rollup estimate equals sketching the coarse group directly") {
    tables()
    val ev = spark.table("events")
    val viaRollup = Sketches.hllRollup(
        Sketches.hllSketch(ev.withColumn("shard", pmod(col("user_id"), lit(8))),
          Seq("event_type", "shard"), "user_id"),
        Seq("event_type"))
      .select(col("event_type"), round(Sketches.hllEstimate(col("hll")), 6).as("est"))
    val direct = Sketches.hllSketch(ev, Seq("event_type"), "user_id")
      .select(col("event_type"), round(Sketches.hllEstimate(col("hll")), 6).as("est"))
    assert(canon(viaRollup.orderBy("event_type")) === canon(direct.orderBy("event_type")),
      "HLL union must be lossless: merge-of-parts == sketch-of-whole")
  }

  test("approxMedian: rank error within group_size/accuracy of the true median") {
    tables()
    val ev = spark.table("events")
    val apx = Sketches.approxMedian(ev, "event_type", "value", accuracy = 10000)
    val rows = apx.join(ev.groupBy("event_type").agg(count(lit(1)).as("n")), "event_type")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getString(0)
      val m = r.getAs[Double]("approx_median")
      val n = r.getAs[Long]("n").toDouble
      val below = ev.where(col("event_type") === g && col("value") <= m).count().toDouble
      // GK guarantee: |rank - n/2| <= n/accuracy (+1 slack for ties)
      assert(math.abs(below - n / 2) <= n / 10000 + 1,
        s"$g: approx median $m has rank $below of $n")
    }
  }

  test("approxQuantiles returns a monotone vector of data values") {
    tables()
    val ev = spark.table("events")
    val rows = Sketches.approxQuantiles(ev, "event_type", "value",
      Seq(0.1, 0.5, 0.9)).collect()
    rows.foreach { r =>
      val q = r.getSeq[Double](1)
      assert(q.size === 3 && q(0) <= q(1) && q(1) <= q(2), s"${r.get(0)}: $q")
    }
  }

  /** Assert the Misra-Gries guarantees of a frequentItems result against
    * exact counts: no overestimates, undercount ≤ n/(k+1), every item with
    * true count > n/(k+1) present. */
  private def assertMgBounds(freq: Map[String, Long], exact: Map[String, Long], k: Int): Unit = {
    val n = exact.values.sum.toDouble
    val bound = n / (k + 1)
    freq.foreach { case (item, est) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est <= truth, s"$item: est $est overstates true $truth")
      assert(truth - est <= bound, s"$item: undercount ${truth - est} > $bound")
    }
    exact.foreach { case (item, truth) =>
      if (truth > bound)
        assert(freq.contains(item), s"guaranteed-heavy $item (count $truth > $bound) missing")
    }
  }

  test("frequentItems: MG bounds hold per group on events") {
    tables()
    val ev = spark.table("events")
    val k = 16
    val freq = Sketches.frequentItems(ev, Seq("event_type"), "user_id", k)
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(freq.nonEmpty && freq.values.forall(m => m.nonEmpty && m.size <= k))
    val exact = ev.groupBy("event_type", "user_id").count().collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getLong(1).toString -> r.getLong(2)).toMap
      }
    freq.foreach { case (g, m) => assertMgBounds(m, exact(g), k) }
  }

  test("frequentItems: merge path (many partitions) keeps the bounds") {
    tables()
    val ev = spark.table("events").repartition(32)
    val k = 8
    val freq = Sketches.frequentItems(ev, Seq("event_type"), "user_id", k)
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    val exact = spark.table("events").groupBy("event_type", "user_id").count().collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getLong(1).toString -> r.getLong(2)).toMap
      }
    freq.foreach { case (g, m) => assertMgBounds(m, exact(g), k) }
  }

  test("frequentItems: uniform high-cardinality input may sketch empty — still valid") {
    val sq = spark
    import sq.implicits._
    // 2000 distinct singletons, k=4, 16-way merge: every counter can die in
    // the decrement/subtract steps. An empty (or tiny) map is VALID MG
    // output here — no item's true count exceeds n/(k+1) = 400 — and the
    // bound contract must hold vacuously rather than crash or overstate.
    val df = (1 to 2000).map(i => s"u$i").toDF("v")
      .repartition(16).withColumn("g", lit("all"))
    val freq = Sketches.frequentItems(df, Seq("g"), "v", k = 4)
      .collect().head.getMap[String, Long](1).toMap
    assert(freq.size <= 4)
    freq.values.foreach(est => assert(est >= 1L && est <= 1L))
  }

  test("frequentItems: a dominant key always surfaces, even with k=2") {
    val sq = spark
    import sq.implicits._
    // 500 copies of "hot" drowned in 900 singletons: true count 500 >
    // n/(k+1) = 1400/3, so MG with k=2 MUST keep it
    val rows = Seq.fill(500)("hot") ++ (1 to 900).map(i => s"cold_$i")
    val df = rows.toDF("v").repartition(16).withColumn("g", lit("all"))
    val freq = Sketches.frequentItems(df, Seq("g"), "v", k = 2)
      .collect().head.getMap[String, Long](1).toMap
    assert(freq.contains("hot"), s"dominant key missing from $freq")
    assert(freq("hot") <= 500L)
  }
}
