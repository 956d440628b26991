package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)
case class Click(user_id: Long, click_ts: Timestamp, ad: String)
case class Purchase(user_id: Long, buy_ts: Timestamp, amount: Double)

class StreamingSpec extends SparkSpec {

  private def fixtureEvents() = { tables(); spark.table("events") }

  test("streaming tumble over MemoryStream equals batch groupBy on same data") {
    val sq = spark
    import sq.implicits._
    val batchRows = fixtureEvents()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[Ev].collect().toSeq

    val input = MemoryStream[Ev](spark)
    input.addData(batchRows) // before start(): AvailableNow snapshots offsets
    val query = StreamingOps.tumble(input.toDF(), "ts", "event_type", "6 hours")
      .writeStream.format("memory").queryName("tumble_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    query.processAllAvailable()
    query.stop()

    val streamed = canon(spark.table("tumble_out")
      .select(col("wstart").cast("long").as("w"), col("event_type"), col("c"),
        round(col("sv"), 2).as("sv"))
      .orderBy("w", "event_type"))
    val batch = canon(fixtureEvents()
      .groupBy(window(col("ts"), "6 hours").getField("start").cast("long").as("w"),
        col("event_type"))
      .agg(count("*").as("c"), round(sum("value"), 2).as("sv"))
      .orderBy("w", "event_type"))
    assert(streamed === batch)
  }

  test("streaming top-k per group: graft_topk_by holds incremental state in complete mode") {
    val sq = spark
    import sq.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    val batchRows = fixtureEvents()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[Ev].collect().toSeq

    // TypedImperativeAggregate buffers serialize into the state store, so
    // the bounded heap works as a streaming aggregate unchanged
    val input = MemoryStream[Ev](spark)
    input.addData(batchRows)
    val item = concat(col("user_id").cast("string"), lit("#"),
      col("ts").cast("long").cast("string"))
    val query = input.toDF().groupBy("event_type")
      .agg(call_function("graft_topk_by", col("value"), item, lit(5)).as("arr"))
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    query.processAllAvailable()
    query.stop()

    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] = canon(
      df.select(col("event_type"), posexplode(col("arr")))
        .select(col("event_type"), col("pos"), round(col("col.ord"), 4).as("v"),
          col("col.item").as("item"))
        .orderBy("event_type", "pos"))
    val streamed = shape(spark.table("topk_out"))
    val batch = shape(fixtureEvents().groupBy("event_type")
      .agg(call_function("graft_topk_by", col("value"), item, lit(5)).as("arr")))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming theta sketch: distinct users accumulate across micro-batches") {
    val sq = spark
    import sq.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    val batchRows = fixtureEvents()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[Ev].collect().toSeq
    val (wave1, wave2) = batchRows.splitAt(batchRows.size / 2)

    // the Union buffer serializes into the state store like any
    // TypedImperativeAggregate, so the mergeable distinct sketch is a
    // streaming aggregate unchanged — two waves, state carries across
    val input = MemoryStream[Ev](spark)
    val query = input.toDF().groupBy("event_type")
      .agg(call_function("graft_theta_agg", col("user_id"), lit(12)).as("theta"))
      .writeStream.format("memory").queryName("theta_out")
      .outputMode("complete").start()
    input.addData(wave1)
    query.processAllAvailable()
    input.addData(wave2)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("theta_out")
      .select(col("event_type"),
        graft.functions.Sketches.thetaEstimate(col("theta")).cast("long").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = fixtureEvents().groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fixture cardinalities sit far below the lgK=12 nominal, so the
    // sketch is in exact mode: streamed estimates EQUAL the exact counts
    assert(streamed === exact)
    assert(streamed.nonEmpty)
  }

  test("anomalies: EWMA z-score flags span micro-batches and equal the batch run") {
    val sq = spark
    import sq.implicits._
    // stable baseline around 10 with two gross outliers after warmup
    val pts = (1 to 30).map { i =>
      val v = if (i == 20) 100.0 else if (i == 26) -80.0 else 10.0 + (i % 3) * 0.1
      RatePoint("m1", i.toLong, v)
    } ++ (1 to 12).map(i => RatePoint("m2", i.toLong, 5.0)) // constant: never flags

    val input = MemoryStream[RatePoint](spark)
    val query = StreamingOps.anomalies(input.toDS())
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    // two micro-batches: state must carry mean/var across the boundary
    input.addData(pts.filter(_.epoch <= 15))
    query.processAllAvailable()
    input.addData(pts.filter(_.epoch > 15))
    query.processAllAvailable()
    query.stop()

    val streamed = canon(spark.table("anom_out")
      .select(col("metric"), col("epoch"), col("value"), round(col("zscore"), 4).as("zs"))
      .orderBy("metric", "epoch"))
    val batch = canon(StreamingOps.anomalies(pts.toDS()).toDF()
      .select(col("metric"), col("epoch"), col("value"), round(col("zscore"), 4).as("zs"))
      .orderBy("metric", "epoch"))
    assert(streamed === batch)
    val flagged = spark.table("anom_out").select("epoch").as[Long].collect().toSet
    assert(flagged === Set(20L, 26L), s"expected exactly the two outliers, got $flagged")
  }

  test("streaming funnel: hits span micro-batches and equal both batch oracles") {
    val sq = spark
    import sq.implicits._
    // the REAL event fixture, mapped to funnel points — cross-batch split
    // at the median epoch preserves epoch order (the replay property)
    val pts = fixtureEvents()
      .select(col("user_id").as("user"), col("event_type").as("step"),
        col("ts").cast("double").as("epoch"))
      .as[FunnelPoint].collect().toSeq.sortBy(_.epoch)
    val steps = Seq("view", "click", "purchase")
    val mid = pts(pts.size / 2).epoch

    val input = MemoryStream[FunnelPoint](spark)
    val query = StreamingOps.funnelSteps(input.toDS(), steps, 86400.0)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    input.addData(pts.filter(_.epoch <= mid))
    query.processAllAvailable()
    input.addData(pts.filter(_.epoch > mid))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("funnel_out")
      .collect().map { case org.apache.spark.sql.Row(u: Long, s: Int, e: Double) => (u, s, e) }
      .toSet
    // oracle 1: the same operator in batch mode (empty initial state)
    val batch = StreamingOps.funnelSteps(pts.toDS(), steps, 86400.0)
      .collect().map(h => (h.user, h.stage, h.epoch)).toSet
    assert(streamed === batch)
    // oracle 2: the window-based batch operator's per-user step times
    val winTimes = graft.operators.Funnel.stepTimes(
        pts.toDF("user", "step", "epoch").withColumn("ts", col("epoch")),
        "user", "step", "ts", steps, 86400L)
      .collect().flatMap { r =>
        val u = r.getLong(0)
        (1 to steps.size).flatMap(i =>
          if (r.isNullAt(i)) None else Some((u, i, r.getDouble(i))))
      }.toSet
    assert(streamed === winTimes)
    assert(streamed.nonEmpty && streamed.exists(_._2 == 3),
      "fixture must drive at least one full-funnel completion")

    // idle-timeout variant: identical hits when nothing actually idles out
    // within the run (the eviction knob must not perturb live semantics).
    // Cannot processAllAvailable under ProcessingTimeTimeout (timeout
    // batches keep the query busy) — poll the sink, counterToRate-style.
    val input2 = MemoryStream[FunnelPoint](spark)
    val q2 = StreamingOps.funnelSteps(input2.toDS(), steps, 86400.0,
        idleTimeout = Some("1 hour"))
      .writeStream.format("memory").queryName("funnel_out_idle")
      .outputMode("append").start()
    input2.addData(pts)
    def idleRows() = spark.table("funnel_out_idle")
      .collect().map { case org.apache.spark.sql.Row(u: Long, s2: Int, e: Double) => (u, s2, e) }
      .toSet
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (idleRows().size < batch.size && System.nanoTime() < deadline)
      Thread.sleep(200)
    q2.stop()
    assert(idleRows() === batch)
  }

  test("holt-winters forecast: state spans micro-batches, equals batch run and reference fold") {
    val sq = spark
    import sq.implicits._
    // two metrics with a period-4 seasonal pattern plus drift
    val pts = (for {
      m <- Seq("m1", "m2"); i <- 1 to 40
    } yield RatePoint(m, i.toLong,
      (if (m == "m1") 10.0 else 50.0) + i * 0.5 + Seq(3.0, -1.0, -2.0, 0.0)(i % 4)))

    val input = MemoryStream[RatePoint](spark)
    val query = StreamingOps.holtWintersForecast(input.toDS())
      .writeStream.format("memory").queryName("hw_out")
      .outputMode("append").start()
    input.addData(pts.filter(_.epoch <= 20))
    query.processAllAvailable()
    input.addData(pts.filter(_.epoch > 20))
    query.processAllAvailable()
    query.stop()

    def canonRows(df: org.apache.spark.sql.DataFrame) = canon(
      df.select(col("metric"), col("epoch"), round(col("forecast"), 4).as("f"))
        .orderBy("metric", "epoch"))
    val streamed = canonRows(spark.table("hw_out"))
    val batch = canonRows(StreamingOps.holtWintersForecast(pts.toDS()).toDF())
    assert(streamed === batch)

    // reference sequential fold for m1
    var st = Array(pts.find(_.metric == "m1").get.value, 0.0, 0.0, 0.0, 0.0, 0.0)
    val expected = pts.filter(_.metric == "m1").drop(1).map { p =>
      val f = st(0) + st(1) + st(2)
      val l2 = 0.3 * (p.value - st(2)) + 0.7 * (st(0) + st(1))
      val s2 = 0.3 * (p.value - l2) + 0.7 * st(2)
      st = Array(l2, 0.2 * (l2 - st(0)) + 0.8 * st(1), st(3), st(4), st(5), s2)
      (p.epoch, BigDecimal(f).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = spark.table("hw_out").where(col("metric") === "m1")
      .select(col("epoch"), round(col("forecast"), 4).as("f"))
      .orderBy("epoch").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    // seasonal model must beat the naive level forecast on seasonal data
    val hwErr = spark.table("hw_out").where(col("metric") === "m1" && col("epoch") > 20)
      .select(avg(abs(col("value") - col("forecast")))).head().getDouble(0)
    assert(hwErr < 2.0, s"seasonal forecast error too large: $hwErr")
  }

  test("streaming sessionize: per-user session count equals batch-replay formulation") {
    val sq = spark
    import sq.implicits._
    val batchRows = fixtureEvents()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[Ev].collect().toSeq

    val input = MemoryStream[Ev](spark)
    // session windows emit in append mode once the watermark passes the
    // session end: feed real rows + a far-future sentinel, then a second
    // sentinel batch so the advanced watermark closes every real session
    val query = StreamingOps.sessionize(input.toDF(), "ts", "user_id",
        "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    input.addData(batchRows :+ Ev(Timestamp.valueOf("2030-01-01 00:00:00"), "x", -1L, 0.0))
    query.processAllAvailable()
    input.addData(Seq(Ev(Timestamp.valueOf("2031-01-01 00:00:00"), "x", -2L, 0.0)))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sess_out")
      .filter(col("user_id") >= 0)
      .groupBy("user_id")
      .agg(count("*").as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
    // the declared STREAM-SESSION batch-replay query is the oracle
    val batch = spark.sql(graft.queries.Inventory.byId("STREAM-SESSION").sparkSql)
    assert(canon(streamed) === canon(batch))
  }

  test("demux fans one stream out to csv + carbon forwarders") {
    val sq = spark
    import sq.implicits._
    val dir = Files.createTempDirectory("graft_demux").toString
    val lines = (1 to 100).map(i => s"svc.m$i ${i * 1.5} ${1700000000L + i}")

    val input = MemoryStream[String](spark)
    input.addData(lines) // before start(): AvailableNow snapshots offsets
    val points = graft.ingest.Carbon.ingest(
        input.toDF().withColumnRenamed("value", "line"),
        graft.ingest.Carbon.IdentityDeconstructor)
      .withColumn("epoch", col("ts").cast("long"))
    val writer = StreamingOps.demux(points,
      Seq(StreamingOps.CsvForwarder("csv", s"$dir/csv"),
          StreamingOps.CarbonForwarder("carbon", s"$dir/carbon")),
      Trigger.AvailableNow())
    val query = writer.option("checkpointLocation", s"$dir/ckpt").start()
    query.processAllAvailable()
    query.stop()

    val csvN = spark.read.csv(s"$dir/csv").count()
    val carbonLines = spark.read.text(s"$dir/carbon")
    assert(csvN === 100)
    assert(carbonLines.count() === 100)
    // carbon sink round-trips through the codec
    val back = graft.ingest.Carbon.parseLines(
      carbonLines.withColumnRenamed("value", "line"))
    assert(back.where(col("value").isNotNull).count() === 100)
  }

  test("counterToRate: stateful rate spans micro-batch boundaries") {
    val sq = spark
    import sq.implicits._
    // idleTimeout = None: timeout scheduling keeps an always-on query busy
    // forever, which wedges processAllAvailable — eviction is exercised
    // separately below; the cross-batch state semantics are identical
    val input = MemoryStream[RatePoint](spark)
    val query = StreamingOps.counterToRate(input.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    // batch 1: counter m rises 10 -> 40 over 10s
    input.addData(Seq(RatePoint("m", 100, 10.0), RatePoint("m", 110, 40.0)))
    query.processAllAvailable()
    // batch 2: first point's rate must use batch 1's LAST state (110, 40)
    input.addData(Seq(RatePoint("m", 120, 100.0), RatePoint("n", 10, 5.0)))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("rate_out").as[RateOut].collect()
      .map(r => (r.metric, r.epoch) -> r.rate).toMap
    assert(out === Map(("m", 110L) -> 3.0, ("m", 120L) -> 6.0))
    // "n" has one point and no prior state: no rate emitted yet
  }

  test("counterToRate with idle-timeout eviction produces the same rates") {
    val sq = spark
    import sq.implicits._
    val input = MemoryStream[RatePoint](spark)
    val query = StreamingOps.counterToRate(input.toDS()) // default 1h timeout
      .writeStream.format("memory").queryName("rate_to_out")
      .outputMode("append").start()
    input.addData(Seq(RatePoint("m", 100, 10.0), RatePoint("m", 110, 40.0)))
    // cannot processAllAvailable (timeout batches keep the query busy) —
    // poll the sink instead
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def rows() = spark.table("rate_to_out").as[RateOut].collect()
    while (rows().isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    query.stop()
    val out = rows().map(r => (r.metric, r.epoch) -> r.rate).toMap
    assert(out === Map(("m", 110L) -> 3.0))
  }

  test("dedupWithinWatermark keeps first arrival per key") {
    val sq = spark
    import sq.implicits._
    val input = MemoryStream[Ev](spark)
    input.addData(Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:00:00"), "click", 1L, 1.0),
      Ev(Timestamp.valueOf("2024-01-01 00:00:01"), "click", 1L, 2.0), // dup key
      Ev(Timestamp.valueOf("2024-01-01 00:00:02"), "view", 1L, 3.0)))
    val query = StreamingOps.dedupWithinWatermark(
        input.toDF(), "ts", Seq("user_id", "event_type"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.processAllAvailable()
    query.stop()
    val out = spark.table("dedup_out")
    assert(out.count() === 2)
    assert(out.agg(sum("value")).collect()(0).getDouble(0) === 4.0) // 1.0 + 3.0
  }

  test("watermark drops late data from windowed aggregation (drop-on-overflow mapping)") {
    val sq = spark
    import sq.implicits._
    val input = MemoryStream[Ev](spark)
    val query = StreamingOps.tumble(input.toDF(), "ts", "event_type",
        "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    // batch 1 advances the watermark to 11:30
    input.addData(Seq(Ev(Timestamp.valueOf("2024-01-01 12:00:00"), "click", 1L, 1.0)))
    query.processAllAvailable()
    // batch 2: an event in the long-closed 08:00 window arrives late → dropped
    input.addData(Seq(
      Ev(Timestamp.valueOf("2024-01-01 08:00:00"), "click", 1L, 100.0),
      Ev(Timestamp.valueOf("2024-01-01 12:05:00"), "click", 1L, 2.0)))
    query.processAllAvailable()
    // advance watermark far enough to emit the 12:00 window
    input.addData(Seq(Ev(Timestamp.valueOf("2024-01-01 20:00:00"), "view", 2L, 0.0)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("late_out")
      .select(col("wstart").cast("string"), col("event_type"), col("c"), col("sv"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // the 12:00 click window emitted WITHOUT the late 08:00 event
    assert(rows.contains(("2024-01-01 12:00:00", "click", 2L, 3.0)), rows.mkString(", "))
    assert(!rows.exists(_._1 == "2024-01-01 08:00:00"), "late event was not dropped")
  }

  test("pipeline config parses from JSON (reference-style boot file)") {
    val cfg = Pipeline.fromJson(
      """{"listenFrom": {"kind":"file", "path":"/tmp/in", "codec":"carbon",
        |                "deconstructor":"delimiter", "template":["ns","ep","stat"],
        |                "maxFilesPerTrigger": 8},
        | "forwardTo": [{"kind":"csv", "name":"debug", "dir":"/tmp/csv"},
        |               {"kind":"carbon", "name":"fwd", "dir":"/tmp/carbon"}],
        | "triggerMillis": 250}""".stripMargin)
    assert(cfg.listenFrom.kind === "file" && cfg.listenFrom.path === "/tmp/in")
    assert(cfg.listenFrom.deconstructor
      .isInstanceOf[graft.ingest.Carbon.DelimiterDeconstructor])
    assert(cfg.forwardTo.map(_.kind) === Seq("csv", "carbon"))
    assert(cfg.triggerMillis === 250L)
    assert(cfg.listenFrom.maxFilesPerTrigger === Some(8))
    // defaults fill in
    val minimal = Pipeline.fromJson(
      """{"listenFrom": {"kind":"socket"}, "forwardTo": []}""")
    assert(minimal.listenFrom.port === 2003 && minimal.listenFrom.codec === "carbon")
    assert(minimal.listenFrom.maxFilesPerTrigger === None)
    assert(minimal.triggerMillis === 1000L)
  }

  test("kafka listener: option mapping compiles, sandbox failure is actionable") {
    // the mapping itself (path split, option wiring) runs before load();
    // a malformed path fails fast with the expected shape
    val bad = intercept[IllegalArgumentException] {
      Pipeline.source(spark, Pipeline.ListenFrom("kafka", path = "no-topic-here"))
    }
    assert(bad.getMessage.contains("<bootstrap-servers>/<topic>"))
    // with no connector jar in this sandbox, load() fails — the error must
    // name the missing artifact and the broker-free stand-in
    val e = intercept[IllegalStateException] {
      Pipeline.source(spark,
        Pipeline.ListenFrom("kafka", path = "broker1:9092,broker2:9092/points",
          maxFilesPerTrigger = Some(30000)))
    }
    assert(e.getMessage.contains("spark-sql-kafka-0-10"))
    assert(e.getMessage.contains("partitioned"))
  }

  test("pipeline with collectd codec: JSON-lines file listener to csv sink") {
    val dir = Files.createTempDirectory("graft_collectd").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val body =
      """[{"values":[0.5],"dstypes":["gauge"],"dsnames":["value"],"time":1700000100.0,
        |"interval":10.0,"host":"web1","plugin":"cpu","plugin_instance":"0",
        |"type":"percent","type_instance":"user"}]""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.json"),
      (1 to 5).map(_ => body).mkString("\n").getBytes)

    val cfg = Pipeline.GraftConfig(
      listenFrom = Pipeline.ListenFrom("file", path = s"$dir/in", codec = "collectd"),
      forwardTo = Seq(Pipeline.ForwardTo("csv", "debug", s"$dir/csv")))
    val q = Pipeline.assemble(spark, cfg)
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.read.csv(s"$dir/csv")
    assert(out.count() === 5)
    // metric name is first CSV column; dims JSON-encoded alongside
    assert(out.collect().forall(_.getString(0) === "cpu.0.percent.user"))
  }

  test("typed ingest yields Dataset[Datapoint] and drops malformed lines") {
    val sq = spark
    import sq.implicits._
    val lines = Seq("svc.a 1.5 1700000000", "garbage", "svc.b x y").toDF("line")
    val ds = graft.ingest.Carbon.ingestTyped(lines, graft.ingest.Carbon.IdentityDeconstructor)
    val pts = ds.collect()
    assert(pts.length === 1)
    assert(pts(0).metric === "svc.a" && pts(0).value === 1.5)
    // typed lambda over the Dataset — compile-time field access
    assert(ds.map(_.metric.toUpperCase).collect().toSeq === Seq("SVC.A"))
  }

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("stream-stream interval join: purchases attribute to clicks within 10 minutes") {
    val sq = spark
    import sq.implicits._
    val clicks = MemoryStream[Click](spark)
    val buys = MemoryStream[Purchase](spark)
    val joined = StreamingOps.intervalJoin(
      buys.toDF(), clicks.toDF(), keyCol = "user_id",
      leftTsCol = "buy_ts", rightTsCol = "click_ts", maxDelay = "10 minutes",
      leftWatermark = "1 minute", rightWatermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    clicks.addData(
      Click(1L, t(0), "adA"),   // matched at +5
      Click(2L, t(0), "adB"),   // matched twice (user 2 buys at +5 via both clicks)
      Click(2L, t(4), "adC"),
      Click(3L, t(0), "adD"))   // user 3 never buys
    buys.addData(
      Purchase(1L, t(5), 9.99),   // within 10m of adA
      Purchase(1L, t(20), 5.00),  // 20m after the only user-1 click: no match
      Purchase(2L, t(5), 7.50),   // within 10m of adB AND adC
      Purchase(4L, t(5), 1.00))   // no click at all
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attrib_out")
      .select(col("user_id"), col("buy_ts").cast("long").as("bt"), col("ad"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set(
      (1L, 1700000300L, "adA"),
      (2L, 1700000300L, "adB"),
      (2L, 1700000300L, "adC")))
  }

  test("stream-stream interval join: leftOuter emits unmatched rows after watermark passes") {
    val sq = spark
    import sq.implicits._
    val clicks = MemoryStream[Click](spark)
    val buys = MemoryStream[Purchase](spark)
    val joined = StreamingOps.intervalJoin(
      buys.toDF(), clicks.toDF(), keyCol = "user_id",
      leftTsCol = "buy_ts", rightTsCol = "click_ts", maxDelay = "10 minutes",
      leftWatermark = "1 minute", rightWatermark = "1 minute",
      joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    clicks.addData(Click(1L, t(0), "adA"))
    buys.addData(Purchase(1L, t(5), 9.99), Purchase(4L, t(5), 1.00))
    q.processAllAvailable()
    // outer results emit only once the watermark proves no match can still
    // arrive — push both watermarks far past the eligibility window
    clicks.addData(Click(99L, t(600), "sentinel"))
    buys.addData(Purchase(99L, t(600), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attrib_outer")
      .filter(col("user_id") =!= 99L)
      .select(col("user_id"), col("ad"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(out === Set((1L, Some("adA")), (4L, None)))
  }

  test("withCounters observes point counts without a second aggregation") {
    val sq = spark
    import sq.implicits._
    val df = Seq(("a.b", 1.0, 1L), ("c.d", 2.0, 2L)).toDF("metric", "value", "epoch")
    // observe() on batch DataFrames: metrics delivered on action
    val observed = StreamingOps.withCounters(df)
    assert(observed.count() === 2)
  }

  test("streaming as-of: cross-batch state equals batch mode and the window operator") {
    val sq = spark
    import sq.implicits._
    val ev = fixtureEvents()
    val pts = ev.where(col("event_type").isin("click", "purchase"))
      .select(col("user_id").as("key"), col("ts").cast("double").as("epoch"),
        when(col("event_type") === "click", 0).otherwise(1).as("side"),
        col("event_id").as("id"))
      .as[AsOfPoint].collect().toSeq.sortBy(_.epoch)
    val mid = pts(pts.size / 2).epoch

    val input = MemoryStream[AsOfPoint](spark)
    val query = StreamingOps.asOfLastBefore(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    input.addData(pts.filter(_.epoch <= mid))
    query.processAllAvailable()
    input.addData(pts.filter(_.epoch > mid))
    query.processAllAvailable()
    query.stop()

    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getLong(0) -> (if (r.getBoolean(4)) Some(r.getDouble(3)) else None)
    }.toMap
    val streamed = asMap(spark.table("asof_out").collect())
    // oracle 1: the same operator in batch mode (empty initial state)
    val batch = asMap(StreamingOps.asOfLastBefore(pts.toDS()).toDF().collect())
    assert(streamed === batch)
    // oracle 2: the batch window operator on the same split streams
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").cast("double").as("ts"))
    val buys = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("double").as("ts"), col("event_id"))
    val win = graft.operators.AsOfJoin
      .lastBefore(clicks, buys, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(streamed === win)
    assert(streamed.nonEmpty && streamed.values.exists(_.isDefined))
  }

  test("approxDistinctByWindow: sketch state spans batches; exact below 2^lgK") {
    val sq = spark
    import sq.implicits._
    // real fixture: distinct users per (event_type, 6h window); every key
    // has far fewer than 2^12 users, so theta runs in exact mode and the
    // streaming estimate must EQUAL the exact distinct count
    val pts = fixtureEvents()
      .select(col("event_type").as("metric"),
        (floor(col("ts").cast("long") / 21600) * 21600).cast("long").as("window"),
        col("user_id").as("item"))
      .as[DistinctPoint].collect().toSeq.sortBy(p => (p.window, p.item))
    val mid = pts(pts.size / 2).window

    val input = MemoryStream[DistinctPoint](spark)
    val query = StreamingOps.approxDistinctByWindow(input.toDS())
      .writeStream.format("memory").queryName("adist_out")
      .outputMode("append").start()
    input.addData(pts.filter(_.window <= mid))
    query.processAllAvailable()
    input.addData(pts.filter(_.window > mid))
    query.processAllAvailable()
    query.stop()

    // running-estimate contract: keep the LAST emission per key
    val streamed = spark.table("adist_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("metric", "window")
          .orderBy(monotonically_increasing_id().desc)))
      .where(col("rn") === 1)
      .select(col("metric"), col("window"), col("estimate").cast("long").as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = fixtureEvents()
      .groupBy(col("event_type").as("metric"),
        (floor(col("ts").cast("long") / 21600) * 21600).cast("long").as("window"))
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === exact)
    // and the batch-mode run of the SAME operator agrees
    val batch = StreamingOps.approxDistinctByWindow(pts.toDS()).toDF()
      .select(col("metric"), col("window"), col("estimate").cast("long").as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batch === exact)
  }

  test("scd2Changes: ticks settle max-id-wins; two-batch == batch == Cdc.scd2 versions") {
    val sq = spark
    import sq.implicits._
    val pts = fixtureEvents().where(col("user_id") < 30)
      .select(col("user_id").as("key"), col("ts").cast("long").as("epoch"),
        col("event_id").as("id"),
        floor(col("value") / 100).cast("int").as("state"))
      .as[Scd2Point].collect().toSeq.sortBy(p => (p.epoch, p.id))
    val mid = pts(pts.size / 2).epoch

    val input = MemoryStream[Scd2Point](spark)
    val query = StreamingOps.scd2Changes(input.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    // split at a tick boundary (the documented in-tick atomicity contract)
    input.addData(pts.filter(_.epoch <= mid))
    query.processAllAvailable()
    input.addData(pts.filter(_.epoch > mid))
    query.processAllAvailable()
    query.stop()

    def canonChg(df: org.apache.spark.sql.DataFrame) = df
      .select("key", "validFrom", "state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = canonChg(spark.table("scd2_out"))
    val batch = canonChg(StreamingOps.scd2Changes(pts.toDS()).toDF())
    assert(streamed === batch)

    // and both equal the batch operator's version-open rows
    val log = fixtureEvents().where(col("user_id") < 30)
      .select(col("user_id"), col("ts").cast("long").as("et"), col("event_id"),
        floor(col("value") / 100).cast("int").as("state"))
    val hist = graft.operators.Cdc.scd2(log, "user_id", "et", "event_id", Seq("state"))
      .select("user_id", "valid_from", "state")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch === hist)

    // a tick whose intermediate write differs must not leak a version
    val tricky = Seq(Scd2Point(9L, 1L, 1L, 7), Scd2Point(9L, 5L, 2L, 9),
      Scd2Point(9L, 5L, 3L, 7)).toDS()
    val tOut = StreamingOps.scd2Changes(tricky).collect().toSeq
    assert(tOut === Seq(Scd2Change(9L, 1L, 7)),
      "the settled tick state equals the prior state — no version opens")
  }

  test("cusum: two doubles of state per key; two-batch == batch == window closed form") {
    val sq = spark
    import sq.implicits._
    val pts = fixtureEvents().where(col("user_id") < 20)
      .select(col("user_id").as("key"), col("ts").cast("long").as("epoch"),
        col("event_id").as("id"), col("value"),
        avg(col("value")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")).as("ref"))
      .as[CusumPoint].collect().toSeq.sortBy(p => (p.epoch, p.id))
    val mid = pts(pts.size / 2).epoch

    val input = MemoryStream[CusumPoint](spark)
    val query = StreamingOps.cusum(input.toDS())
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    input.addData(pts.filter(_.epoch <= mid))
    query.processAllAvailable()
    input.addData(pts.filter(_.epoch > mid))
    query.processAllAvailable()
    query.stop()

    def canonOut(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"), col("id"), round(col("cusum"), 6).as("s"), col("alarm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    val streamed = canonOut(spark.table("cusum_out"))
    val batch = canonOut(StreamingOps.cusum(pts.toDS()).toDF())
    assert(streamed === batch)

    // the window closed form (the TS-CUSUM plan) on the same frame
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("epoch"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val c = pts.toDF().withColumn("cm", sum(col("value") - col("ref") - 5.0).over(run))
    val score = col("cm") - least(lit(0.0), min(col("cm")).over(run))
    val win = c.select(col("key"), col("id"), round(score, 6).as("s"),
        (score > 500.0).as("alarm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(batch === win)
  }

  test("alertFor: runs spanning batches emit exactly once, on closure") {
    val sq = spark
    import sq.implicits._
    import graft.streaming.{AlertPoint, AlertOut}
    // planted series: run A (closed, qualifies), run B spans the batch
    // boundary (closed in batch 2), trailing run C stays OPEN (no emit)
    val pts = Seq(
      AlertPoint("m", 0L, 1, 150.0), AlertPoint("m", 700L, 2, 160.0),   // A
      AlertPoint("m", 800L, 3, 50.0),                                   // closes A
      AlertPoint("m", 900L, 4, 170.0),                                  // B opens
      AlertPoint("m", 1700L, 5, 180.0),                                 // B grows (batch 2)
      AlertPoint("m", 1800L, 6, 10.0),                                  // closes B
      AlertPoint("m", 1900L, 7, 190.0), AlertPoint("m", 2600L, 8, 195.0)) // C open
    val input = MemoryStream[AlertPoint](spark)
    val query = StreamingOps.alertFor(input.toDS(), 100.0, 2L, 600L)
      .writeStream.format("memory").queryName("alert_out")
      .outputMode("append").start()
    input.addData(pts.take(4))
    query.processAllAvailable()
    input.addData(pts.drop(4))
    query.processAllAvailable()
    query.stop()
    def runsOf(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val streamed = runsOf(spark.table("alert_out"))
    assert(streamed === Set(("m", 0L, 700L, 2L, 700L),
      ("m", 900L, 1700L, 2L, 800L)),
      s"A and the batch-spanning B fire once each, C stays open: $streamed")
    // batch mode on the full data equals the two-batch stream
    val batch = runsOf(StreamingOps.alertFor(pts.toDS(), 100.0, 2L, 600L).toDF())
    assert(batch === streamed)
    // sub-minimum and sub-hold runs never fire
    val weak = Seq(AlertPoint("w", 0L, 1, 150.0), AlertPoint("w", 100L, 2, 160.0),
      AlertPoint("w", 200L, 3, 10.0), AlertPoint("w", 300L, 4, 170.0),
      AlertPoint("w", 400L, 5, 10.0))
    assert(StreamingOps.alertFor(weak.toDS(), 100.0, 2L, 600L).count() === 0)
  }

  test("topkByWindow: exact under m distinct; heavy hitter survives past m; slicing-stable") {
    val sq = spark
    import sq.implicits._
    import graft.streaming.{TopkPoint, TopkOut}
    // exact regime: 10 distinct items, skewed counts
    val pts = (1 to 300).map { i =>
      val item = if (i % 3 == 0) "hot" else s"u${i % 9}"
      TopkPoint("m", 0L, item)
    }
    val input = MemoryStream[TopkPoint](spark)
    val query = StreamingOps.topkByWindow(input.toDS(), k = 3, m = 64)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    input.addData(pts.take(150))
    query.processAllAvailable()
    input.addData(pts.drop(150))
    query.processAllAvailable()
    query.stop()
    // Append re-emits per batch: keep the FINAL set (max cnt per item rank)
    val last = spark.table("topk_out")
      .groupBy("item").agg(max("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(last.head === ("hot", 100L), s"exact hot count expected: $last")
    // batch mode equals the final streamed state in the exact regime
    val batch = StreamingOps.topkByWindow(pts.toDS(), k = 3, m = 64)
      .collect().map(o => (o.item, o.cnt, o.rnk)).toSeq
    assert(batch.head === (("hot", 100L, 1)))
    // past-m regime: 200 distinct items, m=16 — counts are estimates but
    // the 5x heavy hitter must survive the decrements at rank 1
    val skew = (1 to 2000).map { i =>
      TopkPoint("s", 0L, if (i % 5 == 0) "dominant" else s"tail${i % 199}")
    }
    val sk = StreamingOps.topkByWindow(skew.toDS(), k = 1, m = 16)
      .collect()
    assert(sk.head.item === "dominant",
      s"MG must keep the heavy hitter, got ${sk.head}")
  }
}
