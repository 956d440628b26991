package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.storage.dsv2.SnapshotScan

class SnapshotDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapdsv2").toString + "/t"

  private def snapshotScan(df: DataFrame): SnapshotScan = {
    df.collect() // force planning through AQE
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    } ++ df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case b: BatchScanExec => b.scan }
    }.flatten
    scans.collectFirst { case s: SnapshotScan => s }
      .getOrElse(fail(s"no SnapshotScan in plan:\n${df.queryExecution.executedPlan}"))
  }

  test("format(graft-snapshot) round-trips the full supported type surface") {
    val root = newRoot()
    val base = spark.range(100).select(
      col("id").as("k"),
      concat(lit("s"), col("id")).as("s"),
      (col("id") * 1.5).as("x"),
      col("id").cast("float").as("xf"),
      (col("id") % 2 === 0).as("b"),
      col("id").cast("int").as("i"),
      col("id").cast("decimal(12,2)").as("dec"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      to_date(timestamp_micros(col("id") * 86400L * 1000000L)).as("d"),
      array(col("id"), col("id") + 1).as("arr"),
      map(lit("host"), concat(lit("h"), col("id") % 3)).as("dims"),
      col("id").cast("string").cast("binary").as("raw"),
      lit(1L).as("v"))
    SnapshotTable.create(spark, root, base)
    val got = spark.read.format("graft-snapshot").load(root)
    assert(got.schema === SnapshotTable.read(spark, root).schema)
    // hex the binary column: Array[Byte] compares by reference in canon
    def h(df: DataFrame) = df.withColumn("raw", hex(col("raw"))).orderBy("k")
    assert(canon(h(got)) === canon(h(SnapshotTable.read(spark, root))))
    // map column round-trips (canon flattens maps poorly — check directly)
    assert(got.select(element_at(col("dims"), "host")).where(col("k") === 4)
      .head.getString(0) === "h1")
    // count(*) exercises the empty-projection path
    assert(got.count() === 100)
  }

  test("nulls and extreme values round-trip; connector read == Spark's own reader") {
    val root = newRoot()
    val sq = spark; import sq.implicits._
    val base = Seq(
      (0L, Some("s"), Some(1.5), Some(2.5f), Some(true), Some(7),
        Some(Seq(1L, 2L)), Some(Map("a" -> "b"))),
      (1L, None, Some(Double.NaN), Some(Float.NegativeInfinity), Some(false), None,
        Some(Seq.empty[Long]), Some(Map.empty[String, String])),
      (2L, Some(""), Some(Double.MaxValue), None, None, Some(Int.MinValue),
        None, None),
      (3L, Some("√ünicode✓"), Some(Double.MinPositiveValue),
        Some(Float.PositiveInfinity), Some(true), Some(Int.MaxValue),
        Some(Seq(Long.MinValue, Long.MaxValue)), Some(Map("" -> ""))))
      .toDF("k", "s", "d", "f", "b", "i", "arr", "m")
    base.repartition(2).write.format("graft-snapshot").mode("append").save(root)
    val files = SnapshotTable.latest(spark, root).get.files
    val viaConnector = canon(
      spark.read.format("graft-snapshot").load(root).orderBy("k"))
    val viaSpark = canon(
      spark.read.parquet(files: _*).select("k", "s", "d", "f", "b", "i", "arr", "m")
        .orderBy("k"))
    assert(viaConnector === viaSpark)
    // and both match the source frame
    assert(viaConnector === canon(base.orderBy("k")))
  }

  test("versionAsOf time travel reads a pinned older snapshot") {
    val root = newRoot()
    SnapshotTable.create(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"))
    SnapshotTable.merge(spark, root,
      Seq((2L, "B", 2L), (3L, "c", 2L)).toDF("k", "s", "v"), Seq("k"), "v")
    val v1 = spark.read.format("graft-snapshot").option("versionAsOf", 1).load(root)
    assert(v1.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    val latest = spark.read.format("graft-snapshot").load(root)
    assert(latest.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("an ORDINARY pushed predicate prunes files through the stats sidecar") {
    val root = newRoot()
    val base = spark.range(8000).select(col("id").as("k"),
      (col("id") % 97).as("v"), lit(1L).as("ver"))
      .repartitionByRange(8, col("k"))
    SnapshotTable.create(spark, root, base, statsCols = Seq("k"))
    val df = spark.read.format("graft-snapshot").load(root)
      .where(col("k") >= 1000 && col("k") <= 1999)
    val scan = snapshotScan(df)
    assert(scan.totalFileCount === 8)
    assert(scan.plannedFiles.size < 8,
      s"expected file skipping, planned ${scan.plannedFiles.size}/8")
    assert(scan.description().contains(s"files=${scan.plannedFiles.size}/8"))
    // exactness: pruned scan returns precisely the filtered rows
    assert(df.count() === 1000)
    assert(df.agg(sum("k")).head.getLong(0) ===
      (1000L to 1999L).sum)
    // an out-of-domain band prunes every file yet stays correct
    val none = spark.read.format("graft-snapshot").load(root)
      .where(col("k") > 50000)
    assert(snapshotScan(none).plannedFiles.isEmpty)
    assert(none.count() === 0)
  }

  test("column pruning reaches the parquet projection") {
    val root = newRoot()
    SnapshotTable.create(spark, root, spark.range(10).select(
      col("id").as("k"), lit("pad").as("s1"), lit("pad").as("s2"),
      (col("id") * 2).as("x"), lit(1L).as("v")))
    val df = spark.read.format("graft-snapshot").load(root).select("k", "x")
    val scan = snapshotScan(df)
    assert(scan.readSchema().fieldNames.toSeq === Seq("k", "x"))
    assert(df.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      (0L until 10L).map(i => (i, i * 2)))
  }

  test("df.write.format(graft-snapshot) creates, appends, and overwrites") {
    val root = newRoot()
    val d1 = spark.range(100).select(col("id").as("k"),
      concat(lit("s"), col("id")).as("s"), lit(1L).as("v"))
    // first ever write CREATES the table (v1); DSv2 sources accept only
    // Append/Overwrite modes, and an append to an empty root is a create
    d1.write.format("graft-snapshot").mode("append").save(root)
    assert(SnapshotTable.versions(spark, root) === Seq(1L))
    assert(spark.read.format("graft-snapshot").load(root).count() === 100)
    // append = O(batch) metadata commit (v2), old files untouched
    val v1Files = SnapshotTable.latest(spark, root).get.files.toSet
    spark.range(100, 150).select(col("id").as("k"),
        concat(lit("s"), col("id")).as("s"), lit(2L).as("v"))
      .write.format("graft-snapshot").mode("append").save(root)
    val v2 = SnapshotTable.latest(spark, root).get
    assert(v2.version === 2L && v1Files.subsetOf(v2.files.toSet))
    val got = spark.read.format("graft-snapshot").load(root)
    assert(got.count() === 150)
    assert(got.agg(sum("k")).head.getLong(0) === (0L until 150L).sum)
    // written files round-trip through SPARK'S OWN reader too (the
    // writer emits standard parquet, not a private encoding)
    assert(spark.read.parquet(v2.files.filterNot(v1Files): _*).count() === 50)
    // overwrite = truncate-and-replace (v3); v2 still time-travels
    spark.range(10).select(col("id").as("k"), lit("ow").as("s"), lit(3L).as("v"))
      .write.format("graft-snapshot").mode("overwrite").save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() === 10)
    assert(spark.read.format("graft-snapshot").option("versionAsOf", 2)
      .load(root).count() === 150)
  }

  test("DSv2-write statsCols option keeps pushed-filter pruning alive") {
    val root = newRoot()
    spark.range(8000).select(col("id").as("k"), (col("id") % 97).as("x"), lit(1L).as("v"))
      .repartitionByRange(8, col("k"))
      .write.format("graft-snapshot").option("statsCols", "k")
      .mode("append").save(root)
    val df = spark.read.format("graft-snapshot").load(root)
      .where(col("k").between(1000, 1999))
    val scan = snapshotScan(df)
    assert(scan.totalFileCount === 8 && scan.plannedFiles.size < 8)
    assert(df.count() === 1000)
  }

  test("DSv2 add-column evolution: option mergeSchema widens, reader null-fills") {
    val root = newRoot()
    spark.range(50).select(col("id").as("k"), lit("old").as("s"), lit(1L).as("v"))
      .write.format("graft-snapshot").mode("append").save(root)
    // differing columns without the option: refused
    intercept[Exception] {
      spark.range(50, 60).select(col("id").as("k"), lit("new").as("s"),
          lit(2L).as("v"), (col("id") * 2.0).as("score"))
        .write.format("graft-snapshot").mode("append").save(root)
    }
    spark.range(50, 60).select(col("id").as("k"), lit("new").as("s"),
        lit(2L).as("v"), (col("id") * 2.0).as("score"))
      .write.format("graft-snapshot").option("mergeSchema", "true")
      .mode("append").save(root)
    val got = spark.read.format("graft-snapshot").load(root)
    assert(got.columns.toSeq === Seq("k", "s", "v", "score"))
    assert(got.count() === 60)
    // old files' rows read null for the evolved column
    assert(got.where(col("score").isNull).count() === 50)
    assert(got.where(col("score") === 110.0).count() === 1)
    // pushed predicate on the EVOLVED column: older files predate it —
    // the reader must not hand parquet a predicate on a missing column
    assert(got.where(col("score") >= 110.0).count() === 5)
    // count(*) and pruning still fine on the shared column
    assert(got.where(col("k") < 10).count() === 10)
  }

  test("pushed equality on a non-double-representable long is exact (2^53+1)") {
    val root = newRoot()
    val big = 9007199254740993L // 2^53 + 1: doubleValue() rounds to 2^53
    Seq((big, "hit"), (big - 1, "edge"), (1L, "small"))
      .toDF("k", "s")
      .write.format("graft-snapshot").mode("append").save(root)
    val got = spark.read.format("graft-snapshot").load(root)
    // the record-level parquet filter must NOT drop the true row: its
    // bounds are ulp-widened, Spark's residual does the exact cut
    assert(got.where(col("k") === big).collect().map(_.getString(1)).toSeq ===
      Seq("hit"))
    assert(got.where(col("k") >= big).count() === 1)
    assert(got.where(col("k") <= big - 1 && col("k") > 1000).count() === 1)
  }

  test("overwrite with an empty frame is TRUNCATE, not a silent no-op") {
    val root = newRoot()
    spark.range(10).select(col("id").as("k"), lit("x").as("s"))
      .write.format("graft-snapshot").mode("append").save(root)
    spark.range(0).select(col("id").as("k"), lit("x").as("s"))
      .write.format("graft-snapshot").mode("overwrite").save(root)
    val got = spark.read.format("graft-snapshot").load(root)
    assert(got.count() === 0)
    assert(got.columns.toSeq === Seq("k", "s")) // schema survives truncation
    // the pre-truncate version still time-travels
    assert(spark.read.format("graft-snapshot").option("versionAsOf", 1)
      .load(root).count() === 10)
    // an empty APPEND stays a no-op (no pointless version)
    spark.range(0).select(col("id").as("k"), lit("x").as("s"))
      .write.format("graft-snapshot").mode("append").save(root)
    assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
    // and the truncated table accepts new appends
    spark.range(3).select(col("id").as("k"), lit("y").as("s"))
      .write.format("graft-snapshot").mode("append").save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() === 3)
  }

  test("bare count(*) answers from footers only; filtered counts stay exact") {
    val root = newRoot()
    spark.range(12345).select(col("id").as("k"), lit("x").as("s"))
      .repartition(4)
      .write.format("graft-snapshot").mode("append").save(root)
    val df = spark.read.format("graft-snapshot").load(root)
    assert(df.count() === 12345)
    // the manifest itself carries the per-file counts (O(1) count(*))
    assert(SnapshotTable.latest(spark, root).get.rowCount === Some(12345L))
    // the plan must carry the metadata-count scan, not a row scan
    val counted = df.groupBy().count()
    counted.collect()
    val scans = (counted.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    } ++ counted.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case b: BatchScanExec => b.scan }
    }.flatten)
    val meta = scans.collectFirst { case s: graft.storage.dsv2.SnapshotCountScan => s }
    assert(meta.isDefined, s"expected metadata-count scan in:\n${counted.queryExecution}")
    assert(meta.get.count === 12345)
    // any FILTER disables the shortcut and stays exact
    assert(df.where(col("k") < 100).count() === 100)
    // after a delete-arm merge the footers reflect the rewrite
    SnapshotTable.merge(spark, root,
      Seq((0L, "x", true)).toDF("k", "s", "del"),
      Seq("k"), "k", deleteCol = Some("del"))
    assert(spark.read.format("graft-snapshot").load(root).count() === 12344)
  }

  test("flat-schema scans are COLUMNAR: ColumnarToRow in the plan, mode=columnar in the scan") {
    val root = newRoot()
    spark.range(10000).select(
      col("id").as("k"),
      (col("id") % 97).cast("double").as("x"),
      concat(lit("s"), col("id")).as("s"),
      (col("id") % 2 === 0).as("b"))
      .write.format("graft-snapshot").mode("append").save(root)
    val df = spark.read.format("graft-snapshot").load(root)
      .where(col("k") >= 100)
    assert(df.count() === 9900)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"expected a columnar scan (ColumnarToRow) in:\n$plan")
    assert(snapshotScan(df).description().contains("mode=columnar"))
    // one-level arrays and decimals are columnar too (round 12); only
    // DEEPER nesting (array<array<...>>) still falls back to the row
    // reader — correct, just row-at-a-time
    val root2 = newRoot()
    spark.range(100).select(col("id").as("k"),
      array(col("id"), col("id") + 1).as("arr"),
      col("id").cast("decimal(12,2)").as("d"))
      .write.format("graft-snapshot").mode("append").save(root2)
    val df2 = spark.read.format("graft-snapshot").load(root2)
    assert(df2.count() === 100)
    assert(snapshotScan(df2).description().contains("mode=columnar"))
    val root3 = newRoot()
    spark.range(100).select(col("id").as("k"),
      array(array(col("id")), array(col("id") + 1)).as("aa"))
      .write.format("graft-snapshot").mode("append").save(root3)
    val df3 = spark.read.format("graft-snapshot").load(root3)
    assert(df3.count() === 100)
    assert(snapshotScan(df3).description().contains("mode=row"))
    // option columnar=false forces the row path on flat schemas too
    val forced = spark.read.format("graft-snapshot")
      .option("columnar", "false").load(root)
    assert(snapshotScan(forced).description().contains("mode=row"))
  }

  test("columnar and row decode agree bit-for-bit (nulls, evolution, all flat types)") {
    val root = newRoot()
    val base = spark.range(5000).select(
      col("id").as("k"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 1000)
        .cast("int").as("i"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(col("id").cast("double") / 3.0).as("x"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise(concat(lit("v"), col("id"))).as("s"),
      (col("id") % 3 === 0).as("b"),
      to_date(lit("2026-01-01")).as("dt"),
      to_timestamp(lit("2026-01-01 12:34:56.789")).as("ts"),
      col("id").cast("float").as("f"))
    base.write.format("graft-snapshot").mode("append").save(root)
    // evolve: old files must null-fill the new column in BOTH modes
    spark.range(5000, 6000).select(
      col("id").as("k"), (col("id") % 1000).cast("int").as("i"),
      (col("id").cast("double") / 3.0).as("x"),
      concat(lit("v"), col("id")).as("s"), (col("id") % 3 === 0).as("b"),
      to_date(lit("2026-01-02")).as("dt"),
      to_timestamp(lit("2026-01-02 01:02:03")).as("ts"),
      col("id").cast("float").as("f"), lit("fresh").as("extra"))
      .write.format("graft-snapshot").option("mergeSchema", "true")
      .mode("append").save(root)
    def rows(columnar: Boolean) = spark.read.format("graft-snapshot")
      .option("columnar", columnar.toString).load(root)
      .orderBy("k").collect().map(_.toString).toSeq
    val (c, r) = (rows(true), rows(false))
    assert(c.size === 6000)
    assert(c === r)
    // pushed predicate: same answer both modes (row-group skip is I/O-only)
    def filtered(columnar: Boolean) = spark.read.format("graft-snapshot")
      .option("columnar", columnar.toString).load(root)
      .where(col("k") >= 1000 && col("k") < 1500)
      .agg(count(lit(1)), sum("x"), sum("i")).collect().head.toString
    assert(filtered(true) === filtered(false))
  }

  test("array/map/decimal scans are COLUMNAR and agree bit-for-bit with the row path") {
    val root = newRoot()
    spark.range(4000).select(
        col("id").as("k"),
        when(col("id") % 7 === 0, lit(null)).otherwise(
          array((col("id") % 97).cast("float"),
            (col("id") % 31).cast("float"))).as("emb"),
        array(col("id"), col("id") * 2).as("pair"),
        when(col("id") % 11 === 0, lit(null)).otherwise(
          map(lit("host"), concat(lit("h"), col("id") % 5))).as("dims"),
        col("id").cast("decimal(12,2)").as("d1"),
        (col("id").cast("decimal(28,4)") / 7).as("d2"))
      .write.format("graft-snapshot").mode("append").save(root)
    def df(columnar: Boolean) = spark.read.format("graft-snapshot")
      .option("columnar", columnar.toString).load(root)
    // the plan actually takes the vectorized path for the nested shapes
    val plan = df(true).queryExecution.executedPlan.toString()
    assert(plan.contains("mode=columnar") && plan.contains("ColumnarToRow"),
      s"nested scan should be columnar:\n$plan")
    def rows(columnar: Boolean) =
      df(columnar).orderBy("k").collect().map(_.toString).toSeq
    assert(rows(true) === rows(false))
    // the array hot path aggregates identically through both decoders
    def agg(columnar: Boolean) = df(columnar)
      .select(explode(col("emb")).as("e")).agg(sum("e"), count(lit(1)))
      .collect().head.toString
    assert(agg(true) === agg(false))
  }

  test("empty write to an absent root CREATES an empty, typed table") {
    val root = newRoot()
    // native-writer semantics: writing an empty frame creates a readable,
    // well-typed empty table, not nothing
    spark.range(0).select(col("id").as("k"), lit("x").as("s"))
      .write.format("graft-snapshot").mode("append").save(root)
    assert(SnapshotTable.versions(spark, root) === Seq(1L))
    val got = spark.read.format("graft-snapshot").load(root)
    assert(got.count() === 0)
    assert(got.schema.fieldNames.toSeq === Seq("k", "s"))
    // and the empty table accepts appends
    spark.range(3).select(col("id").as("k"), lit("y").as("s"))
      .write.format("graft-snapshot").mode("append").save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() === 3)
  }

  test("pin-miss hardening: getTable re-pins the version matching the inferred schema") {
    val root = newRoot()
    spark.range(5).select(col("id").as("k"))
      .write.format("graft-snapshot").mode("append").save(root)
    val provider = new graft.storage.dsv2.SnapshotDataSource
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", root))
    // inferSchema resolves v1 and pins it for THIS thread
    val inferred = provider.inferSchema(opts)
    // a commit lands between the calls AND getTable runs on a DIFFERENT
    // thread (pin invisible) — the split-pair scenario
    spark.range(5, 8).select(col("id").as("k"), lit("new").as("s"))
      .write.format("graft-snapshot").option("mergeSchema", "true")
      .mode("append").save(root)
    var tbl: org.apache.spark.sql.connector.catalog.Table = null
    val t = new Thread(() => {
      tbl = provider.getTable(inferred,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        java.util.Map.of("path", root))
    })
    t.start(); t.join()
    // the table must pair v1's schema with v1's FILES — not v2's
    val v2tbl = tbl.asInstanceOf[graft.storage.dsv2.SnapshotTableV2]
    assert(v2tbl.name().endsWith("@v1"), s"paired wrong version: ${v2tbl.name()}")
    assert(tbl.schema().fieldNames.toSeq === Seq("k"))
  }

  test("timestampAsOf time travel resolves the version committed at-or-before") {
    val root = newRoot()
    spark.range(5).select(col("id").as("k"))
      .write.format("graft-snapshot").mode("append").save(root)        // v1
    val t1 = System.currentTimeMillis()
    Thread.sleep(1100) // local-FS mtimes are second-granular
    spark.range(5, 12).select(col("id").as("k"))
      .write.format("graft-snapshot").mode("append").save(root)        // v2
    // epoch-millis form: between the commits ⇒ v1
    assert(spark.read.format("graft-snapshot")
      .option("timestampAsOf", t1.toString).load(root).count() === 5)
    // after the latest commit ⇒ v2
    assert(spark.read.format("graft-snapshot")
      .option("timestampAsOf", System.currentTimeMillis().toString)
      .load(root).count() === 12)
    // SQL-timestamp form
    val ts = new java.sql.Timestamp(t1).toString
    assert(spark.read.format("graft-snapshot")
      .option("timestampAsOf", ts).load(root).count() === 5)
    // predating the earliest version is refused loudly
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("timestampAsOf", "0").load(root).count()
    }
    assert(e.getMessage.contains("predates"))
    // mutually exclusive with versionAsOf
    intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("versionAsOf", 1).option("timestampAsOf", t1.toString)
        .load(root).count()
    }
  }

  test("change feed: option changesFrom reads exactly the appended rows") {
    val root = newRoot()
    def half(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 5).as("g"))
    half(0, 100).write.format("graft-snapshot").mode("append").save(root)   // v1
    half(100, 250).write.format("graft-snapshot").mode("append").save(root) // v2
    half(250, 300).write.format("graft-snapshot").mode("append").save(root) // v3
    // (v1, latest] = v2+v3 appends
    val feed = spark.read.format("graft-snapshot")
      .option("changesFrom", 1).load(root)
    assert(feed.count() === 200)
    assert(feed.agg(min("k"), max("k")).collect().head.toString === "[100,299]")
    // bounded range (v1, v2]
    assert(spark.read.format("graft-snapshot")
      .option("changesFrom", 1).option("changesTo", 2).load(root)
      .count() === 150)
    // from the beginning: everything
    assert(spark.read.format("graft-snapshot")
      .option("changesFrom", 0).load(root).count() === 300)
    // the library surface agrees
    assert(SnapshotTable.changes(spark, root, 1L).count() === 200)
    // a rewrite version cannot masquerade as appends
    SnapshotTable.merge(spark, root,
      Seq((0L, 99L)).toDF("k", "g"), Seq("k"), "g")                         // v4
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot").option("changesFrom", 1)
        .load(root).count()
    }
    assert(e.getMessage.contains("rewrote") || e.getMessage.contains("removed"),
      s"expected rewrite refusal, got: ${e.getMessage}")
    // ...unless the caller opts into re-delivery
    assert(spark.read.format("graft-snapshot")
      .option("changesFrom", 1).option("ignoreRewrites", "true")
      .load(root).count() >= 200)
  }

  test("streaming read: the table is a MicroBatchStream of committed versions") {
    val root = newRoot()
    spark.range(10).select(col("id").as("k"))
      .write.format("graft-snapshot").mode("append").save(root)            // v1
    val q = spark.readStream.format("graft-snapshot").load(root)
      .groupBy().count()
      .writeStream.outputMode("complete").format("memory")
      .queryName("snap_stream_counts").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_stream_counts").head.getLong(0) === 10)
      // two more commits arrive while the stream runs
      spark.range(10, 25).select(col("id").as("k"))
        .write.format("graft-snapshot").mode("append").save(root)          // v2
      q.processAllAvailable()
      assert(spark.table("snap_stream_counts").head.getLong(0) === 25)
      spark.range(25, 30).select(col("id").as("k"))
        .write.format("graft-snapshot").mode("append").save(root)          // v3
      q.processAllAvailable()
      // exactly-once: every appended row once, none twice
      assert(spark.table("snap_stream_counts").head.getLong(0) === 30)
    } finally q.stop()
    // startingVersion: only commits AFTER the given version
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startingVersion", 2).load(root)
      .writeStream.format("memory").queryName("snap_stream_tail").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("snap_stream_tail").select("k")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === (25L until 30L).toSeq)
    } finally q2.stop()
  }

  test("streaming admission control: bounded backlog drain + Trigger.AvailableNow") {
    val root = newRoot()
    // a 6-version backlog, 10 rows each
    (0 until 6).foreach { i =>
      spark.range(i * 10L, i * 10L + 10L).select(col("id").as("k"))
        .coalesce(1).write.format("graft-snapshot").mode("append").save(root)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("snapadm").toString
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("maxVersionsPerTrigger", 2).load(root)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batchSizes.synchronized { batchSizes += df.count() }; ()
        }
        .start()
      assert(q.awaitTermination(120000), "AvailableNow must terminate")
    }
    run()
    // 6 versions at <=2 versions per trigger => 3 batches of 20 rows
    assert(batchSizes.toSeq === Seq(20L, 20L, 20L),
      s"bounded drain expected [20,20,20], got $batchSizes")
    // exactly-once across a RESTART from the same checkpoint: two more
    // commits arrive, only they are delivered
    (6 until 9).foreach { i =>
      spark.range(i * 10L, i * 10L + 10L).select(col("id").as("k"))
        .coalesce(1).write.format("graft-snapshot").mode("append").save(root)
    }
    batchSizes.clear()
    run()
    assert(batchSizes.toSeq === Seq(20L, 10L),
      s"restart must resume at the checkpointed version: $batchSizes")
  }

  test("option history=true: DESCRIBE HISTORY as an ordinary read (LocalScan)") {
    val root = newRoot()
    spark.range(10).select(col("id").as("k")).repartition(2)
      .write.format("graft-snapshot").mode("append").save(root)
    spark.range(10, 15).select(col("id").as("k")).repartition(1)
      .write.format("graft-snapshot").mode("append").save(root)
    val h = spark.read.format("graft-snapshot").option("history", true)
      .load(root).orderBy("version")
    val got = h.select("version", "n_files", "total_rows", "has_schema")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq((1L, 2L, 10L, true), (2L, 3L, 15L, true)))
    // agrees with the library surface
    val lib = SnapshotTable.history(spark, root).orderBy("version")
      .select("version", "n_files", "total_rows").collect().map(_.toString)
    assert(lib.toSeq === h.select("version", "n_files", "total_rows")
      .collect().map(_.toString).toSeq)
    // plain SQL over the history via a temp view
    h.createOrReplaceTempView("snap_hist")
    assert(spark.sql("SELECT max(version) FROM snap_hist").head.getLong(0) === 2L)
    spark.catalog.dropTempView("snap_hist")
  }

  test("snapshot isolation: a resolved DSv2 frame survives a concurrent merge") {
    val root = newRoot()
    SnapshotTable.create(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"))
    val pinned = spark.read.format("graft-snapshot").load(root)
    assert(pinned.count() === 2)
    SnapshotTable.merge(spark, root,
      Seq((3L, "c", 2L)).toDF("k", "s", "v"), Seq("k"), "v")
    // the pinned frame still reads v1's manifest
    assert(pinned.count() === 2)
    assert(spark.read.format("graft-snapshot").load(root).count() === 3)
  }
}
