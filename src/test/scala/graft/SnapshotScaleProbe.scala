package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.SnapshotTable

/** Scale probe for the snapshot/manifest table (test scope): a 4M-row
  * clustered table, range-pruned point-band reads vs full-scan filters,
  * and the copy-on-write merge cost for a small update set.
  *
  * Expected shape: the stats-pruned read touches ~1/16 of the FILES for a
  * 1/32-wide band — the metric that matters at 100 TB, where every file
  * is an object-store request + footer read (locally, parquet's own
  * row-group min/max pruning makes the two paths' wall times comparable,
  * so the probe asserts on files touched and prints times for the
  * record). Results are IDENTICAL, and a 1 % merge costs roughly one
  * table rewrite (the COW trade — printed so the number is on record;
  * partition-scoped rewrites via Layout.upsertPartitioned are the escape
  * hatch the docs point to).
  * Run: sbt "Test/runMain graft.SnapshotScaleProbe [rows]" */
object SnapshotScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("snapscale").toString + "/t"
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = spark.range(rows).select(col("id").as("k"),
        (col("id") % 9973).as("v"), sha2(col("id").cast("string"), 256).as("pad"),
        lit(1L).as("ver"))
      .repartitionByRange(32, col("k"))
    val (_, tCreate) = time {
      SnapshotTable.create(spark, root, base, statsCols = Seq("k"))
    }

    val lo = rows / 2
    val hi = lo + rows / 32
    val (keepInfo, _) = time(SnapshotTable.pruneFiles(spark, root, "k", lo, hi))
    val (prunedCnt, tPruned) = time(
      SnapshotTable.readPruned(spark, root, "k", lo, hi).count())
    val (fullCnt, tFull) = time(
      SnapshotTable.read(spark, root)
        .where(col("k") >= lo && col("k") <= hi).count())
    println(f"[snap-scale] rows=$rows%,d files=${keepInfo._2} " +
      f"kept=${keepInfo._1.size} create=$tCreate%.1fs " +
      f"pruned-read=$tPruned%.2fs full-filter=$tFull%.2fs rows=$prunedCnt%,d")
    assert(prunedCnt == fullCnt && prunedCnt == rows / 32 + 1,
      s"pruned read must be exact: $prunedCnt vs $fullCnt")
    assert(keepInfo._1.size <= keepInfo._2 / 8,
      s"a 1/32 band should keep <= 1/8 of ${keepInfo._2} clustered files")

    // 1 % COW merge, re-clustered so skipping survives
    val upd = spark.range(rows / 100).select((col("id") * 100).as("k"),
      lit(-1L).as("v"), lit("upd").as("pad"), lit(2L).as("ver"))
    val (_, tMerge) = time {
      SnapshotTable.merge(spark, root, upd, Seq("k"), "ver",
        statsCols = Seq("k"), clusterBy = Some("k"), clusterFiles = 32)
    }
    val merged = SnapshotTable.read(spark, root)
    assert(merged.count() == rows)
    assert(merged.where(col("v") === -1L).count() == rows / 100)
    // skipping still effective after the re-clustered merge
    val (keep2, total2) = SnapshotTable.pruneFiles(spark, root, "k", lo, hi)
    assert(keep2.size <= total2 / 8, s"post-merge pruning lost: ${keep2.size}/$total2")
    println(f"[snap-scale] 1%% cow-merge=$tMerge%.1fs (vs create $tCreate%.1fs) " +
      f"post-merge kept=${keep2.size}/$total2")

    // 1 % APPEND vs the COW merge: the append stages only its own batch
    // and commits metadata — at 100 TB this is the difference between
    // O(batch) and O(table) per micro-batch
    val add = spark.range(rows, rows + rows / 100).select(col("id").as("k"),
      lit(7L).as("v"), lit("app").as("pad"), lit(3L).as("ver"))
    val (_, tAppend) = time {
      SnapshotTable.append(spark, root, add, statsCols = Seq("k"))
    }
    assert(SnapshotTable.read(spark, root).count() == rows + rows / 100)
    println(f"[snap-scale] 1%% append=$tAppend%.2fs vs cow-merge=$tMerge%.1fs " +
      f"(${tMerge / tAppend}%.0fx) — append is O(batch)")
    assert(tAppend < tMerge / 2,
      s"append ($tAppend s) should be far cheaper than COW merge ($tMerge s)")

    // DSv2 read path: the SAME band read through
    // spark.read.format("graft-snapshot") with an ORDINARY .where —
    // pruning evidence from the connector's own scan
    val (dsvCnt, tDsv) = time {
      spark.read.format("graft-snapshot").load(root)
        .where(col("k") >= lo && col("k") <= hi).count()
    }
    assert(dsvCnt == prunedCnt, s"DSv2 band read exact: $dsvCnt vs $prunedCnt")
    val df = spark.read.format("graft-snapshot").load(root)
      .where(col("k") >= lo && col("k") <= hi)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.collectFirst { case s: graft.storage.dsv2.SnapshotScan => s }.get
    println(f"[snap-scale] dsv2 band read=$tDsv%.2fs " +
      f"planned=${scan.plannedFiles.size}/${scan.totalFileCount} files")
    assert(scan.plannedFiles.size <= scan.totalFileCount / 4,
      s"DSv2 pruning weak: ${scan.plannedFiles.size}/${scan.totalFileCount}")

    // metadata count(*): footers only, zero data I/O — at 100 TB this is
    // the difference between a second and an hour
    val (cnt, tCount) = time {
      spark.read.format("graft-snapshot").load(root).count()
    }
    assert(cnt == rows + rows / 100)
    println(f"[snap-scale] dsv2 metadata count(*)=$tCount%.2fs " +
      f"rows=$cnt%,d (footers only)")

    // VECTORIZED DECODE: a dedicated decode-bound table — rows*4 records
    // in 8 files (task-sized units, so task overhead is noise, decode is
    // the signal), 4 numeric columns + 2 strings, aggregated end-to-end
    // through (a) the columnar ColumnarBatch reader, (b) the row
    // materializer (option columnar=false), (c) Spark's native vectorized
    // parquet scan over the same files as the reference point.
    val dRoot = java.nio.file.Files.createTempDirectory("snapdecode").toString + "/t"
    val dRows = rows * 4
    SnapshotTable.create(spark, dRoot,
      spark.range(dRows).select(col("id").as("k"),
          (col("id") * 3 % 1000003).as("a"),
          (col("id") % 9973).cast("double").as("x"),
          (col("id") % 997).cast("double").as("y"),
          concat(lit("user_"), col("id") % 100000).as("u"),
          concat(lit("t"), col("id") % 17).as("tag"))
        .repartition(8))
    val dFiles = SnapshotTable.latest(spark, dRoot).get.files
    def decodeAgg(df: org.apache.spark.sql.DataFrame): String =
      df.agg(sum(col("k")), sum(col("a")), sum(col("x")), sum(col("y")),
        sum(length(col("u"))), sum(length(col("tag")))).collect().head.toString
    def bestOf(n: Int)(f: => Unit): Double =
      (1 to n).map(_ => time(f)._2).min
    def viaConnector(columnar: Boolean) = spark.read.format("graft-snapshot")
      .option("columnar", columnar.toString).load(dRoot)
    // warm all paths (JIT + page cache), asserting content identity
    val warm = Seq(decodeAgg(viaConnector(true)), decodeAgg(viaConnector(false)),
      decodeAgg(spark.read.parquet(dFiles: _*)))
    assert(warm.distinct.size == 1, s"decode paths disagree: $warm")
    val tCol = bestOf(3)(decodeAgg(viaConnector(true)): Unit)
    val tRow = bestOf(3)(decodeAgg(viaConnector(false)): Unit)
    val tNative = bestOf(3)(decodeAgg(spark.read.parquet(dFiles: _*)): Unit)
    println(f"[snap-scale] decode ${dRows / 1000000}%dM-row 6-col aggregate: " +
      f"columnar=$tCol%.2fs row=$tRow%.2fs native-spark=$tNative%.2fs " +
      f"speedup=${tRow / tCol}%.1fx vs-native=${tCol / tNative}%.2fx")
    assert(tRow / tCol >= 1.8,
      f"columnar decode should beat the row materializer ~2x: ${tRow / tCol}%.2fx")

    // ARRAY DECODE (the embeddings hot path): an `array<float>` column
    // through the connector, columnar vs row — round 12 routes one-level
    // arrays through Spark's vectorized nested assembly instead of the
    // row materializer's per-element converter tree.
    val eRoot = java.nio.file.Files.createTempDirectory("snaparr").toString + "/t"
    val eRows = rows / 2
    spark.range(eRows).select(col("id").as("k"),
        expr("transform(sequence(0, 15), i -> cast(pmod(id * (i + 7), 997) as float) / 997.0F)")
          .as("emb"))
      .repartition(8)
      .write.format("graft-snapshot").mode("append").save(eRoot)
    def embAgg(df: org.apache.spark.sql.DataFrame): String =
      df.agg(sum(expr("cast(element_at(emb, 3) as double)")),
        sum(expr("cast(element_at(emb, 11) as double)")),
        sum(expr("size(emb)")), count(lit(1))).collect().head.toString
    def viaEmb(columnar: Boolean) = spark.read.format("graft-snapshot")
      .option("columnar", columnar.toString).load(eRoot)
    val warmE = Seq(embAgg(viaEmb(true)), embAgg(viaEmb(false)))
    assert(warmE.distinct.size == 1, s"array decode paths disagree: $warmE")
    def bestOfE(n: Int)(f: => Unit): Double =
      (1 to n).map(_ => time(f)._2).min
    val tColE = bestOfE(3)(embAgg(viaEmb(true)): Unit)
    val tRowE = bestOfE(3)(embAgg(viaEmb(false)): Unit)
    println(f"[snap-scale] array<float>[16] decode of ${eRows / 1000000.0}%.1fM rows: " +
      f"columnar=$tColE%.2fs row=$tRowE%.2fs speedup=${tRowE / tColE}%.1fx")
    assert(tColE < tRowE,
      f"vectorized array decode should beat the row path: $tColE%.2fs vs $tRowE%.2fs")

    // RETENTION DELETE: two same-size appends (old half / new half, both
    // with k stats), then `DELETE FROM ... WHERE k < cutoff` aligned to
    // the append boundary — provably whole-file, so the delete is ONE
    // manifest commit (no scan, no rewrite). Compare against the
    // copy-on-write rewrite a misaligned predicate costs.
    val rRoot = java.nio.file.Files.createTempDirectory("snapretain").toString + "/t"
    def half(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 9973).cast("double").as("v"),
        sha2(col("id").cast("string"), 256).as("pad"))
      .repartitionByRange(16, col("k"))
    half(0, rows).write.format("graft-snapshot")
      .option("statsCols", "k").mode("append").save(rRoot)
    half(rows, 2 * rows).write.format("graft-snapshot")
      .option("statsCols", "k").mode("append").save(rRoot)
    val beforeDel = SnapshotTable.latest(spark, rRoot).get
    spark.sql(s"CREATE TABLE snap_retention USING `graft-snapshot` " +
      s"OPTIONS (path '$rRoot')")
    val (_, tMetaDel) = time {
      spark.sql(s"DELETE FROM snap_retention WHERE k < $rows")
    }
    val afterDel = SnapshotTable.latest(spark, rRoot).get
    assert(afterDel.files.toSet.subsetOf(beforeDel.files.toSet),
      "aligned retention delete must not rewrite any file")
    assert(spark.read.format("graft-snapshot").load(rRoot).count() == rows)
    // misaligned: same row count removed, but through the COW rewrite
    val (_, tRewriteDel) = time {
      spark.sql(s"DELETE FROM snap_retention WHERE k >= ${rows + rows / 2} " +
        s"AND k < ${rows + rows / 2 + 1000}")
    }
    spark.sql("DROP TABLE snap_retention")
    println(f"[snap-scale] retention delete of $rows%,d rows: " +
      f"metadata-only=$tMetaDel%.2fs vs misaligned cow-rewrite=$tRewriteDel%.2fs " +
      f"(${tRewriteDel / tMetaDel}%.0fx) — aligned deletes are manifest-only")
    assert(tMetaDel < tRewriteDel / 3,
      s"metadata delete ($tMetaDel s) should be far cheaper than the " +
        s"rewrite ($tRewriteDel s)")

    // MERGE-ON-READ: a 10-row delete from the same-size table on a
    // deletion-vector table — NO data file is rewritten (identity
    // asserted); the cost is one stats-pruned candidate-file scan plus a
    // ~100-byte sidecar + manifest rename. This is the small-update
    // cliff copy-on-write can't avoid: the misaligned COW delete above
    // re-encoded a whole file for 1000 rows; merge-on-read touches none.
    val mRoot = java.nio.file.Files.createTempDirectory("snapmor").toString + "/t"
    half(0, rows).write.format("graft-snapshot")
      .option("statsCols", "k").option("deleteMode", "merge-on-read")
      .mode("append").save(mRoot)
    val beforeMor = SnapshotTable.latest(spark, mRoot).get
    spark.sql(s"CREATE TABLE snap_mor USING `graft-snapshot` " +
      s"OPTIONS (path '$mRoot')")
    // ten scattered-but-co-located keys: all inside ONE of the 16 files'
    // k range, so stats pruning bounds the scan to ~1 file
    val tenKeys = (1 to 10).map(i => i * 997L).mkString(", ")
    val (_, tMorDel) = time {
      spark.sql(s"DELETE FROM snap_mor WHERE k IN ($tenKeys)")
    }
    val afterMor = SnapshotTable.latest(spark, mRoot).get
    assert(afterMor.files.toSet == beforeMor.files.toSet,
      "merge-on-read delete must not rewrite any data file")
    val morDv = afterMor.entries.filter(_.dv.nonEmpty)
    assert(morDv.map(_.dvRows).sum == 10L, s"expected 10 vectored rows: $morDv")
    val dvBytes = morDv.map { e =>
      val p = new org.apache.hadoop.fs.Path(e.dv)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }.sum
    assert(spark.read.format("graft-snapshot").load(mRoot).count() == rows - 10)
    assert(SnapshotTable.read(spark, mRoot).count() == rows - 10)
    spark.sql("DROP TABLE snap_mor")
    println(f"[snap-scale] merge-on-read 10-row delete from $rows%,d rows: " +
      f"$tMorDel%.2fs, $dvBytes bytes of sidecar, 0 files rewritten " +
      f"(vs $tRewriteDel%.2fs for the 1000-row cow rewrite)")
    assert(tMorDel < tRewriteDel,
      s"merge-on-read ($tMorDel s) should undercut the COW rewrite ($tRewriteDel s)")

    // ...and the READ-side cost of carrying vectors, round-13 edition:
    // a DV-bearing scan STAYS COLUMNAR — vectors are applied inside the
    // vectorized reader as a per-batch selection remap — so a steady
    // trickle of small deletes no longer de-vectorizes the table. The
    // probe quantifies the (small) remap overhead vs a fully-compacted
    // columnar scan of the same data.
    def morAgg(): String = spark.read.format("graft-snapshot").load(mRoot)
      .agg(sum(col("k")), sum(col("v")), sum(length(col("pad"))))
      .collect().head.toString
    val withDvAnswer = morAgg() // warm
    val tWithDv = bestOf(3)(morAgg(): Unit)
    val dvMode = spark.read.format("graft-snapshot").load(mRoot)
      .queryExecution.executedPlan.toString()
    assert(dvMode.contains("mode=columnar") && !dvMode.contains("dv=0"),
      s"dv scan should stay columnar with dv evidence:\n$dvMode")
    SnapshotTable.compact(spark, mRoot, targetFiles = 16, statsCols = Seq("k"))
    assert(SnapshotTable.latest(spark, mRoot).get.entries.forall(_.dv.isEmpty))
    assert(morAgg() == withDvAnswer, "compaction must not change content")
    val postMode = spark.read.format("graft-snapshot").load(mRoot)
      .queryExecution.executedPlan.toString()
    assert(postMode.contains("mode=columnar"),
      s"compaction should restore columnar:\n$postMode")
    val tCompacted = bestOf(3)(morAgg(): Unit)
    println(f"[snap-scale] merge-on-read read penalty (string-heavy 3-col " +
      f"aggregate): dv-bearing COLUMNAR scan=$tWithDv%.2fs vs compacted " +
      f"columnar=$tCompacted%.2fs (${tWithDv / tCompacted}%.1fx) - " +
      "vectors no longer force row-mode decode")
    assert(tWithDv <= tCompacted * 1.3 + 0.25,
      f"dv-bearing columnar scan ($tWithDv%.2fs) should be within ~1.3x " +
        f"of the compacted scan ($tCompacted%.2fs)")

    // CDF over a 1M-row delete window: planning ships SIDECAR PATHS,
    // never positions — driver state stays O(touched files) however
    // large the delete (the round-12 design planned one tuple per
    // deleted ordinal on the driver)
    val cRoot = java.nio.file.Files.createTempDirectory("snap_cdf1m").toString
    spark.range(2000000).select(col("id").as("k"), (col("id") * 3).as("v"))
      .coalesce(2).write.format("graft-snapshot")
      .option("deleteMode", "merge-on-read").mode("append").save(cRoot)
    spark.sql("CREATE TABLE snap_cdf1m USING `graft-snapshot` " +
      s"OPTIONS (path '$cRoot')")
    val (_, tBigDel) = time {
      spark.sql("DELETE FROM snap_cdf1m WHERE k % 2 = 0") // 1M positions
    }
    val cdfSchema = graft.storage.dsv2.SnapshotCdfTable.cdfSchema(
      SnapshotTable.tableSchema(spark, cRoot, 2L).get)
    val (parts, tPlan) = time {
      new graft.storage.dsv2.SnapshotCdfScan(cRoot, cdfSchema,
        fromV = 1L, toV = Some(2L), startingVersion = None,
        maxVersionsPerTrigger = None).planInputPartitions()
    }
    val deletes1m = parts.map(_.asInstanceOf[graft.storage.dsv2.SnapshotCdfPartition])
      .filter(_.isDelete)
    assert(deletes1m.nonEmpty && deletes1m.forall(p =>
      p.newDv.endsWith(".dv") && p.oldDv.isEmpty),
      "CDF delete partitions must carry sidecar paths only")
    val (nCdf, tCdfRead) = time {
      spark.read.format("graft-snapshot").option("changeFeed", true)
        .option("changesFrom", 1).load(cRoot)
        .where(col("_change_type") === "delete").count()
    }
    assert(nCdf == 1000000L, s"expected 1M delete rows, got $nCdf")
    spark.sql("DROP TABLE snap_cdf1m")
    println(f"[snap-scale] CDF of a 1,000,000-row MoR delete: delete " +
      f"commit=$tBigDel%.2fs, planning=${tPlan * 1000}%.0fms " +
      f"(${deletes1m.length} path-only partitions, zero positions " +
      f"driver-side), executor-diffed read=$tCdfRead%.2fs")

    // STREAMING UPSERT epoch cost: re-keying 1k of 4M rows must be
    // O(batch) — data files append, ONE key sidecar per task, nothing
    // rewritten — where the copy-on-write merge of the same rows pays
    // a rewrite of every touched file (keys spread across all files ⇒
    // effectively the table)
    val uRoot = java.nio.file.Files.createTempDirectory("snap_upsert").toString
    spark.range(4000000)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"),
        lit(1L).as("__v"))
      .repartitionByRange(32, col("k"))
      .write.format("graft-snapshot").mode("append").save(uRoot)
    val beforeUp = SnapshotTable.latest(spark, uRoot).get
    val upKeys = (1 to 1000).map(i => (i * 3989L, s"upd$i")) // spread keys
    implicit val sq2: org.apache.spark.sql.SQLContext = spark.sqlContext
    val uIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val uq = uIn.toDF().toDF("k", "v").withColumn("__v", lit(2L))
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("snap_upsert_ck").toString)
      .option("upsertKeys", "k")
      .start(uRoot)
    uIn.addData(upKeys: _*)
    val (_, tUpsert) = time { uq.processAllAvailable() }
    uq.stop()
    val afterUp = SnapshotTable.latest(spark, uRoot).get
    assert(beforeUp.files.toSet.subsetOf(afterUp.files.toSet),
      "an upsert epoch must append, never rewrite")
    assert(afterUp.eqDeletes.nonEmpty)
    val (nUp, tUpRead) = time {
      spark.read.format("graft-snapshot").load(uRoot).count()
    }
    assert(nUp == 4000000L, s"last-write-wins count: $nUp")
    val (_, tCowMerge) = time {
      SnapshotTable.mergeWithRetry(spark, uRoot,
        spark.createDataFrame(upKeys.map(t => (t._1, s"cow${t._1}")))
          .toDF("k", "v").withColumn("__v", lit(3L)),
        keyCols = Seq("k"), versionCol = "__v")
    }
    println(f"[snap-scale] streaming upsert of 1,000 keys into 4,000,000 " +
      f"rows: epoch=$tUpsert%.2fs (0 files rewritten) vs cow-merge of the " +
      f"same keys=$tCowMerge%.2fs (${tCowMerge / tUpsert}%.1fx); " +
      f"post-upsert full read=$tUpRead%.2fs (bounded key-set probe)")
    assert(tUpsert < tCowMerge,
      s"an upsert epoch ($tUpsert s) must undercut the COW merge ($tCowMerge s)")
    spark.stop()
  }
}
