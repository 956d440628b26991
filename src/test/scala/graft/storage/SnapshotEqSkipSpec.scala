package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** EQUALITY-DELETE KEY-RANGE SKIPPING, end to end: the streaming-upsert
  * sink records each sidecar's key min/max (6-field `#eqdelete` form, in
  * the cast-to-double stats domain), and every scan planner proves
  * files whose recorded key-column range is DISJOINT from a sidecar's
  * exempt from its per-row probe. On a time-keyed upsert stream that is
  * most of the table — the pre-epoch bulk pays ZERO probe work. */
class SnapshotEqSkipSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapeqskip").toString + "/t"

  private def upsertStream(root: String, in: MemoryStream[(Long, String)]) =
    in.toDF().toDF("k", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation",
        Files.createTempDirectory("snapeqskip_ckpt").toString)
      .option("upsertKeys", "k")
      .option("statsCols", "k")
      .start(root)

  test("sidecar key range: written by the sink, parsed back, carried forward") {
    implicit val sq = spark.sqlContext
    val root = newRoot()
    val in = MemoryStream[(Long, String)]
    val q = upsertStream(root, in)
    try {
      in.addData((1L, "a"), (5L, "b"), (9L, "c"))
      q.processAllAvailable()
      in.addData((100L, "x"), (110L, "y"))
      q.processAllAvailable()
    } finally q.stop()
    val snap = SnapshotTable.latest(spark, root).get
    assert(snap.eqDeletes.nonEmpty)
    // the epoch's sidecar carries the batch's key bounds
    assert(snap.eqDeleteRanges.values.toSet === Set((100.0, 110.0)))
    // the raw line is the 6-field form
    val lines = snap.meta.filter(_.startsWith("#eqdelete "))
    assert(lines.nonEmpty && lines.forall(_.split("\t").length === 6))
    // a later APPEND carries the line (and its range) verbatim
    SnapshotTable.append(spark, root, Seq((200L, "z")).toDF("k", "v"))
    val snap2 = SnapshotTable.latest(spark, root).get
    assert(snap2.eqDeleteRanges.values.toSet === Set((100.0, 110.0)))
  }

  test("disjoint pre-epoch files pay zero probe work (plan-level), overlap still probes") {
    implicit val sq = spark.sqlContext
    val root = newRoot()
    val in = MemoryStream[(Long, String)]
    val q = upsertStream(root, in)
    try {
      // epoch 0: the time-keyed bulk (keys 1..100)
      in.addData((1L to 100L).map(k => (k, s"old$k")): _*)
      q.processAllAvailable()
      val bulkFiles = SnapshotTable.latest(spark, root).get.files
        .map(SnapshotTable.norm).toSet
      // epoch 1: strictly NEWER keys (1000..1009) — its sidecar's range
      // is provably disjoint from every bulk file
      in.addData((1000L to 1009L).map(k => (k, s"new$k")): _*)
      q.processAllAvailable()
      val snap = SnapshotTable.latest(spark, root).get
      val st = SnapshotTable.stats(spark, root, snap.version)
      val (eqByFile, _) = snap.eqPlanFor(snap.entries, st)
      assert(eqByFile.isEmpty,
        s"disjoint epoch must exempt every pre-epoch file, got $eqByFile")
      // the scan plan agrees: eq=0 (no probe wired into any reader)
      val desc = spark.read.format("graft-snapshot").load(root)
        .queryExecution.executedPlan.toString
      assert(desc.contains("eq=0"), s"expected eq=0 in:\n$desc")
      assert(SnapshotTable.read(spark, root).count() === 110)

      // epoch 2 OVERLAPS the bulk (keys 50..59): bulk files must probe
      // again, while epoch-1 files ([1000,1009]) stay exempt
      in.addData((50L to 59L).map(k => (k, s"upd$k")): _*)
      q.processAllAvailable()
      val snap2 = SnapshotTable.latest(spark, root).get
      val st2 = SnapshotTable.stats(spark, root, snap2.version)
      val (eqByFile2, keys2) = snap2.eqPlanFor(snap2.entries, st2)
      assert(keys2 === Seq("k"))
      assert(eqByFile2.keySet.nonEmpty &&
        eqByFile2.keySet.subsetOf(bulkFiles),
        s"overlapping epoch must probe only the bulk files, got " +
          s"${eqByFile2.keySet} vs bulk $bulkFiles")
      // correctness after the skip: last-write-wins state
      val got = SnapshotTable.read(spark, root)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size === 110)
      assert((50L to 59L).forall(k => got(k) === s"upd$k"))
      assert(got(1L) === "old1" && got(1000L) === "new1000")
      // connector read agrees
      assert(spark.read.format("graft-snapshot").load(root).count() === 110)
    } finally q.stop()
  }

  test("boundary contact is OVERLAP, not disjoint (no false skips)") {
    implicit val sq = spark.sqlContext
    val root = newRoot()
    val in = MemoryStream[(Long, String)]
    val q = upsertStream(root, in)
    try {
      in.addData((1L, "a"), (10L, "b"))
      q.processAllAvailable()
      // epoch keys [10, 20]: touches the bulk's max EXACTLY — the probe
      // must stay and retire k=10
      in.addData((10L, "B"), (20L, "c"))
      q.processAllAvailable()
      val snap = SnapshotTable.latest(spark, root).get
      val st = SnapshotTable.stats(spark, root, snap.version)
      val (eqByFile, _) = snap.eqPlanFor(snap.entries, st)
      assert(eqByFile.nonEmpty, "boundary-touching range must still apply")
      val got = SnapshotTable.read(spark, root)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "a", 10L -> "B", 20L -> "c"))
    } finally q.stop()
  }

  test("NULL keys and string keys disable the range (4-field line, probe kept)") {
    implicit val sq = spark.sqlContext
    // string keys: not range-able — line stays 4-field, reads correct
    val rootS = newRoot()
    val inS = MemoryStream[(String, Long)]
    val qS = inS.toDF().toDF("k", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation",
        Files.createTempDirectory("snapeqskip_ckpt").toString)
      .option("upsertKeys", "k")
      .option("statsCols", "v")
      .start(rootS)
    try {
      inS.addData(("a", 1L), ("b", 2L))
      qS.processAllAvailable()
      inS.addData(("a", 10L), ("c", 3L))
      qS.processAllAvailable()
    } finally qS.stop()
    val snapS = SnapshotTable.latest(spark, rootS).get
    assert(snapS.eqDeletes.nonEmpty && snapS.eqDeleteRanges.isEmpty)
    assert(snapS.meta.filter(_.startsWith("#eqdelete "))
      .forall(_.split("\t").length === 4))
    assert(SnapshotTable.read(spark, rootS)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 10L, "b" -> 2L, "c" -> 3L))

    // a NULL key anywhere in the epoch disables its range but retires
    // the null-keyed row correctly
    val rootN = newRoot()
    val inN = MemoryStream[(Option[Long], String)]
    val qN = inN.toDF().toDF("k", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation",
        Files.createTempDirectory("snapeqskip_ckpt").toString)
      .option("upsertKeys", "k")
      .option("statsCols", "k")
      .start(rootN)
    try {
      inN.addData((Some(1L), "a"), (None, "n1"))
      qN.processAllAvailable()
      inN.addData((None, "n2"), (Some(2L), "b"))
      qN.processAllAvailable()
    } finally qN.stop()
    val snapN = SnapshotTable.latest(spark, rootN).get
    assert(snapN.eqDeletes.nonEmpty && snapN.eqDeleteRanges.isEmpty)
    val gotN = SnapshotTable.read(spark, rootN)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1))).toMap
    assert(gotN === Map(Some(1L) -> "a", None -> "n2", Some(2L) -> "b"))
  }

  test("timestamp keys range in the seconds (cast-to-double) domain and skip") {
    implicit val sq = spark.sqlContext
    val root = newRoot()
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = in.toDF().toDF("ts", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation",
        Files.createTempDirectory("snapeqskip_ckpt").toString)
      .option("upsertKeys", "ts")
      .option("statsCols", "ts")
      .start(root)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      in.addData((ts("2024-01-01 00:00:00"), "a"), (ts("2024-01-02 00:00:00"), "b"))
      q.processAllAvailable()
      in.addData((ts("2024-06-01 00:00:00"), "x"))
      q.processAllAvailable()
    } finally q.stop()
    val snap = SnapshotTable.latest(spark, root).get
    val ranges = snap.eqDeleteRanges.values.toSeq
    assert(ranges.size === 1)
    // the range is recorded in epoch SECONDS — the exact domain
    // cast(ts as double) stats use (computed from the same value so the
    // assertion is timezone-independent)
    val exp = ts("2024-06-01 00:00:00").getTime / 1000.0
    assert(ranges.head === ((exp, exp)))
    val st = SnapshotTable.stats(spark, root, snap.version)
    val (eqByFile, _) = snap.eqPlanFor(snap.entries, st)
    assert(eqByFile.isEmpty, "January files must skip a June epoch's probe")
    assert(SnapshotTable.read(spark, root).count() === 3)
  }

  test("library write paths skip too: compact under a disjoint epoch stays correct") {
    implicit val sq = spark.sqlContext
    val root = newRoot()
    val in = MemoryStream[(Long, String)]
    val q = upsertStream(root, in)
    try {
      in.addData((1L to 20L).map(k => (k, s"old$k")): _*)
      q.processAllAvailable()
      in.addData((100L, "new"), (5L, "upd5"))
      q.processAllAvailable()
    } finally q.stop()
    // epoch range [5,100] overlaps the bulk — probe applies, k=5 retired
    SnapshotTable.compact(spark, root, targetFiles = 1)
    val snap = SnapshotTable.latest(spark, root).get
    assert(snap.eqDeletes.isEmpty)
    val got = SnapshotTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 21 && got(5L) === "upd5" && got(100L) === "new")
  }

  test("upsert-debt gauge: history exposes it, maxUpsertDebt refuses past the bound") {
    implicit val sq = spark.sqlContext
    val root = newRoot()
    val in = MemoryStream[(Long, String)]
    val q = upsertStream(root, in)
    try {
      in.addData((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      q.processAllAvailable()
      in.addData((1L, "A"), (2L, "B"))
      q.processAllAvailable()
    } finally q.stop()
    val h = SnapshotTable.history(spark, root)
      .orderBy("version")
      .select("version", "eq_keys_in_force", "upsert_debt")
      .collect()
    assert(h.head.getLong(1) === 0L && h.head.getDouble(2) === 0.0)
    val last = h.last
    assert(last.getLong(1) === 2L)
    // 2 keys in force / 6 recorded rows
    assert(math.abs(last.getDouble(2) - 2.0 / 6.0) < 1e-9)
    // connector history agrees
    val ch = spark.read.format("graft-snapshot").option("history", true)
      .load(root).orderBy("version")
      .select("eq_keys_in_force", "upsert_debt").collect()
    assert(ch.last.getLong(0) === 2L)

    // a bounded stream REFUSES the epoch that would cross maxUpsertDebt
    val in2 = MemoryStream[(Long, String)]
    val q2 = in2.toDF().toDF("k", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation",
        Files.createTempDirectory("snapeqskip_ckpt").toString)
      .option("upsertKeys", "k")
      .option("maxUpsertDebt", "0.4")
      .start(root)
    try {
      in2.addData((3L, "C"), (4L, "D"))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        in2.addData((3L, "c3"))
        q2.processAllAvailable()
      }
      assert(ex.getMessage.contains("upsert debt") ||
        Option(ex.getCause).exists(_.getMessage.contains("upsert debt")))
    } finally q2.stop()
    // compaction resets the gauge
    SnapshotTable.compact(spark, root, targetFiles = 1)
    val h2 = SnapshotTable.history(spark, root).orderBy("version").collect()
    assert(h2.last.getAs[Double]("upsert_debt") === 0.0)
  }
}
