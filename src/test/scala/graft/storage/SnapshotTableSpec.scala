package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snaptbl").toString + "/t"

  test("create → read round-trips; create refuses an existing table") {
    val root = newRoot()
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "s", "v")
    assert(SnapshotTable.create(spark, root, base) === 1L)
    assert(canon(SnapshotTable.read(spark, root).orderBy("k")) ===
      canon(base.orderBy("k")))
    intercept[IllegalArgumentException] {
      SnapshotTable.create(spark, root, base)
    }
  }

  test("merge is last-write-wins with update-side tie break; time travel works") {
    val root = newRoot()
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "s", "v")
    SnapshotTable.create(spark, root, base)
    // k=2 newer version wins; k=3 SAME version — update side wins the tie;
    // k=4 is a pure insert
    val upd = Seq((2L, "B", 2L), (3L, "C", 1L), (4L, "d", 2L)).toDF("k", "s", "v")
    assert(SnapshotTable.merge(spark, root, upd, Seq("k"), "v") === 2L)
    val got = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "a", 1L), (2L, "B", 2L), (3L, "C", 1L), (4L, "d", 2L)))
    // an OLDER update version must NOT clobber
    val stale = Seq((2L, "old", 1L)).toDF("k", "s", "v")
    SnapshotTable.merge(spark, root, stale, Seq("k"), "v")
    assert(SnapshotTable.read(spark, root).where(col("k") === 2)
      .select("s").head.getString(0) === "B")
    // time travel: v1 still shows the original row set
    assert(SnapshotTable.readVersion(spark, root, 1L).count() === 3)
    assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L, 3L))
  }

  test("concurrent writers from the same base: exactly one commit wins") {
    val root = newRoot()
    val base = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v")
    SnapshotTable.create(spark, root, base)
    // both writers resolved v1 and race for v2: the first commit wins,
    // the second must REFUSE (not silently drop writer 1's rows)
    val w1 = Seq((1L, "w1", 2L)).toDF("k", "s", "v")
    val w2 = Seq((2L, "w2", 2L)).toDF("k", "s", "v")
    assert(SnapshotTable.merge(spark, root, w1, Seq("k"), "v",
      expectedVersion = Some(1L)) === 2L)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.merge(spark, root, w2, Seq("k"), "v",
        expectedVersion = Some(1L))
    }
    // the loser's rows are absent; the winner's landed; retry from the
    // NEW base succeeds — the standard optimistic loop
    assert(SnapshotTable.read(spark, root).where(col("s") === "w2").count() === 0)
    assert(SnapshotTable.read(spark, root).where(col("s") === "w1").count() === 1)
    SnapshotTable.merge(spark, root, w2, Seq("k"), "v")
    assert(SnapshotTable.read(spark, root).where(col("s") === "w2").count() === 1)
  }

  test("snapshot isolation: a pinned reader survives a concurrent merge + vacuum") {
    val root = newRoot()
    val base = spark.range(100).select(col("id").as("k"),
      lit("x").as("s"), lit(1L).as("v"))
    SnapshotTable.create(spark, root, base)
    val pinned = SnapshotTable.read(spark, root) // resolves v1's file list
    val n1 = pinned.count()
    SnapshotTable.merge(spark, root,
      spark.range(50).select(col("id").as("k"), lit("y").as("s"), lit(2L).as("v")),
      Seq("k"), "v")
    // the pinned frame still reads v1's files — unchanged count and content
    assert(pinned.count() === n1)
    assert(pinned.where(col("s") === "y").count() === 0)
    // vacuum keeping both versions deletes nothing referenced
    // (graceMs = 0 in tests: files are seconds old and would otherwise
    // all sit inside the in-flight-writer protection window)
    assert(SnapshotTable.vacuum(spark, root, keepVersions = 2, graceMs = 0) === 0)
    // the default grace window protects young unreferenced files: with
    // v1 dropped but files fresh, nothing is deleted yet
    assert(SnapshotTable.vacuum(spark, root, keepVersions = 1) === 0)
    assert(SnapshotTable.readVersion(spark, root, 1L).count() === 100)
    // dropping v1 past the window deletes its unshared files
    val deleted = SnapshotTable.vacuum(spark, root, keepVersions = 1, graceMs = 0)
    assert(deleted > 0)
    assert(SnapshotTable.versions(spark, root) === Seq(2L))
    intercept[Exception] { SnapshotTable.readVersion(spark, root, 1L).count() }
    // latest still fully readable
    assert(SnapshotTable.read(spark, root).count() === 100)
  }

  test("min/max stats prune files on range reads with no false negatives") {
    val root = newRoot()
    // range-partition so each of the 8 files carries a tight k range
    val base = spark.range(8000).select(col("id").as("k"),
      (col("id") % 97).as("v"), lit(1L).as("ver"))
      .repartitionByRange(8, col("k"))
    SnapshotTable.create(spark, root, base, statsCols = Seq("k"))
    val (keep, total) = SnapshotTable.pruneFiles(spark, root, "k", 1000, 1999)
    assert(total === 8)
    assert(keep.size < total, s"expected pruning, kept ${keep.size}/$total")
    // exact same rows as the unpruned filter
    val expect = SnapshotTable.read(spark, root)
      .where(col("k").between(1000, 1999)).count()
    val got = SnapshotTable.readPruned(spark, root, "k", 1000, 1999).count()
    assert(got === expect && got === 1000L)
    // out-of-domain range prunes everything yet returns an empty frame
    val (none, _) = SnapshotTable.pruneFiles(spark, root, "k", 50000, 60000)
    assert(none.isEmpty)
    assert(SnapshotTable.readPruned(spark, root, "k", 50000, 60000).count() === 0)
    // a merge WITHOUT statsCols drops to the unpruned (no-false-negative)
    // path: every file kept, results still exact
    SnapshotTable.merge(spark, root,
      Seq((1L, 5L, 2L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    val (keep2, total2) = SnapshotTable.pruneFiles(spark, root, "k", 1000, 1999)
    assert(keep2.size === total2, "stats-less snapshot must keep all files")
    assert(SnapshotTable.readPruned(spark, root, "k", 1000, 1999).count() === expect)
    // a merge WITH statsCols + clusterBy re-clusters the rewrite, so
    // skipping is effective again (without clusterBy the merge's hash
    // shuffle leaves every file spanning the whole k domain)
    SnapshotTable.merge(spark, root,
      Seq((2L, 6L, 2L)).toDF("k", "v", "ver"), Seq("k"), "ver",
      statsCols = Seq("k"), clusterBy = Some("k"), clusterFiles = 8)
    val (keep3, total3) = SnapshotTable.pruneFiles(spark, root, "k", 1000, 1999)
    assert(total3 > 1 && keep3.size < total3,
      s"re-clustered merge must prune: kept ${keep3.size}/$total3")
    assert(SnapshotTable.readPruned(spark, root, "k", 1000, 1999).count() === expect)
  }

  test("a TRUE concurrent commit race has exactly one winner (atomic flip)") {
    // POSIX rename REPLACES an existing destination, so a rename-based
    // commit would let both racing writers "succeed" and silently lose
    // one; the local-FS flip is a hard link (O_EXCL-atomic). Two threads
    // resolve the same base and race the v2 publication through a
    // barrier; exactly one merge may return.
    import java.util.concurrent.{CountDownLatch, ConcurrentLinkedQueue}
    val root = newRoot()
    SnapshotTable.create(spark,
      root, Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"))
    val gate = new CountDownLatch(1)
    val outcomes = new ConcurrentLinkedQueue[String]()
    val threads = Seq("w1", "w2").map { w =>
      new Thread(() => {
        try {
          val upd = Seq((if (w == "w1") 1L else 2L, w, 2L)).toDF("k", "s", "v")
          gate.await()
          SnapshotTable.merge(spark, root, upd, Seq("k"), "v",
            expectedVersion = Some(1L))
          outcomes.add(s"$w:won")
        } catch {
          case _: java.util.ConcurrentModificationException => outcomes.add(s"$w:lost")
          case e: Throwable => outcomes.add(s"$w:ERR:${e.getClass.getSimpleName}")
        }
      })
    }
    threads.foreach(_.start())
    gate.countDown()
    threads.foreach(_.join(120000))
    val res = outcomes.toArray.map(_.toString).sorted.toSeq
    assert(res.count(_.endsWith(":won")) === 1, s"exactly one winner: $res")
    assert(res.count(_.endsWith(":lost")) === 1, s"exactly one loser: $res")
    // the committed v2 contains exactly the winner's row
    val winner = res.find(_.endsWith(":won")).get.split(":")(0)
    assert(SnapshotTable.read(spark, root).where(col("s") === winner).count() === 1)
    assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
  }

  test("delete arms: a winning tombstone removes the key; time travel keeps it") {
    val root = newRoot()
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "s", "v")
    SnapshotTable.create(spark, root, base)
    // k=2: WHEN MATCHED THEN DELETE; k=3: plain upsert in the SAME merge;
    // k=9: tombstone for an absent key — WHEN NOT MATCHED has no delete
    // arm, so it must be a no-op, not a resurrected phantom row
    val upd = Seq((2L, "x", 2L, true), (3L, "C", 2L, false), (9L, "x", 2L, true))
      .toDF("k", "s", "v", "del")
    assert(SnapshotTable.merge(spark, root, upd, Seq("k"), "v",
      deleteCol = Some("del")) === 2L)
    val got = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "a"), (3L, "C")))
    assert(!SnapshotTable.read(spark, root).columns.contains("del"))
    // a STALE tombstone (older versionCol) must not delete the newer row
    val stale = Seq((3L, "x", 1L, true)).toDF("k", "s", "v", "del")
    SnapshotTable.merge(spark, root, stale, Seq("k"), "v", deleteCol = Some("del"))
    assert(SnapshotTable.read(spark, root).where(col("k") === 3).count() === 1)
    // delete-then-time-travel: v1 still has the deleted key
    assert(SnapshotTable.readVersion(spark, root, 1L)
      .where(col("k") === 2).count() === 1)
  }

  test("mergeWithRetry: both racing writers land (versions N+1, N+2)") {
    import java.util.concurrent.{CountDownLatch, ConcurrentLinkedQueue}
    val root = newRoot()
    SnapshotTable.create(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"))
    val gate = new CountDownLatch(1)
    val versions = new ConcurrentLinkedQueue[java.lang.Long]()
    val threads = Seq("w1", "w2").map { w =>
      new Thread(() => {
        val upd = Seq((if (w == "w1") 1L else 2L, w, 2L)).toDF("k", "s", "v")
        gate.await()
        versions.add(SnapshotTable.mergeWithRetry(spark, root, upd, Seq("k"), "v"))
      })
    }
    threads.foreach(_.start())
    gate.countDown()
    threads.foreach(_.join(120000))
    assert(versions.toArray.map(_.toString.toLong).sorted.toSeq === Seq(2L, 3L),
      "the loser must retry onto the next version, not throw")
    // BOTH writers' rows are in the final table — no lost update
    val s3 = SnapshotTable.read(spark, root)
    assert(s3.where(col("s") === "w1").count() === 1)
    assert(s3.where(col("s") === "w2").count() === 1)
  }

  test("append is O(batch): old files untouched, stats carried forward") {
    val root = newRoot()
    val base = spark.range(4000).select(col("id").as("k"),
      lit("a").as("s"), lit(1L).as("v")).repartitionByRange(4, col("k"))
    SnapshotTable.create(spark, root, base, statsCols = Seq("k"))
    val v1Files = SnapshotTable.latest(spark, root).get.files.toSet
    val add = spark.range(4000, 5000).select(col("id").as("k"),
      lit("b").as("s"), lit(2L).as("v")).repartitionByRange(1, col("k"))
    assert(SnapshotTable.append(spark, root, add, statsCols = Seq("k")) === 2L)
    val v2 = SnapshotTable.latest(spark, root).get
    // every v1 file is still referenced — append rewrote NOTHING
    assert(v1Files.subsetOf(v2.files.toSet))
    assert(v2.files.size === v1Files.size + 1)
    assert(SnapshotTable.read(spark, root).count() === 5000)
    // stats survive the append on BOTH old and new files
    val (keepOld, total) = SnapshotTable.pruneFiles(spark, root, "k", 0, 999)
    assert(total === 5 && keepOld.size < total)
    val (keepNew, _) = SnapshotTable.pruneFiles(spark, root, "k", 4200, 4300)
    assert(keepNew.size === 1, s"new-file band should prune to 1, got ${keepNew.size}")
  }

  test("compact rewrites layout, never content; old layout time-travels") {
    val root = newRoot()
    val base = spark.range(2000).select(col("id").as("k"),
      (col("id") % 7).as("x"), lit(1L).as("v")).repartition(16)
    SnapshotTable.create(spark, root, base)
    assert(SnapshotTable.latest(spark, root).get.files.size === 16)
    val before = canon(SnapshotTable.read(spark, root).orderBy("k"))
    assert(SnapshotTable.compact(spark, root, targetFiles = 4,
      clusterBy = Some("k"), statsCols = Seq("k")) === 2L)
    val v2 = SnapshotTable.latest(spark, root).get
    assert(v2.files.size === 4)
    assert(canon(SnapshotTable.read(spark, root).orderBy("k")) === before)
    // clustering makes the compacted files prunable (range-partitioner
    // boundaries are sample-approximate, so a quarter-domain band may
    // straddle one boundary — but never most of the files)
    val (keep, total) = SnapshotTable.pruneFiles(spark, root, "k", 0, 499)
    assert(total === 4 && keep.size <= 2)
    // v1's 16-file layout is still readable
    assert(SnapshotTable.readVersion(spark, root, 1L).count() === 2000)
  }

  test("type-widening evolution: int->long and float->double across appends") {
    val root = newRoot()
    // v1: narrow types (int k, float x)
    SnapshotTable.create(spark, root,
      spark.range(100).select(col("id").cast("int").as("k"),
        (col("id") % 7).cast("float").as("x")))
    // widened append: long k, double x — the table widens, old files
    // read through an upcast
    SnapshotTable.append(spark, root,
      spark.range(100, 200).select(col("id").as("k"),
        (col("id") % 7).cast("double").as("x")),
      mergeSchema = true)
    val t = SnapshotTable.read(spark, root)
    assert(t.schema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(t.schema("x").dataType === org.apache.spark.sql.types.DoubleType)
    assert(t.count() === 200)
    assert(t.agg(sum("k")).collect().head.getLong(0) === (0L until 200L).sum)
    // a NARROW writer keeps working against the widened table (widens
    // the other way: incoming int fits the long column)
    SnapshotTable.append(spark, root,
      spark.range(200, 210).select(col("id").cast("int").as("k"),
        lit(1.5f).as("x")),
      mergeSchema = true)
    assert(SnapshotTable.read(spark, root).count() === 210)
    assert(SnapshotTable.read(spark, root).schema("k").dataType ===
      org.apache.spark.sql.types.LongType)
    // time travel shows v1's ORIGINAL narrow schema
    val v1 = SnapshotTable.readVersion(spark, root, 1L)
    assert(v1.schema("k").dataType === org.apache.spark.sql.types.IntegerType)
    assert(v1.schema("x").dataType === org.apache.spark.sql.types.FloatType)
    assert(v1.count() === 100)
    // both connector decode modes read the mixed-width files identically
    def viaConnector(columnar: Boolean) = spark.read.format("graft-snapshot")
      .option("columnar", columnar.toString).load(root)
      .orderBy("k").collect().map(_.toString).toSeq
    assert(viaConnector(true) === viaConnector(false))
    assert(viaConnector(true).size === 210)
    // narrowing is refused loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, root,
        spark.range(5).select(col("id").as("k"), lit("no").as("x")),
        mergeSchema = true)
    }
  }

  test("add-column evolution: appends widen the schema, old files read null") {
    val root = newRoot()
    SnapshotTable.create(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"))
    // a differing column set WITHOUT mergeSchema must be refused (a
    // typo'd column must not silently fork the schema)
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, root,
        Seq((3L, "c", 1L, "x")).toDF("k", "s", "v", "extra"))
    }
    // with mergeSchema: the table gains `extra` (nullable)
    SnapshotTable.append(spark, root,
      Seq((3L, "c", 2L, "x3")).toDF("k", "s", "v", "extra"),
      mergeSchema = true)
    val got = SnapshotTable.read(spark, root)
    assert(got.columns.toSeq === Seq("k", "s", "v", "extra"))
    val rows = got.orderBy("k")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(rows === Seq((1L, None), (2L, None), (3L, Some("x3"))))
    // time travel shows v1's ORIGINAL schema
    assert(SnapshotTable.readVersion(spark, root, 1L).columns.toSeq ===
      Seq("k", "s", "v"))
    // a type CHANGE is refused even with mergeSchema
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, root,
        Seq((4L, "d", 3L, 42)).toDF("k", "s", "v", "extra"),
        mergeSchema = true)
    }
    // a narrower append (missing `extra`) is fine under mergeSchema
    SnapshotTable.append(spark, root,
      Seq((5L, "e", 3L)).toDF("k", "s", "v"), mergeSchema = true)
    assert(SnapshotTable.read(spark, root)
      .where(col("k") === 5 && col("extra").isNull).count() === 1)
  }

  test("add-column evolution through merge; compaction materializes it") {
    val root = newRoot()
    SnapshotTable.create(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"))
    SnapshotTable.merge(spark, root,
      Seq((2L, "B", 2L, 9.5), (3L, "c", 2L, 1.5)).toDF("k", "s", "v", "score"),
      Seq("k"), "v", mergeSchema = true)
    val got = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(3)))).toSeq
    assert(got === Seq((1L, "a", None), (2L, "B", Some(9.5)), (3L, "c", Some(1.5))))
    // compact keeps the evolved schema and content
    SnapshotTable.compact(spark, root, targetFiles = 1)
    assert(SnapshotTable.read(spark, root).columns.toSeq === Seq("k", "s", "v", "score"))
    assert(SnapshotTable.read(spark, root).count() === 3)
  }

  test("history reports versions, sizes, ledger entries, and schemas") {
    val root = newRoot()
    SnapshotTable.create(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"), txn = Some(0L))
    SnapshotTable.append(spark, root, Seq((3L, "c", 2L)).toDF("k", "s", "v"))
    SnapshotTable.compact(spark, root, targetFiles = 1)
    val h = SnapshotTable.history(spark, root).orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // v2 appended one file batch onto v1's files; v3 compacted to 1
    assert(h(1).getLong(2) > h(0).getLong(2))
    assert(h(2).getLong(2) === 1L)
    assert(h.forall(_.getLong(3) > 0L), "total_bytes must be real")
    // the create's txn entry is carried through append and compact
    assert(h.map(r => Option(r.get(4)).map(_.toString.toLong)).toSeq ===
      Seq(Some(0L), Some(0L), Some(0L)))
    assert(h.forall(_.getBoolean(5)), "every round-10 version carries a schema")
  }

  test("NaN stat values never cause a false-negative prune") {
    val root = newRoot()
    val sq = spark; import sq.implicits._
    // one file's max is NaN (Spark ranks NaN above everything): that file
    // must carry NO stats line and always be kept
    val base = Seq((1L, 10.0, 1L), (2L, Double.NaN, 1L), (3L, 500.0, 1L))
      .toDF("k", "x", "ver").repartition(1)
    SnapshotTable.create(spark, root, base, statsCols = Seq("x"))
    val (keep, total) = SnapshotTable.pruneFiles(spark, root, "x", 5, 15)
    assert(keep.size === total, "NaN-touched file must be kept unpruned")
    assert(SnapshotTable.readPruned(spark, root, "x", 5, 15).count() === 1)
  }

  test("conflict-scoped rebase: partition-disjoint concurrent merges both commit one rewrite") {
    val root = newRoot()
    val base = spark.range(200).select(col("id").as("k"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("g"),
      col("id").as("x"), lit(1L).as("v"))
    SnapshotTable.create(spark, root, base, partitionBy = Seq("g"))
    val v1 = SnapshotTable.latest(spark, root).get
    def partFiles(s: SnapshotTable.Snapshot, g: String) =
      s.entries.filter(_.tuple.contains(s"g=$g")).map(_.path).toSet
    var v2: SnapshotTable.Snapshot = null
    // writer A updates partition a; INSIDE its commit window, writer B
    // lands a partition-b merge. A's CAS fails; the manifests prove the
    // two scopes disjoint, so A REBASES — no second rewrite, no throw.
    val updA = Seq((0L, "a", -10L, 2L), (2L, "a", -20L, 2L)).toDF("k", "g", "x", "v")
    val updB = Seq((1L, "b", -30L, 2L)).toDF("k", "g", "x", "v")
    val vA = SnapshotTable.merge(spark, root, updA, Seq("k", "g"), "v",
      onStaged = () => {
        SnapshotTable.merge(spark, root, updB, Seq("k", "g"), "v")
        v2 = SnapshotTable.latest(spark, root).get
      })
    assert(vA === 3L, "the rebased commit lands as v3 without a re-merge")
    val v3 = SnapshotTable.latest(spark, root).get
    // B's partition-b rewrite is retained VERBATIM by A's rebase...
    assert(partFiles(v3, "b") === partFiles(v2, "b"))
    assert(partFiles(v3, "b") !== partFiles(v1, "b"))
    // ...and A's partition-a files replace v1's
    assert(partFiles(v3, "a").intersect(partFiles(v1, "a")).isEmpty)
    // both writers' rows are live
    val got = SnapshotTable.read(spark, root)
      .where(col("x") < 0).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got === Seq((0L, -10L), (1L, -30L), (2L, -20L)))
    assert(SnapshotTable.read(spark, root).count() === 200)

    // OVERLAPPING scopes still serialize: a racer in the SAME partition
    // forces the loser back through the full re-merge (CME),
    // and a plain retry converges with both updates applied
    val updA2 = Seq((4L, "a", -40L, 3L)).toDF("k", "g", "x", "v")
    val updB2 = Seq((6L, "a", -60L, 3L)).toDF("k", "g", "x", "v")
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.merge(spark, root, updA2, Seq("k", "g"), "v",
        onStaged = () =>
          SnapshotTable.merge(spark, root, updB2, Seq("k", "g"), "v"))
    }
    SnapshotTable.merge(spark, root, updA2, Seq("k", "g"), "v")
    val fin = SnapshotTable.read(spark, root).where(col("x") < -35)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(fin === Seq((4L, -40L), (6L, -60L)))
    assert(SnapshotTable.read(spark, root).count() === 200)
  }
}
