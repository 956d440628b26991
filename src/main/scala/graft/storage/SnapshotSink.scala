package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once streaming upsert into a [[SnapshotTable]] — the missing
  * end of the ingest spine: listener → parse → rollup → ACID metrics
  * store, with Structured Streaming's `foreachBatch` as the bridge.
  *
  * The exactly-once recipe is the standard idempotent-sink contract
  * every table format documents for `foreachBatch`: Spark guarantees
  * batch REPLAY (same `batchId` ⇒ same data) after failure, never batch
  * loss, so a sink that makes re-delivery a NO-OP is end-to-end
  * exactly-once. This sink records the committed `batchId` in a
  * `v<NN>.txn` sidecar next to each manifest it commits (published with
  * the same staged-write + rename primitive, so readers never see a torn
  * sidecar) and skips any batch at-or-below the high-water mark.
  *
  * Crash window honesty: a failure BETWEEN the manifest commit and the
  * txn publish makes the replayed batch re-merge — one redundant version
  * whose CONTENT is identical (last-write-wins keyed merge of the same
  * rows is idempotent), so the guarantee degrades to exactly-once
  * CONTENT / at-least-once versions in that window, same as Delta's
  * txn-version recovery note. Version numbers therefore need not equal
  * batch ids; the sidecar is the dedup ledger, not the version counter.
  *
  * Scale shape: the ledger is one tiny file per commit (vacuumed with
  * its version); the high-water-mark read is a driver-side directory
  * listing — metadata-scale, like every other snapshot operation.
  */
object SnapshotSink {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir(root: String) = new Path(root, "_snapshots")
  private def txnPath(root: String, v: Long) =
    new Path(snapDir(root), f"v$v%020d.txn")

  /** Highest batch id recorded by any committed version's txn sidecar,
    * or -1 when none exists (fresh table / non-streaming table). */
  def lastCommittedBatch(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val d = snapDir(root)
    if (!f.exists(d)) return -1L
    val ids = f.listStatus(d).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v") && p.getName.endsWith(".txn"))
      .flatMap { p =>
        val in = f.open(p)
        val s = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
          new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim
        } finally in.close()
        // tolerate a torn sidecar: an unreadable ledger entry means the
        // batch MAY replay — the content-idempotent path, never data loss
        try Some(s.toLong) catch { case _: NumberFormatException => None }
      }
    if (ids.isEmpty) -1L else ids.max
  }

  private def writeTxn(spark: SparkSession, root: String, v: Long,
                       batchId: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(snapDir(root), s".tmp-txn-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(s"$batchId\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, txnPath(root, v))) f.delete(tmp, false)
  }

  /** Commit one micro-batch exactly once: a batch at-or-below the ledger
    * high-water mark is a NO-OP (returns the current version); a fresh
    * batch creates the table (first ever batch) or merges through
    * [[SnapshotTable.mergeWithRetry]], then records its id. Returns the
    * table version the batch's data is visible at.
    *
    * Merge is copy-on-write — O(table) per batch. When the stream's rows
    * are immutable facts (datapoints, events) rather than keyed upserts,
    * use [[commitBatchAppend]]: O(batch) per commit, the shape that
    * holds at 100 TB ingest rates. */
  def commitBatch(spark: SparkSession, root: String, batchId: Long,
                  df: DataFrame, keyCols: Seq[String], versionCol: String,
                  statsCols: Seq[String] = Seq.empty,
                  clusterBy: Option[String] = None,
                  maxAttempts: Int = 5): Long = {
    val last = lastCommittedBatch(spark, root)
    val cur = SnapshotTable.latest(spark, root)
    if (batchId <= last)
      return cur.map(_.version).getOrElse(
        throw new IllegalStateException(s"txn ledger without snapshots at $root"))
    val v = SnapshotTable.latest(spark, root) match {
      case None =>
        try SnapshotTable.create(spark, root, df, statsCols)
        catch {
          // lost the CREATE race to a concurrent writer: their table is
          // the base now, fall through to the merge path
          case _: IllegalArgumentException |
               _: java.util.ConcurrentModificationException =>
            SnapshotTable.mergeWithRetry(spark, root, df, keyCols, versionCol,
              maxAttempts = maxAttempts, statsCols = statsCols, clusterBy = clusterBy)
        }
      case Some(_) =>
        SnapshotTable.mergeWithRetry(spark, root, df, keyCols, versionCol,
          maxAttempts = maxAttempts, statsCols = statsCols, clusterBy = clusterBy)
    }
    writeTxn(spark, root, v, batchId)
    v
  }

  /** Append-only exactly-once commit: the batch's rows land as NEW files
    * (no rewrite — [[SnapshotTable.append]]), replays are no-ops via the
    * same ledger. Retries the commit race like merge does. */
  def commitBatchAppend(spark: SparkSession, root: String, batchId: Long,
                        df: DataFrame,
                        statsCols: Seq[String] = Seq.empty,
                        maxAttempts: Int = 5): Long = {
    val last = lastCommittedBatch(spark, root)
    val cur = SnapshotTable.latest(spark, root)
    if (batchId <= last)
      return cur.map(_.version).getOrElse(
        throw new IllegalStateException(s"txn ledger without snapshots at $root"))
    var attempt = 1
    var v = -1L
    while (v < 0) {
      try {
        // re-resolve per attempt: a concurrent writer may have CREATED
        // the table since the last look, flipping create into append
        v = SnapshotTable.latest(spark, root) match {
          case None => SnapshotTable.create(spark, root, df, statsCols)
          case Some(_) => SnapshotTable.append(spark, root, df, statsCols = statsCols)
        }
      } catch {
        case e @ (_: java.util.ConcurrentModificationException |
                  _: IllegalArgumentException) =>
          // CME = lost the version race; IAE = lost the CREATE race
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    writeTxn(spark, root, v, batchId)
    v
  }

  /** The `foreachBatch` adapter:
    * {{{
    * stream.writeStream.foreachBatch(
    *   SnapshotSink.foreachBatchMerge(root, Seq("metric"), "ts")).start()
    * }}} */
  def foreachBatchMerge(root: String, keyCols: Seq[String], versionCol: String,
                        statsCols: Seq[String] = Seq.empty,
                        clusterBy: Option[String] = None): (DataFrame, Long) => Unit =
    (df, batchId) =>
      commitBatch(df.sparkSession, root, batchId, df, keyCols, versionCol,
        statsCols, clusterBy): Unit

  /** `foreachBatch` adapter for append-only fact streams. */
  def foreachBatchAppend(root: String,
                         statsCols: Seq[String] = Seq.empty): (DataFrame, Long) => Unit =
    (df, batchId) =>
      commitBatchAppend(df.sparkSession, root, batchId, df, statsCols): Unit
}
