package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once streaming upsert into a [[SnapshotTable]] — the missing
  * end of the ingest spine: listener → parse → rollup → ACID metrics
  * store, with Structured Streaming's `foreachBatch` as the bridge.
  *
  * The exactly-once recipe is the standard idempotent-sink contract
  * every table format documents for `foreachBatch`: Spark guarantees
  * batch REPLAY (same `batchId` ⇒ same data) after failure, never batch
  * loss, so a sink that makes re-delivery a NO-OP is end-to-end
  * exactly-once. The committed `batchId` rides INSIDE the version's
  * manifest (a `#txn <id>` metadata line), so the ledger entry and the
  * data commit are ONE atomic rename — there is no crash window between
  * them, and append mode is exactly-once too, not merely
  * content-idempotent. Every commit path (merge, append, compact, DSv2
  * writes) carries the latest entry forward into its successor manifest,
  * so maintenance commits never lower the high-water mark and vacuum
  * can retire any old version without losing it.
  *
  * Scale shape: the ledger is one line inside a manifest already being
  * written; the high-water-mark read is normally ONE manifest read (the
  * latest version carries the propagated entry) — metadata-scale, like
  * every other snapshot operation.
  */
object SnapshotSink {

  /** Highest batch id recorded in the version manifests, or -1 when none
    * exists (fresh table / non-streaming table). Normally resolved from
    * the LATEST manifest alone (every commit path propagates the entry);
    * the descending scan is the belt-and-braces fallback for manifests
    * written by external tools that dropped it. */
  def lastCommittedBatch(spark: SparkSession, root: String): Long =
    SnapshotTable.versions(spark, root).reverseIterator
      .map(v => SnapshotTable.snapshot(spark, root, v).txn)
      .collectFirst { case Some(id) => id }
      .getOrElse(-1L)

  /** Commit one micro-batch exactly once: a batch at-or-below the ledger
    * high-water mark is a NO-OP (returns the current version); a fresh
    * batch creates the table (first ever batch) or merges through
    * [[SnapshotTable.mergeWithRetry]], recording its id atomically with
    * the commit. Returns the table version the batch's data is visible
    * at.
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
    val cur = SnapshotTable.latest(spark, root)
    if (batchId <= lastCommittedBatch(spark, root))
      return cur.map(_.version).getOrElse(
        throw new IllegalStateException(s"txn ledger without snapshots at $root"))
    cur match {
      case None =>
        try SnapshotTable.create(spark, root, df, statsCols, txn = Some(batchId))
        catch {
          // lost the CREATE race to a concurrent writer: their table is
          // the base now, fall through to the merge path
          case _: IllegalArgumentException |
               _: java.util.ConcurrentModificationException =>
            SnapshotTable.mergeWithRetry(spark, root, df, keyCols, versionCol,
              maxAttempts = maxAttempts, statsCols = statsCols,
              clusterBy = clusterBy, txn = Some(batchId))
        }
      case Some(_) =>
        SnapshotTable.mergeWithRetry(spark, root, df, keyCols, versionCol,
          maxAttempts = maxAttempts, statsCols = statsCols,
          clusterBy = clusterBy, txn = Some(batchId))
    }
  }

  /** Append-only exactly-once commit: the batch's rows land as NEW files
    * (no rewrite — [[SnapshotTable.append]]); the batch id commits
    * atomically with the manifest, so a replay after ANY crash point is
    * a no-op. Retries the commit race like merge does. */
  def commitBatchAppend(spark: SparkSession, root: String, batchId: Long,
                        df: DataFrame,
                        statsCols: Seq[String] = Seq.empty,
                        maxAttempts: Int = 5): Long = {
    if (batchId <= lastCommittedBatch(spark, root))
      return SnapshotTable.latest(spark, root).map(_.version).getOrElse(
        throw new IllegalStateException(s"txn ledger without snapshots at $root"))
    var attempt = 1
    var v = -1L
    while (v < 0) {
      try {
        // re-resolve per attempt: a concurrent writer may have CREATED
        // the table since the last look, flipping create into append
        v = SnapshotTable.latest(spark, root) match {
          case None =>
            SnapshotTable.create(spark, root, df, statsCols, txn = Some(batchId))
          case Some(_) =>
            SnapshotTable.append(spark, root, df, statsCols = statsCols,
              txn = Some(batchId))
        }
      } catch {
        case e @ (_: java.util.ConcurrentModificationException |
                  _: IllegalArgumentException) =>
          // CME = lost the version race; IAE = lost the CREATE race
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
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
