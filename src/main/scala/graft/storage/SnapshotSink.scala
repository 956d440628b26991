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
  * manifest (a `#txn [<appId>] <id>` metadata line), so the ledger entry
  * and the data commit are ONE atomic rename — there is no crash window
  * between them, and append mode is exactly-once too, not merely
  * content-idempotent. Every commit path (merge, append, compact, DSv2
  * writes) carries the ledger forward into its successor manifest, so
  * maintenance commits never lower a high-water mark and vacuum can
  * retire any old version without losing it.
  *
  * LEDGER IDENTITY: entries are keyed by `appId` — Spark's batchIds are
  * PER-QUERY counters (and restart from 0 with a fresh checkpoint
  * location), so two streams writing one table, or one stream restarted
  * from scratch, must not share a high-water mark. Give each writing
  * query a stable `appId` (its checkpoint path is a natural choice); a
  * checkpoint RESET must come with a new appId, exactly as the upstream
  * table formats document for their txnAppId. The default "" appId keeps
  * the one-stream-per-table case zero-config.
  *
  * RACE SAFETY: the replay check is enforced TWICE — a cheap sink-side
  * pre-check, and [[SnapshotTable]]'s commit-time gate, which compares
  * the batch id against the ledger of the exact base snapshot the commit
  * CAS-es against. Two writers racing the same batch id (zombie driver +
  * restarted driver, the canonical duplicate-delivery case) therefore
  * cannot both land it: one wins the version rename, the other's commit
  * re-resolves, sees the ledger advanced, and no-ops.
  *
  * Scale shape: the ledger is a few lines inside a manifest already
  * being written; the high-water-mark read is normally ONE manifest read
  * (the latest version carries the propagated entries) — metadata-scale,
  * like every other snapshot operation.
  */
object SnapshotSink {

  /** Highest batch id recorded for `appId` in the version manifests, or
    * -1 when none exists (fresh table / non-streaming table). Normally
    * resolved from the LATEST manifest alone (every commit path
    * propagates the ledger); the descending scan is the belt-and-braces
    * fallback for manifests written by external tools that dropped it. */
  def lastCommittedBatch(spark: SparkSession, root: String,
                         appId: String = ""): Long =
    SnapshotTable.versions(spark, root).reverseIterator
      .map(v => SnapshotTable.snapshot(spark, root, v).txns.get(appId))
      .collectFirst { case Some(id) => id }
      .getOrElse(-1L)

  /** Commit one micro-batch exactly once: a batch at-or-below `appId`'s
    * ledger high-water mark is a NO-OP (returns the current version); a
    * fresh batch creates the table (first ever batch) or merges through
    * [[SnapshotTable.merge]], recording its id atomically with the
    * commit. The replay check re-runs at the top of EVERY retry
    * iteration — a racer that committed this batch while we were losing
    * the version race turns the retry into a no-op instead of a
    * duplicate. Returns the table version the batch's data is visible
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
                  maxAttempts: Int = 5,
                  appId: String = ""): Long =
    commitLoop(spark, root, batchId, maxAttempts, appId,
      create = () => SnapshotTable.create(spark, root, df, statsCols,
        txn = Some(batchId), txnApp = appId),
      apply = () => SnapshotTable.merge(spark, root, df, keyCols, versionCol,
        statsCols = statsCols, clusterBy = clusterBy, txn = Some(batchId),
        txnApp = appId))

  /** Append-only exactly-once commit: the batch's rows land as NEW files
    * (no rewrite — [[SnapshotTable.append]]); the batch id commits
    * atomically with the manifest, so a replay after ANY crash point is
    * a no-op — including the dual-writer race, via the commit-time gate.
    * Retries the commit race like merge does. */
  def commitBatchAppend(spark: SparkSession, root: String, batchId: Long,
                        df: DataFrame,
                        statsCols: Seq[String] = Seq.empty,
                        maxAttempts: Int = 5,
                        appId: String = ""): Long =
    commitLoop(spark, root, batchId, maxAttempts, appId,
      create = () => SnapshotTable.create(spark, root, df, statsCols,
        txn = Some(batchId), txnApp = appId),
      apply = () => SnapshotTable.append(spark, root, df,
        statsCols = statsCols, txn = Some(batchId), txnApp = appId))

  /** The shared retry loop. Per iteration: re-check the ledger (replay ⇒
    * no-op return), then create (no table yet) or apply (merge/append).
    * `IllegalArgumentException` from CREATE is re-examined: if a table
    * appeared since, we lost the CREATE race and the next iteration
    * applies against it; if no table exists the IAE is a GENUINE error
    * (bad arguments) and fails fast. IAEs from the apply path (e.g. a
    * schema mismatch on append) always fail fast — retrying a doomed
    * append `maxAttempts` times would only bury the real error. */
  private def commitLoop(spark: SparkSession, root: String, batchId: Long,
                         maxAttempts: Int, appId: String,
                         create: () => Long, apply: () => Long): Long = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 1
    while (true) {
      if (batchId <= lastCommittedBatch(spark, root, appId))
        return SnapshotTable.latest(spark, root).map(_.version).getOrElse(
          throw new IllegalStateException(s"txn ledger without snapshots at $root"))
      try {
        SnapshotTable.latest(spark, root) match {
          case None =>
            val created =
              try Some(create())
              catch {
                case e: IllegalArgumentException =>
                  // only a CREATE race (someone committed v1 first) is
                  // retryable; with no table present this is a real error
                  if (SnapshotTable.latest(spark, root).isEmpty) throw e
                  None
              }
            created match {
              case Some(v) => return v
              case None => // lost the CREATE race — next iteration applies
            }
          case Some(_) => return apply()
        }
      } catch {
        case e: java.util.ConcurrentModificationException =>
          // lost the version race (or the gate fired mid-race); the next
          // iteration's ledger re-check decides replay vs retry
          if (attempt >= maxAttempts) throw e
      }
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** The `foreachBatch` adapter:
    * {{{
    * stream.writeStream.foreachBatch(
    *   SnapshotSink.foreachBatchMerge(root, Seq("metric"), "ts",
    *     appId = "rollup-1m")).start()
    * }}} */
  def foreachBatchMerge(root: String, keyCols: Seq[String], versionCol: String,
                        statsCols: Seq[String] = Seq.empty,
                        clusterBy: Option[String] = None,
                        appId: String = ""): (DataFrame, Long) => Unit =
    (df, batchId) =>
      commitBatch(df.sparkSession, root, batchId, df, keyCols, versionCol,
        statsCols, clusterBy, appId = appId): Unit

  /** `foreachBatch` adapter for append-only fact streams. */
  def foreachBatchAppend(root: String,
                         statsCols: Seq[String] = Seq.empty,
                         appId: String = ""): (DataFrame, Long) => Unit =
    (df, batchId) =>
      commitBatchAppend(df.sparkSession, root, batchId, df, statsCols,
        appId = appId): Unit
}
