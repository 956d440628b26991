package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot/manifest table format over plain parquet — the
  * Delta/Iceberg-class capabilities a 100 TB metrics store actually needs,
  * built from first principles on two primitives every HDFS-compatible
  * filesystem gives us: immutable data files and atomic single-file
  * rename.
  *
  * Layout:
  * {{{
  *   <root>/data/<uuid>/part-*.parquet     // immutable, append-only
  *   <root>/_snapshots/v<20-digit>.manifest // one line per data file
  * }}}
  *
  * Guarantees:
  *  - ATOMIC COMMIT: a snapshot becomes visible by renaming a staged
  *    manifest into its versioned name. Readers either see the whole
  *    snapshot or none of it — never a half-written file list.
  *  - OPTIMISTIC CONCURRENCY: two writers committing the same next
  *    version race on the rename; the filesystem lets exactly ONE win
  *    (rename-to-existing fails), the loser gets
  *    `ConcurrentModificationException` and its orphaned data files are
  *    removed. No locks, no coordination service.
  *  - SNAPSHOT ISOLATION / TIME TRAVEL: manifests and data files are
  *    immutable; a reader that resolved version N keeps a consistent view
  *    regardless of later commits, and [[readVersion]] reopens any
  *    retained version.
  *
  * Scale shape: a manifest is metadata (one line per FILE, not row); a
  * [[merge]] is one keyed shuffle over current∪updates plus a rewrite of
  * the merged files — the copy-on-write MERGE INTO. For partition-scoped
  * rewrites at 100 TB compose with `Layout.upsertPartitioned` (rewrite
  * only touched partitions) and keep this layer for the atomic visibility
  * flip; [[vacuum]] is the retention pass that unreferences old versions.
  */
object SnapshotTable {

  /** One manifest data-file entry: absolute path plus the file's row and
    * byte counts, recorded AT COMMIT TIME (the writer just produced the
    * file — its footer is hot) so `count(*)` and size statistics become
    * O(1) manifest reads instead of O(files) footer/listing RPCs at
    * query time. −1 = unknown (legacy path-only manifest lines).
    *
    * `tuple` is the file's EXACT partition tuple (Iceberg shape — see
    * [[SnapshotPartition]]): `""` means the file is not partition-scoped
    * (unpartitioned table, or a rewrite that did not re-derive tuples) —
    * such a file is never pruned by partition predicates, the usual
    * no-false-negative degradation. */
  /** `dv`/`dvRows` reference the file's DELETION VECTOR sidecar
    * ([[DeletionVectors]]) when merge-on-read deletes hit it: `dv` is
    * the sidecar's absolute path, `dvRows` its (exact) deleted-row
    * count. Empty/0 = no deletes. Readers subtract the positions; any
    * rewrite of the file drops the reference. */
  /** `addV` is the version that ADDED the file (stamped by [[commit]]
    * on entries that don't carry one yet; −1 = legacy/unknown): the
    * sequence number equality deletes resolve against — a sidecar
    * committed at version V deletes matching rows only from files with
    * `addV < V`, so a batch's own files win over its own deletes
    * (last-write-wins). Carried verbatim by every metadata-only
    * commit; any rewrite re-stamps with the rewriting version. */
  final case class FileEntry(path: String, rows: Long = -1L, bytes: Long = -1L,
                             tuple: String = "", dv: String = "",
                             dvRows: Long = 0L, addV: Long = -1L) {
    /** Live rows = recorded rows minus merge-on-read deletes; -1 when
      * the file's row count was never recorded. Does NOT account for
      * equality deletes (membership needs the data) — paths needing
      * exact counts must check [[Snapshot.eqDeletes]] applicability. */
    def liveRows: Long = if (rows < 0L) -1L else rows - dvRows
  }

  /** A resolved snapshot: version + data-file entries + metadata lines
    * ("#"-prefixed in the manifest — e.g. the streaming sink's
    * `#txn [<appId>] <batchId>` ledger entries, ATOMIC with the commit
    * because they ride the same manifest rename). */
  final case class Snapshot(version: Long, entries: Seq[FileEntry],
                            meta: Seq[String] = Seq.empty) {
    /** ABSOLUTE data-file paths. */
    def files: Seq[String] = entries.map(_.path)
    /** Total LIVE rows (merge-on-read deletes subtracted) when EVERY
      * entry carries a count; None otherwise — including when any
      * entry is subject to an EQUALITY delete (matching rows are only
      * countable by reading the data). */
    def rowCount: Option[Long] =
      if (entries.exists(e => eqDeletesFor(e).nonEmpty)) None
      else if (entries.nonEmpty && entries.forall(_.rows >= 0L))
        Some(entries.map(_.liveRows).sum)
      else if (entries.isEmpty) Some(0L)
      else None
    /** The batch-id ledger, keyed by app/query id: `#txn <id>` is the
      * default app's entry (appId = ""), `#txn <appId> <id>` is a named
      * stream's. Per-app keys are what let TWO streaming queries write
      * one table without one query's high-water mark silently no-op'ing
      * the other's batches (their batchIds are unrelated counters). */
    def txns: Map[String, Long] = meta.collect {
      case l if l.startsWith("#txn ") =>
        l.stripPrefix("#txn ").trim.split("\\s+") match {
          case Array(id) =>
            try Some("" -> id.toLong) catch { case _: NumberFormatException => None }
          case Array(app, id) =>
            try Some(app -> id.toLong) catch { case _: NumberFormatException => None }
          case _ => None
        }
    }.flatten.toMap
    /** The DEFAULT app's ledger entry, if any (compat surface). */
    def txn: Option[Long] = txns.get("")
    /** The table's partition field SPECS (`col`, `days(col)`,
      * `bucket[16](col)`), from the `#partition spec1,spec2` metadata
      * line every commit carries forward. Empty ⇒ unpartitioned. */
    def partitionSpecs: Seq[String] = meta.collectFirst {
      case l if l.startsWith("#partition ") =>
        l.stripPrefix("#partition ").trim.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
    }.getOrElse(Seq.empty)
    /** Parsed partition fields. */
    def partitionFields: Seq[SnapshotPartition.PartitionField] =
      partitionSpecs.map(SnapshotPartition.parseField)
    /** The fields' SOURCE columns (what writes must carry and the DSv2
      * write clusters on for identity specs). */
    def partitionCols: Seq[String] = partitionFields.map(_.col)
    /** The table's SORT ORDER columns (`#sort c1,c2` metadata line,
      * carried forward like the partition spec): every write path sorts
      * rows by these within each task/partition before staging, so each
      * data file covers a tight [min,max] range and `statsCols`
      * skipping keeps working across appends WITHOUT re-clustering
      * compaction — Iceberg's sortedBy, ascending. */
    /** Row-level SQL write modes (`#rowlevel delete=merge-on-read,...`
      * metadata line, carried forward like the partition spec): maps
      * `delete`/`update`/`merge` to `copy-on-write` (default) or
      * `merge-on-read` (deletion vectors). */
    def rowLevelModes: Map[String, String] = meta.collectFirst {
      case l if l.startsWith("#rowlevel ") =>
        l.stripPrefix("#rowlevel ").trim.split(",").toSeq
          .map(_.trim.split("=", 2)).collect {
            case Array(k, v) if k.nonEmpty && v.nonEmpty => k -> v
          }.toMap
    }.getOrElse(Map.empty)
    def sortCols: Seq[String] = meta.collectFirst {
      case l if l.startsWith("#sort ") =>
        l.stripPrefix("#sort ").trim.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
    }.getOrElse(Seq.empty)
    /** Files FULLY deleted by a merge-on-read commit in THIS version
      * (`#removed <path>` — per-version delta metadata, NOT carried
      * forward by [[nextMeta]]): lets the row-level change feed
      * attribute the manifest removal as deletes of the file's last
      * live rows instead of refusing it as an opaque rewrite.
      * Normalized paths. */
    def removedFiles: Set[String] = meta.collect {
      case l if l.startsWith("#removed ") =>
        norm(l.stripPrefix("#removed ").trim)
    }.toSet
    /** Per-file UPDATE-PREIMAGE ordinals of THIS version
      * (`#updv <file>\t<sidecar>`, per-version delta metadata): the
      * subset of the version's fresh deletes that were the delete-half
      * of an UPDATE — the change feed types them `update_preimage`.
      * Normalized file → sidecar path. */
    def updVectors: Map[String, String] = meta.collect {
      case l if l.startsWith("#updv ") =>
        l.stripPrefix("#updv ").split("\t") match {
          case Array(f, p) => Some(norm(f) -> p)
          case _ => None
        }
    }.flatten.toMap
    /** Data files added in THIS version holding only UPDATE POSTIMAGES
      * (`#updfile <path>`, per-version delta metadata): the change feed
      * types their rows `update_postimage` instead of `insert`.
      * Normalized paths. */
    def updFiles: Set[String] = meta.collect {
      case l if l.startsWith("#updfile ") =>
        norm(l.stripPrefix("#updfile ").trim)
    }.toSet
    /** EQUALITY-DELETE sidecars in force (`#eqdelete <path>\t<version>
      * \t<rows>\t<keyCols CSV>`, CARRIED FORWARD by every commit until
      * no retained file predates them): a sidecar deletes matching-key
      * rows from files with `addV < version` — the streaming-upsert
      * read contract ([[EqualityDeletes]]). */
    lazy val eqDeletes: Seq[(String, Long, Long, Seq[String])] = meta.collect {
      case l if l.startsWith("#eqdelete ") =>
        l.stripPrefix("#eqdelete ").split("\t") match {
          case arr if arr.length >= 4 =>
            (arr(1).toLongOption, arr(2).toLongOption) match {
              case (Some(ver), Some(rows)) =>
                Some((arr(0), ver, rows,
                  arr(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq))
              case _ => None
            }
          case _ => None
        }
    }.flatten
    /** Optional per-sidecar KEY RANGE (6-field `#eqdelete` form, fields
      * 5/6 = min/max of the single key column over the sink's
      * cast-to-double domain — the SAME domain the stats sidecar
      * records per file): sidecar → (min, max). What lets scans prove
      * a file's key range disjoint from an epoch's and skip the probe
      * entirely — the time-keyed-stream fast path. Absent for
      * multi-column or non-numeric keys (no skipping, no false
      * negatives). */
    lazy val eqDeleteRanges: Map[String, (Double, Double)] = meta.collect {
      case l if l.startsWith("#eqdelete ") =>
        l.stripPrefix("#eqdelete ").split("\t") match {
          case arr if arr.length >= 6 =>
            (arr(4).toDoubleOption, arr(5).toDoubleOption) match {
              case (Some(mn), Some(mx)) if !mn.isNaN && !mx.isNaN =>
                Some(arr(0) -> (mn, mx))
              case _ => None
            }
          case _ => None
        }
    }.flatten.toMap
    /** The eqdelete sidecars applying to `e` (committed after it). */
    def eqDeletesFor(e: FileEntry): Seq[(String, Long, Long, Seq[String])] =
      eqDeletes.filter { case (_, v, _, _) => e.addV < 0L || e.addV < v }
    /** Column RENAME/DROP events in force (`#colmap <version>\t<kind>\t
      * <a>[\t<b>]`, kind = rename|drop) — the per-version lineage that
      * lets readers resolve a logical column to each FILE's physical
      * name (files keep the names they were written with; see
      * [[SnapshotTable.physicalColumn]]). Carried forward until every
      * entry postdates them (compaction rewrites files under current
      * names, then commit() retires the lines). Sorted by version. */
    lazy val colEvents: Seq[(Long, String, String, String)] = meta.collect {
      case l if l.startsWith("#colmap ") =>
        l.stripPrefix("#colmap ").split("\t") match {
          case Array(v, "rename", old, nw) =>
            v.toLongOption.map(x => (x, "rename", old, nw))
          case Array(v, "drop", name) =>
            v.toLongOption.map(x => (x, "drop", name, ""))
          case _ => None
        }
    }.flatten.sortBy(_._1)
    /** Scan-planning view of the in-force equality deletes over a kept
      * entry set: (normalized file → applicable sidecar paths, the one
      * key set) — refusing mixed key sets with compact-first guidance.
      * THE shared helper for every scan builder (plain, delta rewrite,
      * group rewrite); changing applicability or the key-set rule
      * happens here once.
      *
      * `fileStats` (the version's stats map) enables KEY-RANGE
      * SKIPPING: a sidecar carrying a key range ([[eqDeleteRanges]])
      * stops applying to files whose recorded key-column min/max is
      * PROVABLY disjoint — on a time-keyed upsert stream that is most
      * of the table, which then pays ZERO per-row probe work. Missing
      * stats/range keep the probe (no false negatives). */
    def eqPlanFor(kept: Seq[FileEntry],
                  fileStats: Map[(String, String), (Double, Double)] = Map.empty)
        : (Map[String, Seq[String]], Seq[String]) = {
      def rangeApplies(e: FileEntry, path: String, ks: Seq[String]): Boolean =
        eqRangeApplies(eqDeleteRanges.get(path),
          if (ks.size == 1) fileStats.get((norm(e.path), ks.head)) else None)
      val byFile = kept.flatMap { e =>
        val ds = eqDeletesFor(e).collect {
          case (p, _, _, ks) if rangeApplies(e, p, ks) => p
        }
        if (ds.isEmpty) None else Some(norm(e.path) -> ds)
      }.toMap
      // the key-set rule stays over the UNSKIPPED applicability (a
      // range-skipped sidecar still forbids a mixed-key-set table)
      val keySets = kept.flatMap(e => eqDeletesFor(e).map(_._4)).distinct
      require(keySets.size <= 1,
        s"equality deletes with differing key sets in force: $keySets " +
          "(compact the table before changing upsert keys)")
      (byFile, keySets.headOption.getOrElse(Seq.empty))
    }
  }

  /** THE key-range disjointness test — shared by every eq-delete scan
    * planner (connector [[Snapshot.eqPlanFor]] and the library
    * [[readEntries]]): a sidecar with a recorded key range stops
    * applying to a file whose stats prove its key-column values
    * PROVABLY disjoint. Both bounds come through the SAME monotone
    * cast-to-double map (writer tracks it, collectStats records it),
    * so rounding can never prove a true overlap disjoint. Missing
    * range or stats ⇒ applies (probe kept — no false negatives). */
  private[storage] def eqRangeApplies(range: Option[(Double, Double)],
                                      fstat: Option[(Double, Double)]): Boolean =
    (range, fstat) match {
      case (Some((dmn, dmx)), Some((fmn, fmx))) => dmx >= fmn && dmn <= fmx
      case _ => true
    }

  /** Resolve a LOGICAL column of the head schema to the PHYSICAL name a
    * file added at `addV` was written with, by walking the rename/drop
    * events committed AFTER the file backwards from the head:
    *  - `rename old→new` at v: a column named `new` above v was named
    *    `old` below; a column named `old` above v is a DIFFERENT column
    *    (the name was freed at v) — files below v must not serve it;
    *  - `drop name` at v: a column named `name` above v was (re)created
    *    after the drop — files below v hold the DROPPED lineage and
    *    must not serve it.
    * None ⇒ the file has no physical column for this logical one (read
    * as null). Files with addV<0 (legacy) predate every event. */
  private[storage] def physicalColumn(events: Seq[(Long, String, String, String)],
                                      addV: Long, logical: String): Option[String] = {
    var phys = logical
    val it = events.filter(e => addV < 0L || e._1 > addV)
      .sortBy(-_._1).iterator
    while (it.hasNext) {
      it.next() match {
        case (_, "rename", old, nw) =>
          if (phys == nw) phys = old
          else if (phys == old) return None
        case (_, "drop", name, _) =>
          if (phys == name) return None
        case _ => ()
      }
    }
    Some(phys)
  }

  /** Per-file logical→physical resolution for `cols` under the
    * snapshot's rename/drop events — ONLY files needing a non-identity
    * mapping appear (the common, no-DDL table maps to an empty result
    * and pays nothing). Value: logical → Some(physical) | None (null). */
  private[storage] def colMapFor(snap: Snapshot, cols: Seq[String])
      : Map[String, Map[String, Option[String]]] = {
    if (snap.colEvents.isEmpty) return Map.empty
    snap.entries.flatMap { e =>
      val m = cols.map(c => c -> physicalColumn(snap.colEvents, e.addV, c)).toMap
      if (m.forall { case (c, p) => p.contains(c) }) None
      else Some(norm(e.path) -> m)
    }.toMap
  }

  /** THE `#eqdelete` manifest-line renderer — parsing lives in
    * [[Snapshot.eqDeletes]]/[[Snapshot.eqDeleteRanges]]; every writer
    * renders through here (nextMeta/restore carry lines RAW, so the
    * optional range survives untouched). `range` = the sidecar keys'
    * min/max in the cast-to-double stats domain, single numeric/
    * timestamp key columns only. */
  def eqDeleteLine(path: String, version: Long, rows: Long,
                   keys: Seq[String],
                   range: Option[(Double, Double)] = None): String =
    s"#eqdelete $path\t$version\t$rows\t${keys.mkString(",")}" +
      range.map { case (mn, mx) => s"\t$mn\t$mx" }.getOrElse("")

  /** The `#partition` manifest metadata line for field `specs` (empty ⇒
    * none). */
  private[storage] def partitionMeta(specs: Seq[String]): Seq[String] =
    if (specs.isEmpty) Seq.empty else Seq(s"#partition ${specs.mkString(",")}")

  /** The `#sort` manifest metadata line (empty ⇒ no declared order). */
  private[storage] def sortMeta(cols: Seq[String]): Seq[String] =
    if (cols.isEmpty) Seq.empty else Seq(s"#sort ${cols.mkString(",")}")

  /** The `#rowlevel` manifest metadata line (empty ⇒ all defaults). */
  private[storage] def rowLevelMeta(modes: Map[String, String]): Seq[String] = {
    modes.foreach { case (k, v) =>
      require(Set("delete", "update", "merge")(k) &&
        Set("copy-on-write", "merge-on-read")(v),
        s"unsupported row-level mode $k=$v (delete/update/merge = " +
          "copy-on-write|merge-on-read)")
    }
    if (modes.isEmpty) Seq.empty
    else Seq(s"#rowlevel ${modes.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString(",")}")
  }

  /** Refuse a bad partition spec loudly at create time: unknown source
    * column, transform/type mismatch, or two fields over one source
    * column (the pruner maps each source column to ONE domain). */
  private[storage] def validatePartitionSpecs(
      specs: Seq[String],
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val fields = specs.map(SnapshotPartition.parseField)
    require(fields.map(_.col).distinct.length == fields.length,
      s"at most one partition field per source column: $specs")
    fields.foreach { f =>
      val sf = schema.fields.find(_.name == f.col).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '${f.col}' not in ${schema.fieldNames.mkString(",")}"))
      require(SnapshotPartition.supportedField(f, sf.dataType),
        s"partition field '${f.key}' unsupported over type ${sf.dataType}")
    }
  }

  /** Age after which a fallback-path commit lock left by a crashed writer
    * is taken over (the commit-point flip it guards is milliseconds). */
  private val lockStaleMs = 60000L

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir(root: String) = new Path(root, "_snapshots")
  private def manifestPath(root: String, v: Long) =
    new Path(snapDir(root), f"v$v%020d.manifest")
  private def statsPath(root: String, v: Long) =
    new Path(snapDir(root), f"v$v%020d.stats")
  private def schemaPath(root: String, v: Long) =
    new Path(snapDir(root), f"v$v%020d.schema")

  /** Scheme-free normal form so stats keys match manifest paths whatever
    * prefix (`file:`, `file://`) each API layer used. */
  private[storage] def norm(p: String): String = new Path(p).toUri.getPath

  /** Scheme-free URL-ENCODED form — the join-key twin of [[norm]] for
    * `_metadata.file_path` values: Spark reports a file's SparkPath
    * string, i.e. `path.toUri`'s PERCENT-ENCODED rendering, so a driver
    * key built from the decoded [[norm]] silently stops matching the
    * moment a table root contains a space/`%`. `toUri.getRawPath` is
    * byte-identical to the path component Spark reports (both sides go
    * through the same `Path → URI` encoder); for the common
    * reserved-char-free path the two forms coincide. */
  private[storage] def encNorm(p: String): String = new Path(p).toUri.getRawPath

  /** [[norm]] for strings Spark REPORTS (`input_file_name()`,
    * `_metadata.file_path`): those arrive percent-ENCODED, so they must
    * be URI-decoded before they can key anything that [[norm]]-keyed
    * manifest paths will look up — on a root with a space/`%`, keying
    * the raw string silently disconnects stats from every consumer
    * (data skipping, NDV, metadata-delete proofs all fail safe but
    * OFF). Non-URI input (no scheme, reserved chars unencoded) falls
    * back to [[norm]]. */
  private[storage] def decNorm(p: String): String =
    try {
      val u = new java.net.URI(p)
      Option(u.getPath).filter(_.nonEmpty).getOrElse(norm(p))
    } catch { case _: java.net.URISyntaxException => norm(p) }

  private def listParquetStatuses(f: FileSystem,
                                  dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val it = f.listFiles(dir, true)
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) out += st
    }
    out.result().sortBy(_.getPath.toString)
  }

  private def listParquet(f: FileSystem, dir: Path): Seq[String] =
    listParquetStatuses(f, dir).map(_.getPath.toString)

  /** Stage `df` as new immutable data files under `<root>/data/<uuid>`;
    * returns their manifest entries (path + row/byte counts — bytes from
    * the listing, rows from one hot footer read per just-written file).
    * Nothing is visible until a commit.
    *
    * With `partitionCols` set the staging write goes through Spark's own
    * dynamic-partition writer on SHADOW canonical-string columns
    * (`graft_part_canonical` — the Iceberg shape, not the Hive one: the
    * REAL columns stay in every data file, only the shadows become
    * directories), which guarantees each file covers exactly ONE
    * partition tuple; the tuple is decoded back off the directory
    * segments into the manifest entry. */
  private def writeData(spark: SparkSession, root: String, df: DataFrame,
                        partitionSpecs: Seq[String] = Seq.empty,
                        sortCols: Seq[String] = Seq.empty,
                        clusterToTuples: Boolean = true): Seq[FileEntry] = {
    val dir = new Path(new Path(root, "data"), java.util.UUID.randomUUID().toString)
    val keys = partitionSpecs.map(s => SnapshotPartition.parseField(s).key)
    if (partitionSpecs.isEmpty) {
      // declared sort order: each task's rows sorted before staging, so
      // every file covers a tight range of the sort columns
      val out = if (sortCols.isEmpty) df
        else df.sortWithinPartitions(sortCols.map(col): _*)
      out.write.parquet(dir.toString)
    } else {
      graft.functions.expressions.GraftFunctions.register(df.sparkSession)
      // the 'v' prefix keeps every non-null value out of the writer's
      // null-directory namespace: a DATA value equal to Spark's default
      // partition token (or the empty string, which Spark also writes as
      // that token) must not decode back as SQL NULL — that would be a
      // false-NEGATIVE prune, i.e. wrong results, not just a slow scan
      val staged = partitionSpecs.foldLeft(df) { (d, spec) =>
        val f = SnapshotPartition.parseField(spec)
        d.withColumn(shadowName(f.key),
          org.apache.spark.sql.functions.expr(
            s"concat('v', graft_part_field('${f.transform}', ${f.n}, `${f.col}`))"))
      }
      // hash-cluster whole tuples over the shuffle width (Iceberg's
      // hash distribution, same as the DSv2 write) so each partition
      // value lands in ONE task → one file per tuple per write, not
      // one per (task, tuple); callers that already clustered
      // (compaction's explicit repartition) skip the extra shuffle
      val clustered =
        if (clusterToTuples)
          staged.repartition(keys.map(k => col(shadowName(k))): _*)
        else staged
      // sorting by (shadows, sortCols) satisfies the dynamic-partition
      // writer's required ordering as a PREFIX, so it skips its own
      // sort and the secondary order reaches the files
      val sorted = if (sortCols.isEmpty) clustered
        else clustered.sortWithinPartitions(
          (keys.map(shadowName) ++ sortCols).map(col): _*)
      sorted.write.partitionBy(keys.map(shadowName): _*)
        .parquet(dir.toString)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    listParquetStatuses(fs(spark, root), dir).map { st =>
      val rows =
        try {
          val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
          try fr.getRecordCount finally fr.close()
        } catch { case _: Exception => -1L } // unknown, never wrong
      FileEntry(st.getPath.toString, rows, st.getLen,
        tuple = if (partitionSpecs.isEmpty) ""
                else tupleFromPath(st.getPath, keys))
    }
  }

  private def shadowName(key: String): String = s"__gp_$key"

  /** Decode a staged file's partition tuple from its directory segments
    * (`.../__gp_c=<hive-escaped canonical>/part-*.parquet`). Spark's
    * writer Hive-escapes directory values and spells SQL NULL as its
    * default-partition token; both are undone here and re-encoded in the
    * manifest's own tuple format. A file missing a shadow segment (never
    * produced by the write above) gets an empty tuple — kept forever,
    * the no-false-negative degradation. */
  private[storage] def tupleFromPath(file: Path, keys: Seq[String]): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val found = scala.collection.mutable.Map.empty[String, Option[String]]
    var p = file.getParent
    while (p != null && p.getName.startsWith("__gp_") && p.getName.contains('=')) {
      val seg = p.getName
      val i = seg.indexOf('=')
      val raw = seg.substring(i + 1)
      // the key side is Hive-escaped too (transform specs carry parens)
      val key = ExternalCatalogUtils.unescapePathName(seg.substring(0, i))
        .stripPrefix("__gp_")
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
        found(key) = None
      else {
        val un = ExternalCatalogUtils.unescapePathName(raw)
        // every non-null shadow value carries the 'v' sentinel (see the
        // staging write); anything else is malformed → no tuple
        if (!un.startsWith("v")) return ""
        found(key) = Some(un.substring(1))
      }
      p = p.getParent
    }
    if (keys.forall(found.contains))
      SnapshotPartition.encodeTuple(keys, keys.map(found))
    else ""
  }

  /** Atomically publish `files` as version `v`. The staged manifest is
    * fully written and flushed FIRST; an atomic fail-if-exists
    * publication is the commit point. Throws
    * `ConcurrentModificationException` when `v` already exists — i.e.
    * another writer won the race from the same base snapshot.
    *
    * The publication primitive is filesystem-specific because POSIX
    * `rename(2)` atomically REPLACES an existing destination (a plain
    * rename on the local filesystem would let BOTH racing committers
    * "succeed", silently losing one commit): on the LOCAL filesystem
    * (detected from the RESOLVED FileSystem's scheme — a scheme-less
    * path may resolve to HDFS via fs.defaultFS, so the raw URI must not
    * decide) the flip is `Files.createLink` — a hard link is
    * O_EXCL-atomic, exactly one linker wins — falling back to
    * exists+rename on mounts without hard-link support (some NFS/FUSE;
    * weaker, pre-checked). On HDFS-like stores `rename` is already
    * atomic-no-overwrite (returns false when the destination exists).
    * Object stores need a conditional-put LogStore, as every table
    * format documents. */
  private[storage] def commit(spark: SparkSession, root: String, v: Long,
                              entries0: Seq[FileEntry],
                              meta0: Seq[String] = Seq.empty): Unit = {
    require(meta0.forall(_.startsWith("#")),
      s"manifest metadata lines must be #-prefixed: $meta0")
    // stamp the ADD VERSION on entries that don't carry one (new files
    // of this commit, or a legacy table's first post-upgrade commit) —
    // the sequence number equality deletes resolve against
    val entries = entries0.map(e => if (e.addV < 0L) e.copy(addV = v) else e)
    // retire equality-delete lines that no longer apply to any entry
    // (every file now postdates them — e.g. after a compaction rewrote
    // the table): the sidecar itself retires through vacuum
    val meta = meta0.filter { l =>
      if (l.startsWith("#eqdelete "))
        l.stripPrefix("#eqdelete ").split("\t") match {
          case arr if arr.length >= 4 =>
            arr(1).toLongOption.exists(eqV => entries.exists(_.addV < eqV))
          case _ => false
        }
      // column rename/drop events retire by the same rule: once every
      // entry postdates the event (compaction rewrote the table under
      // current names), no file needs the mapping
      else if (l.startsWith("#colmap "))
        l.stripPrefix("#colmap ").split("\t").headOption
          .flatMap(_.toLongOption)
          .exists(ev => entries.exists(_.addV < ev))
      else true
    }
    val files = entries.map(entryLine)
    val f = fs(spark, root)
    f.mkdirs(snapDir(root))
    val target = manifestPath(root, v)
    if (f.exists(target)) throw new java.util.ConcurrentModificationException(
      s"snapshot v$v already committed by another writer at $root")
    val tmp = new Path(snapDir(root), s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write((meta ++ files).mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val local = f.getScheme == "file"
    val won =
      if (local) {
        val targetQ = f.makeQualified(target)
        val tmpQ = f.makeQualified(tmp)
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(targetQ.toUri.getPath),
            java.nio.file.Paths.get(tmpQ.toUri.getPath))
          f.delete(tmp, false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            f.delete(tmp, false); false
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            // no hard links on this mount (some NFS/FUSE): narrow the
            // exists+rename window with a best-effort O_EXCL lock file
            // (java.nio createFile is atomic on POSIX-compliant mounts;
            // on mounts where even THAT is emulated, concurrency is
            // weaker than advertised — documented). A crashed holder's
            // lock older than `lockStaleMs` is taken over.
            val lock = java.nio.file.Paths.get(
              f.makeQualified(new Path(snapDir(root), f".v$v%020d.lock")).toUri.getPath)
            def acquire(): Boolean =
              try { java.nio.file.Files.createFile(lock); true }
              catch {
                case _: java.nio.file.FileAlreadyExistsException =>
                  try {
                    val age = System.currentTimeMillis() -
                      java.nio.file.Files.getLastModifiedTime(lock).toMillis
                    age > lockStaleMs &&
                      java.nio.file.Files.deleteIfExists(lock) &&
                      { java.nio.file.Files.createFile(lock); true }
                  } catch { case _: Exception => false }
                case _: Exception => false
              }
            if (!acquire()) false
            else try !f.exists(target) && f.rename(tmp, target)
            finally java.nio.file.Files.deleteIfExists(lock)
        }
      } else f.rename(tmp, target)
    if (!won) {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"lost the commit race for snapshot v$v at $root")
    }
  }

  /** Data line: `path<TAB>rows<TAB>bytes[<TAB>tuple[<TAB>dv<TAB>dvRows
    * [<TAB>addV]]]` (−1 = unknown count; the tuple encoding escapes
    * TAB, so fields never split). Shorter legacy forms parse back with
    * unknown fields; the 7-field form is written whenever the add
    * version is known (every post-round-13 commit stamps it). */
  private def entryLine(e: FileEntry): String =
    if (e.addV >= 0L) // 7-field form; tuple/dv kept even when empty
      s"${e.path}\t${e.rows}\t${e.bytes}\t${e.tuple}\t${e.dv}\t${e.dvRows}\t${e.addV}"
    else if (e.dv.nonEmpty) // 6-field form; tuple kept even when empty
      s"${e.path}\t${e.rows}\t${e.bytes}\t${e.tuple}\t${e.dv}\t${e.dvRows}"
    else if (e.tuple.isEmpty) s"${e.path}\t${e.rows}\t${e.bytes}"
    else s"${e.path}\t${e.rows}\t${e.bytes}\t${e.tuple}"

  /** Manifest metadata for a new commit: the base snapshot's per-app txn
    * ledger AND partition spec CARRIED FORWARD, with this commit's txn
    * entry (if any) merged in under its app id — so non-stream commits
    * (compact, plain merges, DSv2 writes) never lower any stream's
    * batch-id high-water mark or drop the table's partitioning, and
    * vacuum can retire any old version without losing either. */
  private[storage] def nextMeta(base: Option[Snapshot], txn: Option[Long],
                                txnApp: String = "",
                                rowLevelOverride: Option[Map[String, String]] = None,
                                partitionOverride: Option[Seq[String]] = None)
      : Seq[String] = {
    val m = base.map(_.txns).getOrElse(Map.empty) ++ txn.map(txnApp -> _)
    partitionMeta(partitionOverride.getOrElse(
      base.map(_.partitionSpecs).getOrElse(Seq.empty))) ++
      sortMeta(base.map(_.sortCols).getOrElse(Seq.empty)) ++
      rowLevelMeta(rowLevelOverride.getOrElse(
        base.map(_.rowLevelModes).getOrElse(Map.empty))) ++
      // equality deletes AND column rename/drop events stay in force
      // across commits (commit() retires the ones every entry
      // postdates); carried RAW so optional fields (the key range)
      // survive verbatim
      base.toSeq.flatMap(_.meta.filter(l =>
        l.startsWith("#eqdelete ") || l.startsWith("#colmap "))) ++
      m.toSeq.sortBy(_._1).map {
        case ("", id) => s"#txn $id"
        case (app, id) => s"#txn $app $id"
      }
  }

  /** The exactly-once gate, ATOMIC with the commit: a writer that
    * resolved `base` and carries a batch id at-or-below base's ledger
    * entry for its app is REPLAYING an already-committed batch — refuse
    * before any data is staged. Atomicity holds because the subsequent
    * commit succeeds only if `base` is still the latest version (the
    * version rename is the CAS); a racer that slipped a commit in between
    * forces this writer back through a fresh resolve, where the gate
    * re-fires against the NEW ledger. Closes the check-then-act window a
    * sink-side pre-check alone would leave open (zombie driver + restarted
    * driver double-committing one batch). */
  private def txnGate(base: Snapshot, txn: Option[Long], txnApp: String): Unit = {
    require(!txnApp.exists(_.isWhitespace),
      s"txnApp must not contain whitespace: '$txnApp'")
    txn.foreach { id =>
      base.txns.get(txnApp).foreach { hw =>
        if (id <= hw) throw new java.util.ConcurrentModificationException(
          s"batch $id already committed for app '$txnApp' (high-water mark $hw)")
      }
    }
  }

  private def cleanupOrphans(spark: SparkSession, root: String,
                             files: Seq[String]): Unit = {
    val f = fs(spark, root)
    val dirs = files.map(p => new Path(p).getParent).distinct
    dirs.foreach(d => f.delete(d, true))
  }

  // -------------------------------------------- file-level min/max stats

  /** Per-file min/max for numeric `statsCols` over freshly staged files —
    * the Iceberg-manifest data-skipping metadata, one aggregate scan of
    * ONLY the new files (a commit's delta, never the table). */
  /** Sketch size for the per-file NDV theta sketches: lgK=9 caps a
    * sketch at ~4 KiB (512 retained hashes, ±4.6 % error) — accurate
    * enough for broadcast-vs-shuffle decisions, small enough that a
    * wide sidecar stays metadata. */
  private val NdvLgK = 9

  private[storage] def collectStats(spark: SparkSession, files: Seq[String],
                                    statsCols: Seq[String]): Seq[String] = {
    if (statsCols.isEmpty || files.isEmpty) return Seq.empty
    graft.functions.expressions.GraftFunctions.register(spark)
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c"),
      // null count per (file, column): what lets METADATA DELETE prove a
      // file holds no null (= predicate-immune) rows — see deleteWhere
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nu_$c"),
      // mergeable NDV sketch per (file, column): unioned per scan by
      // estimateStatistics so the planner sees real distinct counts.
      // Sketched over the SAME cast-to-double domain the min/max use
      // (injective for the integral/timestamp range the 2^51 stats
      // guard already enforces), so one code path serves every
      // stats-eligible type; base64-encoded DRIVER-side (the sidecar is
      // TAB/newline-delimited — no MIME line breaks may enter a field)
      expr(s"graft_theta_agg(cast(`$c` as double), $NdvLgK)")
        .as(s"__th_$c")))
    spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { r =>
        // input_file_name() is percent-encoded; decode so the stats key
        // lands in the same [[norm]] domain every consumer looks up
        val file = decNorm(r.getString(0))
        statsCols.flatMap { c =>
          val (mn, mx) = (r.getAs[Any](s"__mn_$c"), r.getAs[Any](s"__mx_$c"))
          val nulls = Option(r.getAs[Any](s"__nu_$c"))
            .collect { case n: Long => n }
          val ndv = Option(r.getAs[Any](s"__th_$c"))
            .collect { case b: Array[Byte] if b.nonEmpty =>
              java.util.Base64.getEncoder.encodeToString(b) }
          // all-null OR NaN-touched files carry no stats line → always
          // kept. (Spark's max() ranks NaN above everything, and a NaN
          // bound would compare false against any range in pruneFiles —
          // a FALSE NEGATIVE, the one failure data skipping must never
          // have.)
          def bad(x: Any) = x == null ||
            (x.isInstanceOf[Double] && x.asInstanceOf[Double].isNaN)
          if (bad(mn) || bad(mx)) Nil
          else Seq(StatLine(file, c, mn.asInstanceOf[Double],
            mx.asInstanceOf[Double], nulls.getOrElse(-1L), ndv).line)
        }
      }
  }

  /** Stats publish uses the SAME staged-write+rename primitive as the
    * manifest: a reader resolving the just-committed version must never
    * observe a torn sidecar (it runs AFTER the commit point, so a
    * concurrent stats()/pruneFiles() is legal). A failed rename degrades
    * to no sidecar — the documented no-false-negative fallback (all
    * files kept). */
  private[storage] def writeStats(spark: SparkSession, root: String, v: Long,
                                  lines: Seq[String]): Unit = {
    if (lines.isEmpty) return
    val f = fs(spark, root)
    val tmp = new Path(snapDir(root), s".tmp-stats-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, statsPath(root, v))) f.delete(tmp, false)
  }

  /** Per-version SCHEMA sidecar — what makes ADD-COLUMN evolution work:
    * the version's logical schema can be WIDER than any individual data
    * file's (old files simply lack the new columns and read as null).
    * Published with the same staged-write+rename primitive; versions
    * without a sidecar (pre-evolution tables) fall back to
    * footer-inferred schemas, which is correct while all files agree. */
  /** File-backed tables are ALWAYS nullable in Spark (the reader cannot
    * prove non-nullness, and evolution makes old columns null in new
    * files anyway) — normalize before storing/comparing so a frame's
    * incidental nullable=false never causes spurious schema conflicts. */
  private[storage] def nullable(
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType =>
        StructType(st.fields.map(f => f.copy(dataType = nullable(f.dataType), nullable = true)))
      case at: ArrayType => ArrayType(nullable(at.elementType), containsNull = true)
      case mt: MapType =>
        MapType(nullable(mt.keyType), nullable(mt.valueType), valueContainsNull = true)
      case other => other
    }
  }
  private[storage] def nullableSchema(
      st: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    nullable(st).asInstanceOf[org.apache.spark.sql.types.StructType]

  private[storage] def writeSchema(spark: SparkSession, root: String, v: Long,
                                   schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(snapDir(root), s".tmp-schema-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(nullableSchema(schema).json
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, schemaPath(root, v))) f.delete(tmp, false)
  }

  /** The version's logical schema, when a sidecar exists. */
  def tableSchema(spark: SparkSession, root: String,
                  v: Long): Option[org.apache.spark.sql.types.StructType] = {
    val f = fs(spark, root)
    val p = schemaPath(root, v)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toByteArray
    } finally in.close()
    try Some(org.apache.spark.sql.types.DataType
      .fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
    catch { case _: Exception => None } // torn sidecar ⇒ footer fallback
  }

  /** Lossless numeric WIDENING lattice — the type changes evolution may
    * apply to an existing column. Older files keep their narrow physical
    * type and read through an upcast (Spark's parquet readers and both
    * connector readers decode INT32→long/double and FLOAT→double
    * natively); narrowing is always refused. */
  private[storage] def widens(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
      case _ => false
    }
  }

  /** ADD-COLUMN + TYPE-WIDENING evolution: the union keeps `base`'s
    * column order, appends genuinely new columns (as nullable), widens a
    * matched column to the WIDER of the two types when the change is in
    * the lossless lattice ([[widens]] — either side may be the narrow
    * one: a widened table keeps accepting old narrow writers), and
    * REFUSES everything else — rename/retype is not evolution. */
  private[storage] def evolveSchema(
      base0: org.apache.spark.sql.types.StructType,
      incoming0: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    val base = nullableSchema(base0)
    val incoming = nullableSchema(incoming0)
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val merged = base.fields.map { bf =>
      byName.get(bf.name) match {
        case Some(inf) if inf.dataType == bf.dataType => bf
        case Some(inf) if widens(bf.dataType, inf.dataType) =>
          bf.copy(dataType = inf.dataType)
        case Some(inf) if widens(inf.dataType, bf.dataType) => bf
        case Some(inf) =>
          throw new IllegalArgumentException(
            s"schema evolution supports ADD COLUMN and lossless numeric " +
              s"widening only: column '${bf.name}' changes type " +
              s"${bf.dataType} -> ${inf.dataType}")
        case None => bf
      }
    }
    val known = base.fieldNames.toSet
    val added = incoming.fields.filterNot(f => known(f.name))
    org.apache.spark.sql.types.StructType(merged ++ added)
  }

  /** (normalized file, col) → (min, max, null count; -1 = unknown —
    * legacy 4-field lines); empty when the version carries no stats
    * sidecar. */
  /** One parsed stats-sidecar line: per-(file, column) min/max, null
    * count, and (6-field form, round-12+) an optional base64 theta
    * sketch of the column's distinct values — the MERGEABLE NDV metadata
    * `estimateStatistics` unions per scan so the optimizer sees real
    * cardinalities. Older 4/5-field lines parse with no sketch. */
  private[storage] final case class StatLine(file: String, col: String,
                                             mn: Double, mx: Double,
                                             nulls: Long, ndv: Option[String]) {
    def line: String =
      s"$file\t$col\t$mn\t$mx\t$nulls" + ndv.map(s => s"\t$s").getOrElse("")
  }

  private[storage] def statsRaw(spark: SparkSession, root: String,
                                v: Long): Seq[StatLine] = {
    val f = fs(spark, root)
    val p = statsPath(root, v)
    if (!f.exists(p)) return Seq.empty
    val in = f.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toByteArray
    } finally in.close()
    // tolerate malformed/truncated lines (a torn sidecar from a pre-fix
    // writer, or a partial copy): a skipped line means that (file, col)
    // carries no stats and is always KEPT — degradation is no pruning,
    // never a wrong answer
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { line =>
        line.split("\t") match {
          case Array(file, c, mn, mx) =>
            try Some(StatLine(file, c, mn.toDouble, mx.toDouble, -1L, None))
            catch { case _: NumberFormatException => None }
          case Array(file, c, mn, mx, nu) =>
            try Some(StatLine(file, c, mn.toDouble, mx.toDouble, nu.toLong, None))
            catch { case _: NumberFormatException => None }
          case Array(file, c, mn, mx, nu, th) =>
            try Some(StatLine(file, c, mn.toDouble, mx.toDouble, nu.toLong,
              Some(th)))
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }
  }

  /** Union the base64 theta sketches into one NDV estimate (None on any
    * decode failure — degradation is "no cardinality hint", never a
    * wrong plan input). */
  private[storage] def ndvUnion(sketches: Seq[String]): Option[Long] = {
    if (sketches.isEmpty) return None
    try {
      val u = org.apache.datasketches.theta.SetOperation.builder()
        .setLogNominalEntries(NdvLgK).buildUnion()
      sketches.foreach { b64 =>
        u.union(org.apache.datasketches.memory.Memory.wrap(
          java.util.Base64.getDecoder.decode(b64)))
      }
      Some(math.max(1L, math.round(u.getResult.getEstimate)))
    } catch { case _: Exception => None }
  }

  private[storage] def statsFull(spark: SparkSession, root: String,
                                 v: Long): Map[(String, String), (Double, Double, Long)] =
    statsRaw(spark, root, v)
      .map(s => (s.file, s.col) -> (s.mn, s.mx, s.nulls)).toMap

  /** (normalized file, col) → (min, max); empty when the version carries
    * no stats sidecar. */
  def stats(spark: SparkSession, root: String,
            v: Long): Map[(String, String), (Double, Double)] =
    statsFull(spark, root, v).view.mapValues(t => (t._1, t._2)).toMap

  /** The version's stats sidecar re-serialized as lines (for carrying
    * into a successor version's sidecar) — null counts AND the NDV
    * sketch field preserved. */
  private[storage] def statsLines(spark: SparkSession, root: String,
                                  v: Long): Seq[String] =
    statsRaw(spark, root, v).map(_.line).sorted

  /** THE one keep-rule for file-level skipping — every pruning surface
    * (library pruneFiles/readPruned, the DSv2 scan) goes through it: a
    * file survives unless its stats PROVE no value can land in every
    * requested band. NO FALSE NEGATIVES: missing stats keep the file. */
  private[storage] def keepByStats(files: Seq[String],
                                   st: Map[(String, String), (Double, Double)],
                                   bounds: Map[String, (Double, Double)]): Seq[String] =
    files.filter { f =>
      bounds.forall { case (c, (lo, hi)) =>
        st.get((norm(f), c)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }

  /** The latest snapshot's files that might hold `statCol` values in
    * [lo, hi], plus the total file count. NO FALSE NEGATIVES: files
    * without stats are kept. Driver-side over the stats sidecar
    * (metadata-scale — one line per file per column). */
  def pruneFiles(spark: SparkSession, root: String, statCol: String,
                 lo: Double, hi: Double): (Seq[String], Int) = {
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val st = stats(spark, root, snap.version)
    (keepByStats(snap.files, st, Map(statCol -> (lo, hi))), snap.files.size)
  }

  /** Range read through the stats sidecar: scans ONLY the candidate files
    * then applies the exact predicate (stats false positives cost I/O,
    * never correctness) — the snapshot layer's half of data skipping; the
    * per-row-group half is parquet's own min/max pushdown inside each
    * kept file. */
  /** The two [[readEntries]] inputs that enable equality-delete key-range
    * skipping — loaded only when some in-force sidecar actually carries
    * a range (the stats sidecar read is otherwise skipped). */
  private def eqSkipInputs(spark: SparkSession, root: String, s: Snapshot)
      : (Map[String, (Double, Double)], Map[(String, String), (Double, Double)]) =
    if (s.eqDeleteRanges.isEmpty) (Map.empty, Map.empty)
    else (s.eqDeleteRanges, stats(spark, root, s.version))

  def readPruned(spark: SparkSession, root: String, statCol: String,
                 lo: Double, hi: Double): DataFrame = {
    // one snapshot resolution for files, stats AND schema — a commit
    // landing mid-call cannot mix versions
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val st = stats(spark, root, snap.version)
    val keep = keepByStats(snap.files, st, Map(statCol -> (lo, hi)))
    val schema = tableSchema(spark, root, snap.version)
    val base =
      if (keep.isEmpty)
        readEntries(spark, snap.entries, schema, snap.eqDeletes,
          snap.eqDeleteRanges, st, snap.colEvents).where(lit(false))
      else {
        val keepSet = keep.map(norm).toSet
        readEntries(spark, snap.entries.filter(e => keepSet(norm(e.path))),
          schema, snap.eqDeletes, snap.eqDeleteRanges, st, snap.colEvents)
      }
    base.where(col(statCol).cast("double") >= lo &&
      col(statCol).cast("double") <= hi)
  }

  /** One history row per retained version: (version, commit time = the
    * manifest's mtime, file count, total bytes, the streaming sink's
    * default-app batch id if carried, schema-sidecar presence, total
    * rows). Pure driver-side metadata — shared by [[history]] and the
    * connector's `option("history", true)` read. */
  private[storage] def historyRows(spark: SparkSession, root: String)
      : Seq[(Long, java.sql.Timestamp, Long, Long, Option[Long], Boolean,
             Option[Long], Long, Option[Double])] = {
    val f = fs(spark, root)
    val sizes: Map[String, Long] = {
      val dirs = versions(spark, root)
        .flatMap(v => snapshot(spark, root, v).files)
        .map(p => new Path(p).getParent).distinct
      dirs.flatMap { d =>
        try f.listStatus(d).toSeq.map(s => norm(s.getPath.toString) -> s.getLen)
        catch { case _: java.io.IOException => Seq.empty }
      }.toMap
    }
    versions(spark, root).map { v =>
      val snap = snapshot(spark, root, v)
      val bytes = snap.entries.map { e =>
        if (e.bytes >= 0L) e.bytes else sizes.getOrElse(norm(e.path), 0L)
      }.sum
      // UPSERT DEBT per version: equality-delete keys in force / recorded
      // file rows — the maintenance gauge ("compact when this grows")
      // whose bound the streaming sink's maxUpsertDebt option enforces.
      // Debt is measured against RAW recorded rows (not key-matched live
      // rows, which are uncountable without reading the data).
      val eqKeys = snap.eqDeletes.map(_._3).sum
      val debt: Option[Double] =
        if (eqKeys == 0L) Some(0.0)
        else if (snap.entries.nonEmpty && snap.entries.forall(_.rows >= 0L)) {
          val rows = snap.entries.map(_.liveRows).sum
          Some(if (rows > 0L) eqKeys.toDouble / rows else Double.PositiveInfinity)
        } else None
      (v, new java.sql.Timestamp(
          f.getFileStatus(manifestPath(root, v)).getModificationTime),
        snap.files.size.toLong,
        bytes,
        snap.txn,
        f.exists(schemaPath(root, v)),
        snap.rowCount,
        eqKeys,
        debt)
    }
  }

  /** DESCRIBE HISTORY: one row per retained version. Driver-side
    * metadata only. Also reachable as plain SQL through the connector:
    * `spark.read.format("graft-snapshot").option("history", true)
    * .load(root)`. */
  def history(spark: SparkSession, root: String): DataFrame = {
    val sq = spark
    import sq.implicits._
    historyRows(spark, root)
      .toDF("version", "committed_at", "n_files", "total_bytes",
        "txn_batch", "has_schema", "total_rows", "eq_keys_in_force",
        "upsert_debt")
  }

  /** CHANGE FEED (file granularity): the data files ADDED by versions in
    * `(fromV, toV]` — the append-only change stream between two
    * snapshots. A version that REMOVED files (merge / compact / SQL
    * row-level rewrite / truncate) cannot be represented as appended
    * rows and throws, pointing at [[graft.operators.Cdc.snapshotDiff]]
    * for the row-level diff — unless `ignoreRewrites` is set, which
    * emits rewrite versions' ADDED files too (rewritten rows appear as
    * fresh inserts; the caller accepts duplicates, exactly the upstream
    * formats' ignoreChanges contract).
    *
    * `fromV = 0` means "from the beginning" (v1's files are the first
    * change). `fromV` must be 0 or a retained version — the diff is
    * anchored on its file set. Gaps from vacuumed intermediate versions
    * telescope correctly (net adds across the gap). Metadata-scale:
    * manifest reads only. */
  /** Change feeds emit rows under the WINDOW-END schema; a column
    * rename/drop inside the window would mean different versions'
    * entries disagree on what a name denotes — refuse with the
    * keyed-diff guidance instead of emitting rows whose columns
    * silently changed meaning mid-window. A window entirely AFTER the
    * DDL is fine (every in-window entry postdates the event). */
  private def refuseColDdlInWindow(spark: SparkSession, root: String,
                                   fromV: Long, toV: Long): Unit = {
    val retained = versions(spark, root).filter(_ <= toV)
    if (retained.isEmpty) return
    val crossed = snapshot(spark, root, retained.max).colEvents
      .filter(e => e._1 > fromV && e._1 <= toV)
    if (crossed.nonEmpty) throw new UnsupportedOperationException(
      s"change feed window ($fromV, $toV] crosses column " +
        s"rename/drop event(s) ${crossed.map(_._1).mkString(",")} at " +
        s"$root — start the feed after the DDL version, or diff the " +
        "versions with Cdc.snapshotDiff")
  }

  def changedEntries(spark: SparkSession, root: String, fromV: Long, toV: Long,
                     ignoreRewrites: Boolean = false): Seq[FileEntry] = {
    require(fromV >= 0 && toV >= fromV,
      s"need 0 <= fromV <= toV, got fromV=$fromV toV=$toV")
    val vs = versions(spark, root)
    require(fromV == 0 || vs.contains(fromV),
      s"change-feed base v$fromV is not a retained version at $root " +
        s"(retained: ${vs.mkString(",")})")
    refuseColDdlInWindow(spark, root, fromV, toV)
    var prev: Map[String, String] =
      if (fromV == 0) Map.empty
      else snapshot(spark, root, fromV).entries
        .map(e => norm(e.path) -> e.dv).toMap
    var prevEq: Set[String] =
      if (fromV == 0) Set.empty
      else snapshot(spark, root, fromV).eqDeletes.map(_._1).toSet
    vs.filter(v => v > fromV && v <= toV).flatMap { v =>
      val snapV = snapshot(spark, root, v)
      val cur = snapV.entries
      val curMap = cur.map(e => norm(e.path) -> e.dv).toMap
      val removed = prev.keySet -- curMap.keySet
      // a retained file whose DELETION VECTOR changed is a delete in
      // disguise — silently emitting nothing would hide it from the
      // feed, so it refuses exactly like a copy-on-write rewrite. A
      // NEW equality-delete sidecar is the same disguise (key-matching
      // rows of older files silently died this version).
      val dvDrift = curMap.count { case (p, dv) => prev.get(p).exists(_ != dv) } +
        (snapV.eqDeletes.map(_._1).toSet -- prevEq).size
      val added = cur.filterNot(e => prev.contains(norm(e.path)))
      prev = curMap
      prevEq = snapV.eqDeletes.map(_._1).toSet
      if ((removed.nonEmpty || dvDrift > 0) && !ignoreRewrites)
        throw new UnsupportedOperationException(
          s"version $v at $root removed/rewrote ${removed.size} file(s) and " +
            s"merge-on-read-deleted from $dvDrift; an append-only change " +
            "feed cannot represent a delete — diff the versions row-level " +
            "with Cdc.snapshotDiff(readVersion(prev), readVersion(v), keys), " +
            "or pass ignoreRewrites=true to stream rewrite versions' added " +
            "files (re-delivers rewritten rows, skips deletes)")
      added
    }
  }

  /** The ROW-LEVEL change feed (CDF): every change in `(fromV, toV]` as
    * a typed row — the table's columns plus `_change_type`
    * ('insert' | 'delete') and `_commit_version` (the version that made
    * the change). What merge-on-read buys the feed: a deletion-vector
    * commit names EXACTLY the deleted ordinals, so deletes become
    * representable change rows (the appended-files walk alone could only
    * refuse them). Inserts are the appended files per version; deletes
    * are each touched file's rows at the NEWLY-vectored positions
    * (read via parquet's `_metadata` coordinates against a
    * broadcast-small position set — vectors are small by the
    * merge-on-read contract). Copy-on-write rewrites still refuse with
    * guidance (file replacement cannot be attributed row-level);
    * [[graft.operators.Cdc.snapshotDiff]] is the keyed diff for those.
    * Metadata work is manifest reads; data work is O(changed rows'
    * files). */
  /** One CDF delete set: the rows of `file` newly deleted in `version`,
    * described by SIDECAR PATHS only — positions are never materialized
    * on the driver (a 100 TB curation sweep deleting 10⁹ rows must not
    * put ~8 GB of ordinals in CDF planning). Executors compute
    * `fresh = newDv \ oldDv` as a linear sorted-merge; `newDv` empty
    * with `fullRows >= 0` means the file was FULLY deleted (the entry
    * left the manifest; fresh = `[0, fullRows) \ oldDv`). `updDv` names
    * the version's update-preimage ordinals for the file (a subset of
    * the fresh deletes) — rows at those ordinals type as
    * `update_preimage`, the rest as `delete`. */
  /** `priorEq`/`eqKeys` (full-file removals only): equality-delete
    * sidecars already in force against the file BEFORE its removal —
    * rows they had retired were already emitted as deletes at their
    * upsert epoch, so the removal's complement must filter them out or
    * the feed double-emits. */
  final case class CdfDeleteSet(file: String, oldDv: String, newDv: String,
                                fullRows: Long, updDv: String, version: Long,
                                priorEq: Seq[String] = Seq.empty,
                                eqKeys: Seq[String] = Seq.empty)

  /** One in-window EQUALITY-delete epoch as it applies to one file:
    * version `version` committed the `newEq` sidecars over key columns
    * `keys`; `dvAtPrev` is the file's deletion vector at version−1
    * (rows position-dead before the epoch are not its victims). */
  final case class CdfEqEpoch(version: Long, newEq: Seq[String],
                              keys: Seq[String], dvAtPrev: String)

  /** One file's FULL in-window equality-delete exposure — the unit the
    * CDF planner ships so the file is read ONCE however many upsert
    * epochs the window holds: `epochs` is the ordered list of epochs
    * applying to the file (committed after its addV, while it was
    * live), `priorEq` the sidecars already in force at the first of
    * them (their victims predate the window). Executors attribute each
    * row to the EARLIEST epoch whose keys match it, gated on the row
    * being live (not in that epoch's `dvAtPrev`, not prior-retired).
    * Paths only — no positions or keys in driver memory. */
  final case class CdfEqFile(file: String, priorEq: Seq[String],
                             epochs: Seq[CdfEqEpoch])

  /** The row-level change sets in `(fromV, toV]`: per-version appended
    * entries (inserts, with the `update_postimage` flag from the
    * version's `#updfile` lines) and per-(file, version) delete-set
    * DESCRIPTORS (paths, not positions) — the shared walk behind
    * [[changeFeed]] and the connector's CDF scan. Driver state is
    * O(touched files). A file REMOVED by a version is attributable only
    * when that version's `#removed` line marks it as a full
    * merge-on-read delete; any other removal (a rewrite) throws. */
  private[storage] def changeSets(spark: SparkSession, root: String,
                                  fromV: Long, to: Long)
      : (Seq[(Long, FileEntry, Boolean)], Seq[CdfDeleteSet],
         Seq[CdfEqFile]) = {
    require(fromV >= 0 && to >= fromV,
      s"need 0 <= fromV <= toV, got fromV=$fromV toV=$to")
    val vs = versions(spark, root)
    require(fromV == 0 || vs.contains(fromV),
      s"change-feed base v$fromV is not a retained version at $root " +
        s"(retained: ${vs.mkString(",")})")
    var prevSnap: Option[Snapshot] =
      if (fromV == 0) None else Some(snapshot(spark, root, fromV))
    var prev: Map[String, FileEntry] =
      prevSnap.map(_.entries.map(e => norm(e.path) -> e).toMap)
        .getOrElse(Map.empty)
    val inserts = Seq.newBuilder[(Long, FileEntry, Boolean)]
    val deletes = Seq.newBuilder[CdfDeleteSet]
    // file → (original path, prior sidecars at first touch, epoch list):
    // ONE accumulated descriptor per touched file, however many upsert
    // epochs the window holds — each applicable file is read ONCE by
    // the feed, with victims attributed to their earliest matching
    // epoch executor-side (O(table + keys), not O(epochs × table))
    val eqFiles = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, Seq[String],
        scala.collection.mutable.ArrayBuffer[CdfEqEpoch])]
    // the feed reads touched files with the WINDOW-END schema: refuse
    // (a) column rename/drop DDL inside the window, and (b) descriptors
    // over files PREDATING an in-force rename/drop (their physical
    // names differ from the head's — the raw readFiles in the feed's
    // delete/eq branches would silently misread them)
    def colDdlGuard(e: FileEntry, events: Seq[(Long, String, String, String)],
                    v: Long): Unit =
      if (events.exists(ev => e.addV < 0L || e.addV < ev._1))
        throw new UnsupportedOperationException(
          s"change feed at v$v touches ${e.path}, which predates a " +
            s"column rename/drop at $root — compact the table to " +
            "materialize current names, or diff the versions with " +
            "Cdc.snapshotDiff")
    vs.filter(v => v > fromV && v <= to).foreach { v =>
      val snapV = snapshot(spark, root, v)
      if (snapV.colEvents.exists(_._1 == v))
        throw new UnsupportedOperationException(
          s"version $v at $root renamed/dropped a column; a row-level " +
            "change feed cannot span column DDL — start the feed after " +
            "it, or diff the versions with Cdc.snapshotDiff")
      // EQUALITY-delete commits (streaming-upsert epochs) ARE
      // representable row-level: the victims are the matching-key rows
      // of every file the new sidecars apply to, restricted to rows
      // live just before this version. The per-file descriptor only
      // ACCRUES the epoch here; reads happen once per file, later.
      val prevEqSet = prevSnap.map(_.eqDeletes.map(_._1).toSet)
        .getOrElse(Set.empty)
      val newEq = snapV.eqDeletes.filterNot(t => prevEqSet(t._1))
      if (newEq.nonEmpty) {
        val keySets = newEq.map(_._4).distinct
        require(keySets.size == 1,
          s"one upsert key set per version expected, got $keySets")
        val newEqPaths = newEq.map(_._1)
        prev.valuesIterator
          .filter(e => newEq.exists { case (_, ev, _, _) =>
            e.addV < 0L || e.addV < ev })
          .toSeq.sortBy(_.path).foreach { e =>
            colDdlGuard(e, snapV.colEvents, v)
            val slot = eqFiles.getOrElseUpdate(norm(e.path), {
              // prior sidecars at the file's FIRST in-window epoch:
              // everything already in force against it then — those
              // victims predate the window and must not re-emit
              (e.path, prevSnap.toSeq.flatMap(_.eqDeletesFor(e)).map(_._1),
                scala.collection.mutable.ArrayBuffer.empty[CdfEqEpoch])
            })
            slot._3 += CdfEqEpoch(v, newEqPaths, keySets.head, e.dv)
          }
      }
      val cur = snapV.entries
      val curMap = cur.map(e => norm(e.path) -> e).toMap
      val updv = snapV.updVectors
      val updf = snapV.updFiles
      val removed = prev.keySet -- curMap.keySet
      val fullDeletes = snapV.removedFiles
      val unattributed = removed -- fullDeletes
      if (unattributed.nonEmpty) throw new UnsupportedOperationException(
        s"version $v at $root removed/rewrote ${unattributed.size} file(s); a " +
          "row-level change feed cannot attribute a file replacement — " +
          "diff the versions with Cdc.snapshotDiff(readVersion(prev), " +
          "readVersion(v), keys)")
      removed.intersect(fullDeletes).toSeq.sorted.foreach { key =>
        val old = prev(key)
        prevSnap.foreach(ps => colDdlGuard(old, ps.colEvents, v))
        require(old.rows >= 0L,
          s"cannot attribute the full merge-on-read delete of $key at " +
            s"v$v: the entry never recorded a row count")
        // rows already retired by in-force equality deletes were emitted
        // at their upsert epoch — the complement must skip them
        val prior = prevSnap.toSeq.flatMap(_.eqDeletesFor(old))
        val priorKeySets = prior.map(_._4).distinct
        require(priorKeySets.size <= 1,
          s"full delete of $key at v$v under mixed equality-delete key " +
            s"sets $priorKeySets — compact before changing upsert keys")
        deletes += CdfDeleteSet(old.path, old.dv, "", old.rows,
          updv.getOrElse(key, ""), v, prior.map(_._1),
          priorKeySets.headOption.getOrElse(Seq.empty))
      }
      cur.foreach { e =>
        val key = norm(e.path)
        prev.get(key) match {
          case None => inserts += ((v, e, updf(key)))
          case Some(old) if old.dv != e.dv =>
            // a vector that DISAPPEARS while the file stays (a
            // restore() to a pre-delete version) resurrects rows — an
            // un-attributable change for a forward feed; refuse with
            // the keyed-diff guidance (a GROWN vector diffs normally;
            // resolveDeleteSet asserts old is a subset of new executor-side)
            if (e.dv.isEmpty) throw new UnsupportedOperationException(
              s"version $v at $root cleared the deletion vector of " +
                s"${e.path} (a restore/rollback): a row-level change " +
                "feed cannot represent resurrected rows - diff the " +
                "versions with Cdc.snapshotDiff(readVersion(prev), " +
                "readVersion(v), keys)")
            colDdlGuard(e, snapV.colEvents, v)
            deletes += CdfDeleteSet(e.path, old.dv, e.dv, -1L,
              updv.getOrElse(key, ""), v)
          case _ => ()
        }
      }
      prev = curMap
      prevSnap = Some(snapV)
    }
    (inserts.result(), deletes.result(),
      eqFiles.valuesIterator.map { case (p, prior, eps) =>
        CdfEqFile(p, prior, eps.toSeq)
      }.toSeq)
  }

  /** Executor-side resolution of one [[CdfDeleteSet]]: (fresh ordinals,
    * per-ordinal update-preimage flags) — both sidecar reads and the
    * sorted diff happen where the rows will be read. */
  def resolveDeleteSet(conf: Configuration, oldDv: String, newDv: String,
                       fullRows: Long, updDv: String)
      : (Array[Long], Array[Boolean]) = {
    val old =
      if (oldDv.isEmpty) Array.emptyLongArray
      else DeletionVectors.read(conf, oldDv)
    val fresh =
      if (newDv.nonEmpty) {
        val nw = DeletionVectors.read(conf, newDv)
        // old must be a subset of new (vectors only grow); a SHRUNK
        // vector (restore to an earlier state) resurrects rows, which
        // a forward change feed cannot represent
        val resurrected = DeletionVectors.diff(old, nw)
        require(resurrected.isEmpty,
          s"deletion vector shrank by ${resurrected.length} position(s) " +
            "(a restore/rollback?): the change feed cannot represent " +
            "resurrected rows - use Cdc.snapshotDiff for this window")
        DeletionVectors.diff(nw, old)
      } else DeletionVectors.complement(old, fullRows)
    val upd =
      if (updDv.isEmpty) Array.emptyLongArray
      else DeletionVectors.read(conf, updDv)
    val isUpd = new Array[Boolean](fresh.length)
    var i = 0
    var j = 0
    while (i < fresh.length && j < upd.length) {
      if (upd(j) < fresh(i)) j += 1
      else {
        if (upd(j) == fresh(i)) { isUpd(i) = true; j += 1 }
        i += 1
      }
    }
    (fresh, isUpd)
  }

  def changeFeed(spark: SparkSession, root: String, fromV: Long,
                 toV: Option[Long] = None): DataFrame = {
    val to = toV.orElse(latest(spark, root).map(_.version)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val (insertEntries, deleteSets, eqSets) = changeSets(spark, root, fromV, to)
    val schema = tableSchema(spark, root, to)
    val cols = schema.getOrElse(
      throw new IllegalStateException(s"no schema sidecar at $root"))
      .fields.map(f => col(f.name)).toSeq
    // inserts: the appended files per version (update postimages typed
    // apart). Every write path adds files with EMPTY vectors, but read
    // through the dv-aware readEntries anyway — a file that somehow
    // arrived pre-vectored must not report its dead rows as inserts.
    // Later in-window deletes appear as delete rows (the CDF contract).
    val insertDf = insertEntries.groupBy(t => (t._1, t._3)).toSeq.sortBy(_._1)
      .map { case ((v, postimage), es) =>
        readEntries(spark, es.map(_._2), schema)
          .select(cols :+ lit(if (postimage) "update_postimage" else "insert")
            .as("_change_type")
            :+ lit(v).as("_commit_version"): _*)
      }
    // deletes: the driver ships SIDECAR PATHS (O(touched files) state);
    // executors read + diff the sorted vectors and emit (file, pos,
    // version, type) keys, joined against the touched files' rows by
    // parquet _metadata coordinates. Positions never sit in driver
    // memory, and join sizing is left to AQE (a curation sweep's delete
    // set can be huge — forcing a broadcast would re-create the driver
    // bottleneck the executor-side diff removes).
    val deleteDf =
      if (deleteSets.isEmpty) Seq.empty
      else {
        val sq = spark
        import sq.implicits._
        val hconfB = spark.sparkContext.broadcast(
          new graft.storage.dsv2.SerializableHadoopConf(
            spark.sessionState.newHadoopConf()))
        val descs = deleteSets
          .map(d => (d.file, d.oldDv, d.newDv, d.fullRows, d.updDv, d.version))
        val keys = spark.createDataset(descs)
          .repartition(math.min(descs.size,
            spark.sparkContext.defaultParallelism))
          .flatMap { case (path, oldDv, newDv, fullRows, updDv, v) =>
            val c = hconfB.value.value
            val (fresh, isUpd) = resolveDeleteSet(c, oldDv, newDv, fullRows, updDv)
            val key = encNorm(path)
            fresh.iterator.zipWithIndex.map { case (pos, i) =>
              (key, pos, v, if (isUpd(i)) "update_preimage" else "delete")
            }
          }.toDF("__cf_file", "__cf_pos", "__cf_v", "__cf_type")
        // read with the ORIGINAL entry paths (a normalized path would
        // resolve against the default filesystem — wrong table on s3a/
        // hdfs roots); normalization is only the JOIN KEY, via a
        // codegen-friendly builtin that strips scheme://authority
        val files = deleteSets.map(_.file).distinct
        val joined = readFiles(spark, files, schema)
          .withColumn("__cf_file", regexp_replace(col("_metadata.file_path"),
            "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""))
          .withColumn("__cf_pos", col("_metadata.row_index"))
          .join(keys, Seq("__cf_file", "__cf_pos"))
        // a FULLY-removed file may carry in-force equality deletes: its
        // key-retired rows were already emitted at their upsert epoch,
        // so the removal's complement must not re-emit them (per-file
        // anti-join on the prior sidecars' key tuples)
        // prior sidecars group BY KEY SET: different fully-removed files
        // can be covered by epochs on different key sets (legal when one
        // set was fully retired before the next began) — each group gets
        // its own canonical tuple and anti-join. A single file's priors
        // are one set (changeSets require()s it), so a file only ever
        // joins its own group; the executor require below can then only
        // fire on sidecar corruption, never on a legal history.
        val priorGroups = deleteSets.filter(_.priorEq.nonEmpty)
          .groupBy(_.eqKeys)
          .map { case (ks, ds) =>
            ks -> ds.flatMap(d => d.priorEq.map(p => (encNorm(d.file), p)))
              .distinct
          }
        val scDel = schema.get
        val filtered = priorGroups.foldLeft(joined) {
          case (df, (keyCols, pairs)) =>
            val keyTypes = keyCols.map(k => scDel(scDel.fieldIndex(k)).dataType)
            df.withColumn("__eq_key", canonKeyTuple(keyCols, keyTypes))
              .join(
                spark.createDataset(pairs).flatMap { case (f0, p) =>
                  val (ks, set) = EqualityDeletes.read(hconfB.value.value, p)
                  require(ks == keyCols,
                    s"prior sidecar $p keys $ks != $keyCols")
                  set.iterator.map(k => (f0, k))
                }.toDF("__cf_file", "__eq_key"),
                Seq("__cf_file", "__eq_key"), "left_anti")
              .drop("__eq_key")
        }
        Seq(filtered.select(cols :+ col("__cf_type").as("_change_type")
          :+ col("__cf_v").as("_commit_version"): _*))
      }
    // EQUALITY-delete epochs (streaming upserts) — SINGLE PASS: each
    // applicable file is read ONCE for the whole window, however many
    // epochs it spans. Per row, the victim's commit version is the
    // EARLIEST applicable epoch containing its key (array_intersect of
    // the key's epoch list with the file's), gated on the row being
    // live then: not retired by a pre-window sidecar, not in that
    // epoch's prior deletion vector. All sidecar/vector reads are
    // executor-side; driver state is O(touched files + epochs).
    val eqDf =
      if (eqSets.isEmpty) Seq.empty
      else {
        val sq = spark
        import sq.implicits._
        val hconfB = spark.sparkContext.broadcast(
          new graft.storage.dsv2.SerializableHadoopConf(
            spark.sessionState.newHadoopConf()))
        val sc = schema.get
        // files group by their (single) key set: the sink's key-set gate
        // refuses an epoch whose keys differ from anything still in
        // force against ANY live file, so a single file only ever sees
        // ONE key set — but different files can legally carry different
        // sets inside one window (epochs on set A, A's files fully
        // removed and sidecars retired, epochs on set B). The
        // single-pass plan runs once per group; a per-file mixed set can
        // only mean manifest corruption and refuses with the keyed-diff
        // guidance.
        val byKeySet = eqSets.groupBy { d =>
          val ks = d.epochs.map(_.keys).distinct
          require(ks.size == 1,
            s"file ${d.file} spans upsert epochs with differing key " +
              s"sets $ks — diff the versions with Cdc.snapshotDiff")
          ks.head
        }
        byKeySet.toSeq.sortBy(_._1.mkString(",")).map { case (keyCols, group) =>
          val keyTypes = keyCols.map(k => sc(sc.fieldIndex(k)).dataType)
          val base = readFiles(spark, group.map(_.file), schema)
            .withColumn("__gf_file",
              regexp_replace(col("_metadata.file_path"), SchemeRe, ""))
            .withColumn("__gf_pos", col("_metadata.row_index"))
            .withColumn("__eq_key", canonKeyTuple(keyCols, keyTypes))
          // rows retired BEFORE the window (per-file prior sidecars)
          val priorPairs = group
            .flatMap(d => d.priorEq.map(p => (encNorm(d.file), p))).distinct
          val live =
            if (priorPairs.isEmpty) base
            else base.join(
              spark.createDataset(priorPairs).flatMap { case (f0, p) =>
                val (ks, set) = EqualityDeletes.read(hconfB.value.value, p)
                require(ks == keyCols, s"prior sidecar $p keys $ks != $keyCols")
                set.iterator.map(k => (f0, k))
              }.toDF("__gf_file", "__eq_key"),
              Seq("__gf_file", "__eq_key"), "left_anti")
          // key → the epoch versions that upserted it (executor reads)
          val epochSidecars = group.flatMap(_.epochs)
            .flatMap(e => e.newEq.map(p => (e.version, p))).distinct
          val keyVs = spark.createDataset(epochSidecars)
            .flatMap { case (v, p) =>
              EqualityDeletes.read(hconfB.value.value, p)._2.iterator
                .map(k => (k, v))
            }.toDF("__eq_key", "__eq_v")
            .groupBy("__eq_key")
            .agg(collect_set(col("__eq_v")).as("__eq_vs"))
          // file → its applicable epoch versions (driver metadata)
          val fileVs = group
            .map(d => (encNorm(d.file), d.epochs.map(_.version)))
            .toDF("__gf_file", "__file_vs")
          val attributed = live
            .join(keyVs, Seq("__eq_key"))
            .join(broadcast(fileVs), Seq("__gf_file"))
            .withColumn("__cv",
              array_min(array_intersect(col("__eq_vs"), col("__file_vs"))))
            .where(col("__cv").isNotNull)
          // drop rows position-dead before their attributed epoch
          val dvTriples = group.flatMap(d =>
            d.epochs.filter(_.dvAtPrev.nonEmpty)
              .map(e => (encNorm(d.file), e.version, e.dvAtPrev))).distinct
          val alive =
            if (dvTriples.isEmpty) attributed
            else attributed.join(
              spark.createDataset(dvTriples).flatMap { case (f0, v, dvp) =>
                DeletionVectors.read(hconfB.value.value, dvp).iterator
                  .map(p => (f0, v, p))
              }.toDF("__gf_file", "__cv", "__gf_pos"),
              Seq("__gf_file", "__cv", "__gf_pos"), "left_anti")
          alive.select(cols :+ lit("delete").as("_change_type")
            :+ col("__cv").as("_commit_version"): _*)
        }
      }
    val all = insertDf ++ deleteDf ++ eqDf
    if (all.isEmpty) {
      val sc = schema.get
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(sc.fields
          :+ org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType, nullable = false)
          :+ org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType, nullable = false)))
    } else all.reduce(_ unionByName _)
  }

  /** The change feed as a DataFrame: rows appended in `(fromV, toV]`,
    * read with `toV`'s schema (`toV` defaults to latest). */
  def changes(spark: SparkSession, root: String, fromV: Long,
              toV: Option[Long] = None,
              ignoreRewrites: Boolean = false): DataFrame = {
    val to = toV.orElse(latest(spark, root).map(_.version)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val entries = changedEntries(spark, root, fromV, to, ignoreRewrites)
    val schema = tableSchema(spark, root, to)
    if (entries.isEmpty) {
      val sc = schema.getOrElse(throw new IllegalStateException(
        s"empty change feed with no schema sidecar at $root"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
    } else readEntries(spark, entries, schema)
  }

  /** Rewrite every retained version's manifest and stats sidecar onto a
    * NEW table root — the metadata half of a table RENAME/move (the data
    * directory was already moved wholesale; manifests carry ABSOLUTE
    * paths, so each `<oldRoot>/data/...` entry is re-anchored under the
    * new root). Per-version rewrites are staged-then-swapped; a rename
    * is not expected to race live writers (standard DDL contract). */
  private[storage] def rebaseMetadata(spark: SparkSession, oldRoot: String,
                                      newRoot: String): Unit = {
    val f = fs(spark, newRoot)
    // re-anchor by stripping the EXACT old-root prefix — matching "the
    // first /data/ in the path" breaks any warehouse whose own path
    // contains /data/ (e.g. warehouse=/data/graft would rewrite every
    // entry to <new>/data/graft/.../data/..., an unresolvable manifest)
    val oldBase = norm(oldRoot).stripSuffix("/")
    def reanchorUnder(p: String, sub: String): Option[String] = {
      val prefix = s"$oldBase/$sub/"
      val n = norm(p)
      if (!n.startsWith(prefix)) None
      else Some(f.makeQualified(new Path(new Path(newRoot, sub),
        n.substring(prefix.length))).toString)
    }
    def reanchor(p: String): String =
      reanchorUnder(p, "data").orElse(reanchorUnder(p, "_deletes"))
        .orElse(reanchorUnder(p, "_branches")).getOrElse(p)
    versions(spark, newRoot).foreach { v =>
      val snap = snapshot(spark, newRoot, v)
      val entries = snap.entries.map(e => e.copy(path = reanchor(e.path),
        dv = if (e.dv.isEmpty) "" else reanchor(e.dv)))
      // meta lines carrying sidecar/file PATHS re-anchor too
      val meta = snap.meta.map { l =>
        if (l.startsWith("#updv ")) l.stripPrefix("#updv ").split("\t") match {
          case Array(file, p) => s"#updv ${reanchor(file)}\t${reanchor(p)}"
          case _ => l
        }
        else if (l.startsWith("#eqdelete "))
          l.stripPrefix("#eqdelete ").split("\t") match {
            case arr if arr.length >= 4 =>
              "#eqdelete " +
                (reanchor(arr(0)) +: arr.tail.toSeq).mkString("\t")
            case _ => l
          }
        else if (l.startsWith("#removed "))
          s"#removed ${reanchor(l.stripPrefix("#removed ").trim)}"
        else l
      }
      val tmp = new Path(snapDir(newRoot), s".tmp-rb-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write((meta ++ entries.map(entryLine))
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      f.delete(manifestPath(newRoot, v), false)
      require(f.rename(tmp, manifestPath(newRoot, v)),
        s"manifest rebase failed for v$v at $newRoot")
      val lines = statsLines(spark, newRoot, v)
      if (lines.nonEmpty) {
        val rebased = lines.map { l =>
          l.split("\t", 2) match {
            case Array(file, rest) => s"${norm(reanchor(file))}\t$rest"
            case _ => l
          }
        }
        f.delete(statsPath(newRoot, v), false)
        writeStats(spark, newRoot, v, rebased)
      }
    }
  }

  /** REPLACE-TABLE adoption: publish a freshly-staged table (at
    * `stageRoot`, no prior readers) as the NEXT VERSION of the table at
    * `targetRoot` — the RTAS commit. The staged data dirs are renamed
    * wholesale under the target's `data/`, then one ordinary manifest
    * CAS flips visibility: the table is never absent mid-replace, a
    * concurrent commit just retries the CAS (replace intent is
    * unconditional), and the pre-replace content keeps time-traveling.
    * The staged table's definition (partitioning, sort order, row-level
    * modes, schema) REPLACES the target's; the target's exactly-once
    * `#txn` ledger is carried so no stream's high-water mark ever
    * lowers. A crash after the dir moves leaves only unreferenced data
    * dirs (vacuum-by-age fodder), never a broken table. */
  private[storage] def adoptAsNextVersion(spark: SparkSession,
                                          stageRoot: String,
                                          targetRoot: String): Long = {
    val f = fs(spark, targetRoot)
    val stageSnap = latest(spark, stageRoot).getOrElse(
      throw new IllegalStateException(s"nothing staged at $stageRoot"))
    require(stageSnap.entries.forall(_.dv.isEmpty),
      "a freshly-staged table cannot carry deletion vectors")
    val stageSchema = tableSchema(spark, stageRoot, stageSnap.version)
    val stagePrefix = norm(stageRoot).stripSuffix("/") + "/data/"
    val rels = stageSnap.entries.map { e =>
      val n = norm(e.path)
      require(n.startsWith(stagePrefix), s"staged entry outside stage root: $n")
      n.substring(stagePrefix.length)
    }
    f.mkdirs(new Path(targetRoot, "data"))
    rels.map(_.split("/")(0)).distinct.foreach { d =>
      val from = new Path(new Path(stageRoot, "data"), d)
      val to = new Path(new Path(targetRoot, "data"), d)
      require(f.rename(from, to), s"could not adopt staged data dir $from")
    }
    def rebased(rel: String): String =
      f.makeQualified(new Path(new Path(targetRoot, "data"), rel)).toString
    val entries = stageSnap.entries.zip(rels).map { case (e, rel) =>
      e.copy(path = rebased(rel))
    }
    val relByNorm = stageSnap.entries.zip(rels)
      .map { case (e, rel) => norm(e.path) -> rel }.toMap
    val stats = statsRaw(spark, stageRoot, stageSnap.version).flatMap(l =>
      relByNorm.get(l.file).map(rel => l.copy(file = norm(rebased(rel))).line))
    val defMeta = partitionMeta(stageSnap.partitionSpecs) ++
      sortMeta(stageSnap.sortCols) ++ rowLevelMeta(stageSnap.rowLevelModes)
    var attempts = 0
    while (true) {
      val cur = latest(spark, targetRoot).getOrElse(
        throw new IllegalStateException(s"no table to replace at $targetRoot"))
      val txnLines = cur.txns.toSeq.sortBy(_._1).map {
        case ("", id) => s"#txn $id"
        case (app, id) => s"#txn $app $id"
      }
      val next = cur.version + 1
      try {
        commit(spark, targetRoot, next, entries, defMeta ++ txnLines)
        writeStats(spark, targetRoot, next, stats)
        stageSchema.foreach(writeSchema(spark, targetRoot, next, _))
        return next
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts >= 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val d = snapDir(root)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted
  }

  def snapshot(spark: SparkSession, root: String, v: Long): Snapshot = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, v))
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toByteArray
    } finally in.close()
    val lines = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val (meta, dataLines) = lines.partition(_.startsWith("#"))
    val entries = dataLines.map { l =>
      l.split("\t") match {
        case Array(p, r, b) =>
          try FileEntry(p, r.toLong, b.toLong)
          catch { case _: NumberFormatException => FileEntry(p) }
        case Array(p, r, b, t) =>
          try FileEntry(p, r.toLong, b.toLong, t)
          catch { case _: NumberFormatException => FileEntry(p) }
        case Array(p, r, b, t, dv, dvr) =>
          try FileEntry(p, r.toLong, b.toLong, t, dv, dvr.toLong)
          catch { case _: NumberFormatException => FileEntry(p) }
        case Array(p, r, b, t, dv, dvr, av) =>
          try FileEntry(p, r.toLong, b.toLong, t, dv, dvr.toLong, av.toLong)
          catch { case _: NumberFormatException => FileEntry(p) }
        case _ => FileEntry(l) // legacy path-only line
      }
    }
    Snapshot(v, entries, meta)
  }

  /** The latest committed snapshot, if any. */
  def latest(spark: SparkSession, root: String): Option[Snapshot] =
    versions(spark, root).lastOption.map(snapshot(spark, root, _))

  /** TIMESTAMP time travel: the newest version committed at or before
    * `tsMillis` (commit time = the manifest's mtime, the same clock
    * [[history]] reports). None ⇒ the timestamp predates the earliest
    * retained version. */
  def versionAt(spark: SparkSession, root: String, tsMillis: Long): Option[Long] = {
    val f = fs(spark, root)
    versions(spark, root).reverseIterator.find { v =>
      f.getFileStatus(manifestPath(root, v)).getModificationTime <= tsMillis
    }
  }

  /** Schema-aware file read: with a version schema, old files missing
    * evolved columns read as null (Spark's parquet reader fills absent
    * columns when given an explicit schema). */
  private def readFiles(spark: SparkSession, files: Seq[String],
                        schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    if (files.isEmpty) {
      // a legal state: TRUNCATE/overwrite-with-empty commits a zero-file
      // manifest; the schema sidecar keeps the table well-typed
      val sc = schema.getOrElse(throw new IllegalStateException(
        "empty snapshot with no schema sidecar"))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
    }
    schema match {
      case Some(sc) => spark.read.schema(sc).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
  }

  /** Entry-aware read: like [[readFiles]], but entries carrying a
    * DELETION VECTOR get their deleted positions subtracted — via
    * Spark's own parquet `_metadata.file_path`/`row_index` coordinates
    * anti-joined against the (broadcast-small) sidecar positions. Files
    * without a vector pay NOTHING (the anti-join only materializes when
    * a vector exists, and vectors are small by the merge-on-read
    * contract: big deletes take copy-on-write or the metadata path). */
  /** Scheme/authority-stripping regexp — the codegen-friendly twin of
    * [[norm]] for `_metadata.file_path` join keys. */
  private val SchemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?"

  /** [[readFiles]] with per-file COLUMN MAPPING under rename/drop
    * events: entries group by their logical→physical resolution, each
    * group reads under its PHYSICAL names and projects back to the
    * logical schema (a broken lineage — dropped, or a freed name reused
    * — reads as typed null). `withMeta` additionally projects the
    * `__gf_file`/`__gf_pos` coordinates the DV/eq joins key on (the
    * `_metadata` struct does not survive a projection, so the mapped
    * path must materialize it inside each group). A table with no
    * events (or identity mappings only) takes the plain single-scan
    * path and pays nothing. */
  private def readMappedFiles(spark: SparkSession, entries: Seq[FileEntry],
                              schema: Option[org.apache.spark.sql.types.StructType],
                              colEvents: Seq[(Long, String, String, String)],
                              withMeta: Boolean): DataFrame = {
    def metaCols(df: DataFrame): DataFrame =
      if (!withMeta) df
      else df
        .withColumn("__gf_file",
          regexp_replace(col("_metadata.file_path"), SchemeRe, ""))
        .withColumn("__gf_pos", col("_metadata.row_index"))
    val plain = colEvents.isEmpty || schema.isEmpty || entries.isEmpty ||
      entries.forall(e => schema.get.fields.forall(f =>
        physicalColumn(colEvents, e.addV, f.name).contains(f.name)))
    if (plain) return metaCols(readFiles(spark, entries.map(_.path), schema))
    val logical = schema.get
    entries.groupBy(e => logical.fields.map(f =>
        physicalColumn(colEvents, e.addV, f.name)).toSeq)
      .toSeq.sortBy(_._2.head.path)
      .map { case (phys, es) =>
        val physSchema = org.apache.spark.sql.types.StructType(
          logical.fields.zip(phys).collect {
            case (f, Some(p)) => f.copy(name = p)
          })
        val raw = metaCols(spark.read.schema(physSchema)
          .parquet(es.map(_.path): _*))
        val proj = logical.fields.zip(phys).map {
          case (f, Some(p)) => col(p).as(f.name)
          case (f, None) => lit(null).cast(f.dataType).as(f.name)
        } ++ (if (withMeta) Seq(col("__gf_file"), col("__gf_pos"))
              else Seq.empty)
        raw.select(proj.toSeq: _*)
      }.reduce(_ unionByName _)
  }

  private[storage] def readEntries(spark: SparkSession, entries: Seq[FileEntry],
                                   schema: Option[org.apache.spark.sql.types.StructType] = None,
                                   eqDeletes: Seq[(String, Long, Long, Seq[String])] = Seq.empty,
                                   eqRanges: Map[String, (Double, Double)] = Map.empty,
                                   fileStats: Map[(String, String), (Double, Double)] = Map.empty,
                                   colEvents: Seq[(Long, String, String, String)] = Seq.empty)
      : DataFrame = {
    val withDv = entries.filter(_.dv.nonEmpty)
    // per-(file, sidecar) applicability: committed after the file AND
    // not provably key-range-disjoint from it — the skip that lets a
    // time-keyed table's old files pay ZERO per-row probe work
    def applies(e: FileEntry, p: String, v: Long, ks: Seq[String]): Boolean =
      (e.addV < 0L || e.addV < v) &&
        eqRangeApplies(eqRanges.get(p),
          if (ks.size == 1) fileStats.get((norm(e.path), ks.head)) else None)
    val applicableEq = eqDeletes.filter { case (p, v, _, ks) =>
      entries.exists(e => applies(e, p, v, ks))
    }
    if (withDv.isEmpty && applicableEq.isEmpty)
      return readMappedFiles(spark, entries, schema, colEvents, withMeta = false)
    val conf = spark.sparkContext.hadoopConfiguration
    val sq = spark
    import sq.implicits._
    val keyed = readMappedFiles(spark, entries, schema, colEvents, withMeta = true)
    val cols = keyed.columns.toSeq.filterNot(Set("__gf_file", "__gf_pos"))
    // POSITION deletes: anti-join the (small) vectors' coordinates
    val dvApplied =
      if (withDv.isEmpty) keyed
      else {
        val dropped: Seq[(String, Long)] = withDv.flatMap(e =>
          DeletionVectors.read(conf, e.dv).map(p => (encNorm(e.path), p)))
        keyed.join(broadcast(dropped.toDF("__gf_file", "__gf_pos")),
          Seq("__gf_file", "__gf_pos"), "left_anti")
      }
    // EQUALITY deletes: a sidecar committed at version V kills
    // matching-key rows of files with addV < V. Sidecar contents are
    // read EXECUTOR-side into a keys frame; the anti-join's equi part
    // is the canonical key tuple, the residual the sequence comparison.
    val eqApplied =
      if (applicableEq.isEmpty) dvApplied
      else {
        val keySets = applicableEq.map(_._4).distinct
        require(keySets.size == 1,
          s"equality deletes with differing key sets in force: $keySets " +
            "(compact the table before changing upsert keys)")
        val keyCols = keySets.head
        val sc = dvApplied.schema
        val keyTypes = keyCols.map(k => sc(sc.fieldIndex(k)).dataType)
        val keyTuple = canonKeyTuple(keyCols, keyTypes)
        val hconfB = spark.sparkContext.broadcast(
          new graft.storage.dsv2.SerializableHadoopConf(
            spark.sessionState.newHadoopConf()))
        val keyRows = spark
          .createDataset(applicableEq.map(t => (t._1, t._2)))
          .flatMap { case (p, v) =>
            val (_, set) = EqualityDeletes.read(hconfB.value.value, p)
            set.iterator.map(enc => (enc, v))
          }.toDF("__eq_key_r", "__eq_v")
        // files with NO range-applicable sidecar skip the probe: their
        // key tuple stays NULL (never equi-matches), so the per-row
        // render + set probe cost lands only on files a sidecar can
        // actually touch
        val addVDf = entries.map(e =>
          (encNorm(e.path), e.addV,
            applicableEq.exists { case (p, v, _, ks) => applies(e, p, v, ks) }))
          .toDF("__gf_file", "__eq_addv", "__eq_probe")
        dvApplied
          .join(broadcast(addVDf), Seq("__gf_file"))
          .withColumn("__eq_key",
            when(col("__eq_probe"), keyTuple).otherwise(lit(null)))
          .join(keyRows,
            col("__eq_key") === col("__eq_key_r") &&
              (col("__eq_v") > col("__eq_addv") || col("__eq_addv") < 0L),
            "left_anti")
      }
    eqApplied.select(cols.map(col): _*)
  }

  /** The encoded key tuple as a COLUMN: codegen'd builtins for every
    * supported key type (string escape chain, epoch-day/micros casts),
    * with a row-at-a-time UDF fallback only for types the builtin
    * rendering cannot express (TimestampNTZ). Both must agree with the
    * sink's internal-value rendering exactly. */
  private def canonKeyTuple(keyCols: Seq[String],
                            keyTypes: Seq[org.apache.spark.sql.types.DataType])
      : org.apache.spark.sql.Column =
    EqualityDeletes.encodedTupleCol(keyTypes, keyCols.map(col)).getOrElse {
      udf { (r: org.apache.spark.sql.Row) =>
        keyCols.indices.map(i => EqualityDeletes.encodeValue(
          externalCanonical(keyTypes(i), r.get(i)))).mkString("\t")
      }.apply(struct(keyCols.map(col): _*))
    }

  /** [[EqualityDeletes.canonical]] for EXTERNAL row values (the
    * DataFrame surface hands java.sql types where readers see internal
    * days/micros) — both must render identically. */
  private def externalCanonical(dt: org.apache.spark.sql.types.DataType,
                                v: Any): String = {
    import org.apache.spark.sql.types._
    if (v == null) return null
    dt match {
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
        case d: java.time.LocalDate => d.toEpochDay.toString
        case other => other.toString
      }
      case TimestampType | TimestampNTZType => v match {
        case t: java.sql.Timestamp =>
          (t.getTime * 1000L + (t.getNanos / 1000L) % 1000L).toString
        case i: java.time.Instant =>
          (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
        case l: java.time.LocalDateTime =>
          val i = l.toInstant(java.time.ZoneOffset.UTC)
          (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
        case other => other.toString
      }
      case _ => EqualityDeletes.canonical(dt, v)
    }
  }

  /** Read the latest snapshot (snapshot-isolated: the file list is pinned
    * at resolution; later commits never affect this frame). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val s = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val (rg, fst) = eqSkipInputs(spark, root, s)
    readEntries(spark, s.entries, tableSchema(spark, root, s.version),
      s.eqDeletes, rg, fst, s.colEvents)
  }

  /** Time travel: read any retained version — with THAT version's
    * schema, so a pre-evolution version shows its original columns. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val s = snapshot(spark, root, v)
    val (rg, fst) = eqSkipInputs(spark, root, s)
    readEntries(spark, s.entries, tableSchema(spark, root, v), s.eqDeletes,
      rg, fst, s.colEvents)
  }

  /** Create the table: stage `df`, commit as v1. Fails if the table
    * already has commits. `statsCols` names numeric columns to carry
    * file-level min/max data-skipping stats for ([[readPruned]]).
    * `partitionBy` declares identity partition columns (the Iceberg
    * shape — see [[SnapshotPartition]]): every later append/merge/compact
    * keeps files tuple-pure and partition predicates prune exactly. */
  def create(spark: SparkSession, root: String, df: DataFrame,
             statsCols: Seq[String] = Seq.empty,
             txn: Option[Long] = None,
             txnApp: String = "",
             partitionBy: Seq[String] = Seq.empty,
             sortBy: Seq[String] = Seq.empty): Long = {
    require(versions(spark, root).isEmpty, s"table already exists at $root")
    validatePartitionSpecs(partitionBy, df.schema)
    sortBy.foreach(c => require(df.columns.contains(c),
      s"sortBy column '$c' not in ${df.columns.mkString(",")}"))
    val files = writeData(spark, root, df, partitionBy, sortBy)
    val st = collectStats(spark, files.map(_.path), statsCols)
    try {
      commit(spark, root, 1L, files,
        partitionMeta(partitionBy) ++ sortMeta(sortBy) ++
          nextMeta(None, txn, txnApp))
      writeStats(spark, root, 1L, st)
      writeSchema(spark, root, 1L, df.schema)
      1L
    } catch { case e: java.util.ConcurrentModificationException =>
      cleanupOrphans(spark, root, files.map(_.path)); throw e }
  }

  /** MERGE INTO, last-write-wins: one row per `keyCols` survives, the
    * highest `versionCol` wins, ties prefer the update side. Reads the
    * latest snapshot, shuffles once on the key, stages the merged files,
    * commits base+1. `expectedVersion` pins the base snapshot the caller
    * decided against (compare-and-swap): if another writer committed
    * since, the commit throws instead of silently clobbering. Returns the
    * new version. */
  /** `clusterBy` range-repartitions the merged output before writing, so
    * each new file covers a tight value range and `statsCols` skipping
    * stays effective ACROSS merges — without it the merge's hash shuffle
    * leaves every file spanning the whole domain (the reason table
    * formats re-cluster on write). */
  /** `deleteCol` adds the MERGE delete arms: when set, `updates` carries
    * a BOOLEAN column of that name and an update row with it true is a
    * TOMBSTONE — if it wins last-write-wins for its key, the key is
    * REMOVED from the new snapshot (`WHEN MATCHED THEN DELETE`; the
    * caller's predicate building the tombstone set is the `AND cond`).
    * A tombstone for an absent key is a no-op (`WHEN NOT MATCHED` has no
    * delete arm, per SQL MERGE). Earlier versions still hold the row —
    * delete-then-time-travel works like every snapshot format. */
  /** `mergeSchema = true` allows ADD-COLUMN evolution: update columns
    * absent from the table are appended (nullable) to the new version's
    * schema, current rows read null for them; update rows may also OMIT
    * table columns (null-filled). Type changes are refused. */
  /** `onStaged` is a test-injection hook invoked after the merge staged
    * its files and before the first commit attempt — the deterministic
    * way to exercise the conflict-scoped rebase (a racer commits inside
    * the window). Production callers leave the default no-op. */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
            keyCols: Seq[String], versionCol: String,
            expectedVersion: Option[Long] = None,
            statsCols: Seq[String] = Seq.empty,
            clusterBy: Option[String] = None,
            clusterFiles: Int = 0,
            deleteCol: Option[String] = None,
            mergeSchema: Boolean = false,
            txn: Option[Long] = None,
            txnApp: String = "",
            onStaged: () => Unit = () => ()): Long = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    deleteCol.foreach(c => require(updates.columns.contains(c),
      s"deleteCol '$c' not in updates columns ${updates.columns.mkString(",")}"))
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root — create() first"))
    expectedVersion.foreach { v =>
      if (v != snap.version) throw new java.util.ConcurrentModificationException(
        s"expected base v$v but latest is v${snap.version} at $root")
    }
    txnGate(snap, txn, txnApp)

    // PARTITION-SCOPED copy-on-write: when every partition SOURCE column
    // is part of the merge KEY, a key's partition is a function of the
    // key — no update can MOVE a row across partitions — so only the
    // partitions the update set touches need rewriting; every other
    // file is retained VERBATIM. This turns the COW cost from O(table)
    // into O(affected partitions): the 100 TB upsert shape. Eligibility
    // is checked per merge (a tuple-less legacy file is conservatively
    // treated as affected; partition cols outside the key fall back to
    // the always-correct full rewrite).
    val pfields = snap.partitionFields
    val scoped = pfields.nonEmpty && pfields.map(_.col).forall(keyCols.contains)
    val touchedTuples: Option[Set[String]] =
      if (!scoped) None
      else {
        graft.functions.expressions.GraftFunctions.register(spark)
        val tupleCols = pfields.map(f =>
          org.apache.spark.sql.functions.expr(
            s"graft_part_field('${f.transform}', ${f.n}, `${f.col}`)"))
        // distinct tuples of the UPDATE set — bounded by the number of
        // partitions the updates touch, a metadata-scale collect
        Some(updates.select(tupleCols: _*).distinct().collect()
          .map(r => SnapshotPartition.encodeTuple(pfields.map(_.key),
            pfields.indices.map(i => Option(r.getString(i)))))
          .toSet)
      }
    // tuple comparability is PER SPEC ERA: after partition-spec
    // evolution, a file written under an older spec has a tuple keyed
    // by the old fields — it can never string-match a current-spec
    // tuple, so it is conservatively AFFECTED (rewritten, and thereby
    // migrated to the current spec), exactly like a tuple-less file
    val curKeys = pfields.map(_.key).toSet
    def currentEra(e: FileEntry): Boolean =
      SnapshotPartition.decodeTuple(e.tuple).keySet == curKeys
    val (affected, retained) = touchedTuples match {
      case None => (snap.entries, Seq.empty[FileEntry])
      case Some(touched) =>
        snap.entries.partition(e => e.tuple.isEmpty || !currentEra(e) ||
          touched.contains(e.tuple))
    }
    val schema = tableSchema(spark, root, snap.version)
    val base =
      if (affected.nonEmpty) {
        val (rg, fst) = eqSkipInputs(spark, root, snap)
        readEntries(spark, affected, schema, snap.eqDeletes, rg, fst,
          snap.colEvents)
      }
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.getOrElse(readFiles(spark, snap.files).schema))
    // a REAL table column with the tombstone marker's name would be
    // silently clobbered and then dropped — refuse loudly instead
    deleteCol.foreach(c => require(!base.columns.contains(c),
      s"deleteCol '$c' collides with an existing table column; pick a marker " +
        "name the schema does not use"))
    if (mergeSchema) // fail fast on a type conflict, before any write
      evolveSchema(base.schema, updates.drop(deleteCol.toSeq: _*).schema)
    val cur = deleteCol.foldLeft(base.withColumn("__src", lit(0)))(
      (d, c) => d.withColumn(c, lit(false)))
    val upd = updates.withColumn("__src", lit(1))
    val survivors = cur.unionByName(upd, allowMissingColumns = mergeSchema)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc, col("__src").desc)))
      .where(col("__rn") === 1)
      .drop("__rn", "__src")
    // a winning tombstone deletes its key; the column never hits disk
    val merged = deleteCol.foldLeft(survivors)(
      (d, c) => d.where(!col(c)).drop(c))
    // explicit partition count (clusterFiles, defaulting to the REWRITE
    // SCOPE's file count): keeps the file count stable across merges and
    // stops AQE from coalescing the range shuffle into one
    // domain-spanning file
    val n = if (clusterFiles > 0) clusterFiles else math.max(affected.size, 1)
    val out = clusterBy.map(c => merged.repartitionByRange(n, col(c)))
      .getOrElse(merged)
    // a partitioned table's copy-on-write stays tuple-pure: the
    // partitioned staging write re-derives every file's tuple
    val files = writeData(spark, root, out, snap.partitionSpecs, snap.sortCols)
    onStaged()
    val freshStats = collectStats(spark, files.map(_.path), statsCols)
    val affectedNorm = affected.map(e => norm(e.path)).toSet

    /** CONFLICT-SCOPED retry: when another writer won the version CAS,
      * check whether its changes and this merge's rewrite scope are
      * PROVABLY DISJOINT PARTITIONS — then the staged files are still
      * exactly right, and the commit REBASES onto the winner (winner's
      * entries minus this merge's affected files, plus the staged
      * files) without re-running anything. Two writers back-filling
      * different partitions each pay ONE rewrite. Any overlap — or
      * anything unprovable: a non-scoped merge, a tuple-less file, a
      * schema change by the winner, a caller-pinned expectedVersion —
      * falls back to the full re-merge via the thrown CME
      * ([[mergeWithRetry]]'s loop), which is always correct. */
    def rebaseable(onto: Snapshot): Boolean = touchedTuples match {
      case None => false
      case _ if expectedVersion.isDefined => false // caller pinned the base
      case Some(touched) =>
        def safe(e: FileEntry): Boolean =
          e.tuple.nonEmpty && currentEra(e) && !touched.contains(e.tuple)
        val baseBy = snap.entries.map(e => norm(e.path) -> e).toMap
        val ontoBy = onto.entries.map(e => norm(e.path) -> e).toMap
        val removed = snap.entries.filterNot(e => ontoBy.contains(norm(e.path)))
        val added = onto.entries.filterNot(e => baseBy.contains(norm(e.path)))
        val dvChanged = onto.entries.filter(e =>
          baseBy.get(norm(e.path)).exists(_.dv != e.dv))
        (removed ++ added ++ dvChanged).forall(safe) &&
          onto.partitionSpecs == snap.partitionSpecs &&
          tableSchema(spark, root, onto.version) ==
            tableSchema(spark, root, snap.version)
    }

    var commitBase = snap
    var rebases = 0
    while (true) {
      val retainedNow =
        commitBase.entries.filterNot(e => affectedNorm(norm(e.path)))
      val st = statsLines(spark, root, commitBase.version)
        .filter(l => !affectedNorm(l.split("\t", 3)(0))) ++ freshStats
      val next = commitBase.version + 1
      try {
        commit(spark, root, next, retainedNow ++ files,
          nextMeta(Some(commitBase), txn, txnApp))
        writeStats(spark, root, next, st)
        writeSchema(spark, root, next, out.schema)
        return next
      } catch { case e: java.util.ConcurrentModificationException =>
        val winner = latest(spark, root)
        rebases += 1
        if (rebases > 5 || !winner.exists(w => w.version > commitBase.version &&
            rebaseable(w))) {
          cleanupOrphans(spark, root, files.map(_.path)); throw e
        }
        val w = winner.get
        // the winner may have advanced the exactly-once ledger: re-gate
        try txnGate(w, txn, txnApp)
        catch { case g: java.util.ConcurrentModificationException =>
          cleanupOrphans(spark, root, files.map(_.path)); throw g }
        commitBase = w
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** APPEND: stage `df` as new files and commit `base.files ++ new` as
    * version+1 — NO rewrite of existing data (contrast [[merge]]'s
    * copy-on-write). This is the 100 TB ingest shape: a micro-batch
    * append costs O(batch), never O(table). The new version's stats
    * sidecar carries the previous version's lines forward plus stats for
    * the new files, so data skipping keeps working across appends.
    * Key semantics are the caller's problem (append can introduce
    * duplicate keys — exactly like every table format's INSERT INTO);
    * use [[merge]] when upsert semantics are required. */
  /** `mergeSchema = true` allows ADD-COLUMN evolution on append: new
    * columns in `df` widen the table schema (old files read null for
    * them); `df` may also omit existing columns (its files read null).
    * With it false (default) a differing column set is refused — a
    * typo'd column name must not silently fork the schema. */
  def append(spark: SparkSession, root: String, df: DataFrame,
             expectedVersion: Option[Long] = None,
             statsCols: Seq[String] = Seq.empty,
             mergeSchema: Boolean = false,
             txn: Option[Long] = None,
             txnApp: String = ""): Long = {
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root — create() first"))
    expectedVersion.foreach { v =>
      if (v != snap.version) throw new java.util.ConcurrentModificationException(
        s"expected base v$v but latest is v${snap.version} at $root")
    }
    txnGate(snap, txn, txnApp)
    val baseSchema = tableSchema(spark, root, snap.version)
      .getOrElse(readFiles(spark, snap.files).schema)
    val nextSchema =
      if (mergeSchema) evolveSchema(baseSchema, df.schema)
      else {
        require(nullableSchema(df.schema).fields.map(f => (f.name, f.dataType)).toSeq ==
          nullableSchema(baseSchema).fields.map(f => (f.name, f.dataType)).toSeq,
          s"append schema ${df.schema.simpleString} != table schema " +
            s"${baseSchema.simpleString}; pass mergeSchema=true for add-column evolution")
        baseSchema
      }
    val files = writeData(spark, root, df, snap.partitionSpecs, snap.sortCols)
    val st = statsLines(spark, root, snap.version) ++
      collectStats(spark, files.map(_.path), statsCols)
    val next = snap.version + 1
    try {
      commit(spark, root, next, snap.entries ++ files,
        nextMeta(Some(snap), txn, txnApp))
      writeStats(spark, root, next, st)
      writeSchema(spark, root, next, nextSchema)
      next
    } catch { case e: java.util.ConcurrentModificationException =>
      cleanupOrphans(spark, root, files.map(_.path)); throw e }
  }

  /** OPTIMIZE / compaction: rewrite the CURRENT content into
    * `targetFiles` files (range-clustered on `clusterBy` when given, so
    * stats skipping tightens instead of degrading) and commit it as a
    * new version. Content is bit-identical — compaction is pure layout
    * work, the answer to small-file accumulation from streaming appends.
    * Old versions still time-travel to the uncompacted layout until
    * [[vacuum]] retires them. */
  /** `zorderBy = Seq(x, y)` interleaves TWO dimensions (the codegen
    * `graft_zorder` key: per-column rank-space normalization → bit
    * interleave) so files stay tight in BOTH columns and 2-D predicates
    * keep pruning after compaction — range-cluster (`clusterBy`) only
    * serves one dimension. Pass both columns in `statsCols` to record
    * the post-compact bounds. */
  def compact(spark: SparkSession, root: String, targetFiles: Int,
              clusterBy: Option[String] = None,
              statsCols: Seq[String] = Seq.empty,
              expectedVersion: Option[Long] = None,
              txn: Option[Long] = None,
              txnApp: String = "",
              zorderBy: Seq[String] = Seq.empty): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "clusterBy and zorderBy are mutually exclusive")
    require(zorderBy.isEmpty || zorderBy.length == 2,
      s"zorderBy interleaves exactly 2 columns, got $zorderBy")
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root — create() first"))
    expectedVersion.foreach { v =>
      if (v != snap.version) throw new java.util.ConcurrentModificationException(
        s"expected base v$v but latest is v${snap.version} at $root")
    }
    txnGate(snap, txn, txnApp)
    val schema = tableSchema(spark, root, snap.version)
    // DV-aware: compaction reads only LIVE rows, so merge-on-read
    // deletes MATERIALIZE away here — the rewritten files carry no
    // vectors and the columnar fast path is restored
    val (eqRg, eqFst) = eqSkipInputs(spark, root, snap)
    val cur = readEntries(spark, snap.entries, schema, snap.eqDeletes,
      eqRg, eqFst, snap.colEvents)
    val pspecs = snap.partitionSpecs
    if (pspecs.nonEmpty) {
      // a partitioned table's compaction bin-packs WITHIN partitions:
      // hash-cluster whole tuples (the TRANSFORMED field values, so a
      // day's rows stay together under days(ts)) over targetFiles
      // tasks, then the partitioned staging write emits one tuple-pure
      // file per (task, tuple) — small per-tuple file sets collapse to
      // one file each, and re-clustering on other columns (clusterBy /
      // zorderBy) is refused loudly rather than silently fragmenting
      // tuples
      require(clusterBy.isEmpty && zorderBy.isEmpty,
        "clusterBy/zorderBy compaction is not supported on a partitioned " +
          s"table (partitioned by ${pspecs.mkString(",")})")
      graft.functions.expressions.GraftFunctions.register(spark)
      val keyExprs = snap.partitionFields.map(f =>
        org.apache.spark.sql.functions.expr(
          s"graft_part_field('${f.transform}', ${f.n}, `${f.col}`)"))
      val out = cur.repartition(targetFiles, keyExprs: _*)
      val files = writeData(spark, root, out, pspecs, snap.sortCols,
        clusterToTuples = false) // already clustered, keep targetFiles tasks
      val st = collectStats(spark, files.map(_.path), statsCols)
      val next = snap.version + 1
      try {
        commit(spark, root, next, files, nextMeta(Some(snap), txn, txnApp))
        writeStats(spark, root, next, st)
        writeSchema(spark, root, next, out.schema)
        return next
      } catch { case e: java.util.ConcurrentModificationException =>
        cleanupOrphans(spark, root, files.map(_.path)); throw e }
    }
    val out = (clusterBy, zorderBy) match {
      case (Some(c), _) => cur.repartitionByRange(targetFiles, col(c))
      case (None, Seq(x, y)) =>
        graft.functions.expressions.GraftFunctions.register(spark)
        val r = cur.agg(min(col(x).cast("double")), max(col(x).cast("double")),
          min(col(y).cast("double")), max(col(y).cast("double"))).head()
        if (r.isNullAt(0) || r.isNullAt(2)) cur.repartition(targetFiles)
        else {
          def dom(lo: Double, hi: Double): (Double, Double) =
            if (hi > lo) (lo, hi) else (lo, lo + 1.0)
          val (xMin, xMax) = dom(r.getDouble(0), r.getDouble(1))
          val (yMin, yMax) = dom(r.getDouble(2), r.getDouble(3))
          val z = graft.operators.Layout.zorderKey(
            col(x), xMin, xMax, col(y), yMin, yMax)
          cur.withColumn("__z", z)
            .repartitionByRange(targetFiles, col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        }
      case _ => cur.repartition(targetFiles)
    }
    val files = writeData(spark, root, out,
      sortCols = if (clusterBy.isEmpty && zorderBy.isEmpty) snap.sortCols
                 else Seq.empty) // explicit re-clustering wins over sort order
    val st = collectStats(spark, files.map(_.path), statsCols)
    val next = snap.version + 1
    try {
      commit(spark, root, next, files, nextMeta(Some(snap), txn, txnApp))
      writeStats(spark, root, next, st)
      // compaction materializes the evolved schema into every file, and
      // the new version keeps carrying it
      writeSchema(spark, root, next, out.schema)
      next
    } catch { case e: java.util.ConcurrentModificationException =>
      cleanupOrphans(spark, root, files.map(_.path)); throw e }
  }

  /** PURGE merge-on-read deletes: rewrite ONLY the vector-bearing files
    * (live rows re-staged, vectors retired), retaining every clean file
    * verbatim — the bounded maintenance pass between small updates and
    * a full [[compact]] (Delta's `REORG ... APPLY (PURGE)` shape). Cost
    * is O(vectored files), the vectorized scan path is restored for the
    * rewritten data, and old versions keep time-traveling through their
    * own sidecars (vacuum retires the unreferenced ones later). Returns
    * the committed version — unchanged when nothing carries a vector
    * (no junk versions). */
  def purgeDeletes(spark: SparkSession, root: String,
                   expectedVersion: Option[Long] = None): Long = {
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root — create() first"))
    expectedVersion.foreach { v =>
      if (v != snap.version) throw new java.util.ConcurrentModificationException(
        s"expected base v$v but latest is v${snap.version} at $root")
    }
    val (vectored, clean) = snap.entries.partition(_.dv.nonEmpty)
    if (vectored.isEmpty) return snap.version
    val schema = tableSchema(spark, root, snap.version)
    val (eqRg, eqFst) = eqSkipInputs(spark, root, snap)
    val live = readEntries(spark, vectored, schema, snap.eqDeletes,
      eqRg, eqFst, snap.colEvents)
    val files = writeData(spark, root, live, snap.partitionSpecs, snap.sortCols)
    val raw = statsRaw(spark, root, snap.version)
    val cleanNorm = clean.map(e => norm(e.path)).toSet
    val st = raw.filter(l => cleanNorm(l.file)).map(_.line) ++
      collectStats(spark, files.map(_.path), raw.map(_.col).distinct.sorted)
    val next = snap.version + 1
    try {
      commit(spark, root, next, clean ++ files, nextMeta(Some(snap), None))
      writeStats(spark, root, next, st)
      schema.foreach(writeSchema(spark, root, next, _))
      next
    } catch { case e: java.util.ConcurrentModificationException =>
      cleanupOrphans(spark, root, files.map(_.path)); throw e }
  }

  /** The standard optimistic-concurrency loop every table format ships:
    * on losing the commit race, re-read the NEW latest snapshot and
    * re-apply the merge against it (last-write-wins keyed semantics make
    * re-application correct — the loser's updates still win their keys
    * by `versionCol`). Gives lock-free progress for N concurrent
    * writers: someone always commits, losers pay one extra rewrite.
    * Throws the final `ConcurrentModificationException` after
    * `maxAttempts` consecutive losses. */
  def mergeWithRetry(spark: SparkSession, root: String, updates: DataFrame,
                     keyCols: Seq[String], versionCol: String,
                     maxAttempts: Int = 5,
                     statsCols: Seq[String] = Seq.empty,
                     clusterBy: Option[String] = None,
                     clusterFiles: Int = 0,
                     deleteCol: Option[String] = None,
                     txn: Option[Long] = None,
                     txnApp: String = ""): Long = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 1
    while (true) {
      try return merge(spark, root, updates, keyCols, versionCol,
        expectedVersion = None, statsCols = statsCols, clusterBy = clusterBy,
        clusterFiles = clusterFiles, deleteCol = deleteCol, txn = txn,
        txnApp = txnApp)
      catch { case e: java.util.ConcurrentModificationException =>
        if (attempt >= maxAttempts) throw e
        attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retention: keep the newest `keepVersions` manifests; drop older
    * versions and every data file nothing retained references — EXCEPT
    * files younger than `graceMs`. The grace window is what keeps vacuum
    * safe against IN-FLIGHT writers: a concurrent merge has staged data
    * files that no manifest references YET, and deleting them would
    * corrupt the table the moment that writer commits. The default is
    * SEVEN DAYS (the table-format convention) — it must comfortably
    * exceed the longest write a table ever sees, because the protection
    * is keyed on file age; a 1-hour window would eat a 2-hour COW
    * rewrite's staging. Dropped-version retirement is COUPLED: a dropped
    * version's manifest, stats, and data files all retire on the
    * MANIFEST's age, so a version is either fully time-travel-readable
    * or fully gone — never a live manifest over deleted files. Returns
    * the number of data files deleted. Metadata-scale driver work. */
  /** PARTITION SPEC EVOLUTION — replace the table's `#partition` line
    * as a METADATA-ONLY version (Iceberg's spec evolution): future
    * writes cluster by and record tuples for the NEW fields; existing
    * files keep their old-era tuples untouched. Correctness holds
    * because tuples are SELF-DESCRIBING (keyed by field spec, e.g.
    * `days(ts)=123`): the pruning evaluator simply finds no domain for
    * a current-spec field in an old-era tuple, so old files degrade to
    * never-pruned — no false negatives — while new files prune under
    * the new spec. Paths that REQUIRE era-uniform tuples stay safe
    * explicitly: partition-scoped merge rewrites old-era files
    * conservatively (migrating them), and dynamic overwrite refuses
    * with compact-first guidance. A compaction rewrites everything
    * under the current spec and restores full pruning. */
  def evolvePartitionSpec(spark: SparkSession, root: String,
                          specs: Seq[String]): Long = {
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val schema = tableSchema(spark, root, snap.version).getOrElse(
      throw new IllegalStateException(
        s"partition spec evolution needs a schema sidecar at $root"))
    validatePartitionSpecs(specs, schema)
    val next = snap.version + 1
    commit(spark, root, next, snap.entries,
      nextMeta(Some(snap), None, partitionOverride = Some(specs)))
    writeStats(spark, root, next, statsLines(spark, root, snap.version))
    writeSchema(spark, root, next, schema)
    next
  }

  // ------------------------------------------------------- refs (tags/branches)

  /** NAMED REFS — `<root>/_snapshots/refs`, lines `name<TAB>kind<TAB>
    * version` (kind = `tag` | `branch`): human-readable pointers into
    * the version history, the write-audit-publish primitive.
    *
    *  - a TAG is immutable (re-tagging an existing name refuses) — pin
    *    "the dataset release we trained on".
    *  - a BRANCH moves, but only FORWARD through [[fastForward]] — the
    *    WAP publish pointer: production consumers read `VERSION AS OF
    *    'main'`; ingest commits ordinary versions (invisible to those
    *    consumers); the audit reads the candidate version; publishing is
    *    ONE atomic refs update. A failed audit just never moves the
    *    branch — consumers never saw the bad data, and the unpublished
    *    versions age out through vacuum.
    *
    * Refs updates are whole-file atomic swaps (write temp + atomic
    * rename over the old refs file). [[vacuum]] always retains
    * ref-targeted versions and their files, whatever `keepVersions`
    * says — a tag outlives the retention window by design. */
  def refs(spark: SparkSession, root: String): Map[String, (String, Long)] = {
    val f = fs(spark, root)
    val p = refsPath(root)
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toByteArray
    } finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { l =>
        l.split("\t") match {
          case Array(n, k, v) =>
            try Some(n -> (k, v.toLong))
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }.toMap
  }

  private def refsPath(root: String) = new Path(snapDir(root), "refs")

  private def validRefName(name: String): Unit =
    require(name.nonEmpty && !name.exists(c => c == '\t' || c == '\n' ||
        c == '\r'),
      s"ref name must be nonempty without tab/newline: '$name'")

  /** Serialize read-modify-write ref updates with a create-exclusive
    * lock file (+ stale takeover) ON THE TABLE'S FILESYSTEM — two
    * concurrent tag/fast_forward calls, possibly from DIFFERENT
    * drivers on a shared store (HDFS), must not lose each other's
    * update through the whole-file refs overwrite. On the local
    * scheme the acquire is java.nio `createFile` (true O_EXCL — the
    * same primitive the commit fallback uses); remote filesystems use
    * their own atomic `create(path, overwrite=false)`. Object stores
    * without atomic create keep the documented single-driver
    * limitation, like the manifest commit itself. */
  private def withRefsLock[A](spark: SparkSession, root: String)(f: => A): A = {
    val fsys = fs(spark, root)
    fsys.mkdirs(snapDir(root))
    val lockP = new Path(snapDir(root), ".refs.lock")
    val local = fsys.getScheme == "file"
    val lockNio =
      if (local) java.nio.file.Paths.get(fsys.makeQualified(lockP).toUri.getPath)
      else null
    def tryAcquire(): Boolean =
      if (local)
        try { java.nio.file.Files.createFile(lockNio); true }
        catch { case _: java.io.IOException => false }
      else
        try { fsys.create(lockP, false).close(); true }
        catch { case _: java.io.IOException => false }
    def mtime(): Long =
      if (local) java.nio.file.Files.getLastModifiedTime(lockNio).toMillis
      else fsys.getFileStatus(lockP).getModificationTime
    def drop(): Unit =
      if (local) { java.nio.file.Files.deleteIfExists(lockNio); () }
      else { try fsys.delete(lockP, false) catch { case _: java.io.IOException => () }; () }
    val deadline = System.currentTimeMillis() + 10000
    var held = false
    while (!held) {
      if (tryAcquire()) held = true
      else {
        val stale = try System.currentTimeMillis() - mtime() > lockStaleMs
          catch { case _: Exception => false }
        if (stale) drop()
        else if (System.currentTimeMillis() > deadline)
          throw new java.util.ConcurrentModificationException(
            s"could not acquire the refs lock at $root")
        else Thread.sleep(50)
      }
    }
    try f finally drop()
  }

  private def writeRefs(spark: SparkSession, root: String,
                        m: Map[String, (String, Long)]): Unit = {
    val f = fs(spark, root)
    f.mkdirs(snapDir(root))
    val tmp = new Path(snapDir(root), s".refs-tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(m.toSeq.sortBy(_._1)
      .map { case (n, (k, v)) => s"$n\t$k\t$v" }
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // atomic replace: FileContext rename with OVERWRITE (HDFS/local);
    // readers see the old or the new refs file, never a mix
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      refsPath(root).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, refsPath(root),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def requireRetained(spark: SparkSession, root: String, v: Long): Unit =
    require(versions(spark, root).contains(v),
      s"version $v is not retained at $root " +
        s"(retained: ${versions(spark, root).mkString(",")})")

  /** Create an immutable tag at `v` (default: the current head). */
  def tag(spark: SparkSession, root: String, name: String,
          v: Option[Long] = None): Long = {
    validRefName(name)
    val target = v.getOrElse(latest(spark, root).map(_.version).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root")))
    requireRetained(spark, root, target)
    withRefsLock(spark, root) {
      val m = refs(spark, root)
      require(!m.contains(name),
        s"ref '$name' already exists at $root (tags are immutable; " +
          "drop it first or use a branch)")
      writeRefs(spark, root, m + (name -> ("tag", target)))
    }
    target
  }

  /** Create a movable branch at `v` (default: the current head). */
  def branch(spark: SparkSession, root: String, name: String,
             v: Option[Long] = None): Long = {
    validRefName(name)
    val target = v.getOrElse(latest(spark, root).map(_.version).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root")))
    requireRetained(spark, root, target)
    withRefsLock(spark, root) {
      val m = refs(spark, root)
      require(!m.contains(name), s"ref '$name' already exists at $root")
      writeRefs(spark, root, m + (name -> ("branch", target)))
    }
    target
  }

  /** Move branch `name` FORWARD to `toV` (default: the current head) —
    * the atomic WAP publish. Refuses on tags, on unknown refs, and on
    * a non-forward move (rollback is [[restore]] + fast_forward, which
    * keeps publish monotone and auditable). */
  def fastForward(spark: SparkSession, root: String, name: String,
                  toV: Option[Long] = None): Long = {
    val target = toV.getOrElse(latest(spark, root).map(_.version).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root")))
    requireRetained(spark, root, target)
    withRefsLock(spark, root) {
      val m = refs(spark, root)
      val (kind, cur) = m.getOrElse(name, throw new IllegalArgumentException(
        s"no ref '$name' at $root (refs: ${m.keys.toSeq.sorted.mkString(",")})"))
      require(kind == "branch", s"ref '$name' is a tag — tags never move")
      require(target >= cur,
        s"fast_forward must move forward: '$name' is at v$cur, asked v$target")
      writeRefs(spark, root, m + (name -> ("branch", target)))
    }
    target
  }

  /** Drop a ref (tag or branch). Idempotent. */
  def dropRef(spark: SparkSession, root: String, name: String): Boolean =
    withRefsLock(spark, root) {
      val m = refs(spark, root)
      if (!m.contains(name)) false
      else { writeRefs(spark, root, m - name); true }
    }

  /** Resolve a ref name to its version. */
  def resolveRef(spark: SparkSession, root: String, name: String): Option[Long] =
    refs(spark, root).get(name).map(_._2)

  // ------------------------------------------------------ WRITE BRANCHES
  //
  // A write branch is a VIRTUAL TABLE ROOT under `<root>/_branches/<name>`
  // whose `_snapshots` starts as a copy of the fork-point version — every
  // existing mechanism (CAS commits, stats/schema sidecars, equality
  // deletes, row-level SQL, the streaming sink) works on it verbatim, so
  // a branch accumulates ordinary divergent commits while `main` stays
  // untouched. Version numbers continue from the fork point, which makes
  // PUBLISH a pure sequence of manifest renames into the main
  // `_snapshots` (atomic per version; refused wholesale when main
  // advanced past the fork — forward-only, like every fast-forward in
  // this engine). The fork version is pinned in the refs file (kind
  // `wbranch`), so vacuum on main never retires the files the branch's
  // carried entries still reference. Branch DATA files stay under the
  // branch directory after publish (absolute manifest paths — rename
  // re-anchoring handles them); the next compaction folds them into
  // `data/`.

  private[storage] def snapDirOf(root: String): Path = snapDir(root)

  /** The branch's virtual root. Branch names are path segments. */
  def branchRoot(root: String, name: String): String = {
    require(name.nonEmpty && !name.startsWith(".") &&
      !name.exists(c => c == '\t' || c == '\n' || c == '\r' || c == '/'),
      s"invalid branch name '$name'")
    new Path(new Path(root, "_branches"), name).toString
  }

  private def copyMetaFile(f: FileSystem, from: Path, to: Path): Unit = {
    if (!f.exists(from)) return
    val in = f.open(from)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toByteArray
    } finally in.close()
    val tmp = new Path(to.getParent, s".tmp-br-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(bytes) finally out.close()
    if (!f.rename(tmp, to)) f.delete(tmp, false)
  }

  /** Create a write branch forked at the current head: copy the head
    * version's manifest + stats + schema sidecars into the branch's own
    * `_snapshots`, and pin the fork version in the refs file (vacuum
    * safety). The branch is then a fully ordinary table root. */
  def createWriteBranch(spark: SparkSession, root: String, name: String): Long = {
    val br = branchRoot(root, name)
    val f = fs(spark, root)
    val head = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root — create() first"))
    withRefsLock(spark, root) {
      val m = refs(spark, root)
      require(!m.contains(name), s"ref '$name' already exists at $root")
      require(!f.exists(snapDir(br)),
        s"branch directory already exists at $br — drop_branch first")
      f.mkdirs(snapDir(br))
      copyMetaFile(f, manifestPath(root, head.version),
        manifestPath(br, head.version))
      copyMetaFile(f, statsPath(root, head.version),
        statsPath(br, head.version))
      copyMetaFile(f, schemaPath(root, head.version),
        schemaPath(br, head.version))
      writeRefs(spark, root, m + (name -> ("wbranch", head.version)))
    }
    head.version
  }

  /** True when `name` is a write branch with staged state. */
  def writeBranchExists(spark: SparkSession, root: String,
                        name: String): Boolean =
    fs(spark, root).exists(snapDir(branchRoot(root, name)))

  /** PUBLISH (fast-forward main onto the branch): every branch version
    * above the fork renames into main's `_snapshots` — manifest FIRST
    * (the rename is the atomic claim of that version number; a main
    * writer that advanced mid-publish makes it fail and the publish
    * stops at a consistent prefix), sidecars right after (a reader in
    * that instant degrades to footer-inferred schema / no stats, the
    * documented torn-sidecar fallback). Refused outright when main
    * already advanced past the fork — recreate the branch and replay. */
  def publishBranch(spark: SparkSession, root: String, name: String): Long = {
    val br = branchRoot(root, name)
    val f = fs(spark, root)
    val vs = versions(spark, br)
    require(vs.nonEmpty, s"no write branch '$name' at $root")
    val base = vs.min
    val mainHead = latest(spark, root).map(_.version).getOrElse(0L)
    if (mainHead != base) throw new java.util.ConcurrentModificationException(
      s"cannot publish branch '$name': main is at v$mainHead but the " +
        s"branch forked at v$base — recreate the branch from the current " +
        "head and replay its commits")
    val toMove = vs.filter(_ > base).sorted
    toMove.foreach { v =>
      if (f.exists(manifestPath(root, v)) ||
          !f.rename(manifestPath(br, v), manifestPath(root, v)))
        throw new java.util.ConcurrentModificationException(
          s"publish of branch '$name' lost a race at v$v (main advanced " +
            s"mid-publish); versions below v$v published consistently")
      if (f.exists(statsPath(br, v))) f.rename(statsPath(br, v), statsPath(root, v))
      if (f.exists(schemaPath(br, v))) f.rename(schemaPath(br, v), schemaPath(root, v))
    }
    // retire the branch metadata (its DATA files stay — published
    // manifests reference them absolutely; compaction folds them in)
    f.delete(snapDir(br), true)
    withRefsLock(spark, root) {
      writeRefs(spark, root, refs(spark, root) - name)
    }
    toMove.lastOption.getOrElse(base)
  }

  /** Abandon a write branch: delete its staged metadata AND data (an
    * unpublished branch's data is referenced by nothing else). A
    * PUBLISHED branch's leftover data directory is never touched (its
    * `_snapshots` is already gone — only the refs entry could linger
    * after a crash, and that is all this cleans then). Idempotent. */
  def dropWriteBranch(spark: SparkSession, root: String, name: String): Boolean = {
    val br = branchRoot(root, name)
    val f = fs(spark, root)
    val staged = f.exists(snapDir(br))
    if (staged) f.delete(new Path(br), true)
    withRefsLock(spark, root) {
      val m = refs(spark, root)
      if (m.get(name).exists(_._1 == "wbranch"))
        writeRefs(spark, root, m - name)
    }
    staged
  }

  /** RESTORE — roll the table back to version `v` AS A COMMIT: v's
    * entries, stats lines (NDV sketches included), and schema republish
    * as the new head version. Nothing is deleted — the rolled-back
    * versions keep time-traveling until vacuum retires them, so a
    * restore is itself undoable by another restore. One manifest + two
    * sidecar writes: metadata time, O(v's file count), no data motion
    * (the head references version-v's still-retained files).
    *
    * The table-shape meta (partition spec, sort order, row-level modes)
    * comes from `v` — restore means THAT table back; the txn ledger
    * comes from the CURRENT head — a restore must never lower a
    * stream's batch high-water mark, or replayed micro-batches would
    * double-commit after a rollback. Refuses when `v` is not retained
    * or any of its files/vectors were already vacuumed. */
  /** Shared validation for RENAME/DROP COLUMN: both are METADATA-ONLY
    * versions over a name-keyed format, so the column must not be load-
    * bearing for anything that resolves names at read/write time
    * beneath the mapping layer. Returns (snapshot, schema sidecar). */
  private def colDdlBase(spark: SparkSession, root: String, name: String,
                         op: String): (Snapshot, org.apache.spark.sql.types.StructType) = {
    val snap = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root — create() first"))
    val schema = tableSchema(spark, root, snap.version).getOrElse(
      throw new IllegalStateException(
        s"$op needs a schema sidecar; this table predates them — " +
          "compact it once first"))
    require(schema.fieldNames.contains(name),
      s"no column '$name' in ${schema.simpleString}")
    snap.entries.find(_.addV < 0L).foreach { e =>
      throw new IllegalStateException(
        s"$op needs add-versions on every file; ${e.path} predates " +
          "them — compact the table once first")
    }
    val partCols = snap.partitionSpecs.map(SnapshotPartition.parseField(_).col)
    require(!partCols.contains(name),
      s"cannot $op partition column '$name' (partitioned by " +
        s"${snap.partitionSpecs.mkString(",")})")
    require(!snap.sortCols.contains(name),
      s"cannot $op declared sort column '$name' — clear the sort order first")
    val eqKeyCols = snap.eqDeletes.flatMap(_._4).distinct
    require(!eqKeyCols.contains(name),
      s"cannot $op upsert key column '$name' while equality deletes are " +
        "in force — compact the table first")
    (snap, schema)
  }

  /** RENAME COLUMN as a metadata-only version: the schema sidecar takes
    * the new name (same position/type), a `#colmap` event records the
    * lineage, and the carried stats sidecar is re-keyed — so old files
    * keep serving the column under its new name AND data skipping on it
    * keeps pruning. Old versions time-travel under their own schema.
    * Compaction rewrites files under current names and retires the
    * event. Writers always write head names; a stale writer's old-name
    * column is a NEW column under mergeSchema (same as every name-keyed
    * format without its mapping flag). */
  def renameColumn(spark: SparkSession, root: String, oldName: String,
                   newName: String): Long = {
    require(newName.nonEmpty && !newName.exists(c => c == '\t' || c == '\n'),
      s"invalid column name '$newName'")
    val (snap, schema) = colDdlBase(spark, root, oldName, "RENAME COLUMN")
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column '$newName' already exists in ${schema.simpleString}")
    val next = snap.version + 1
    val i = schema.fieldIndex(oldName)
    val nextSchema = org.apache.spark.sql.types.StructType(
      schema.fields.updated(i, schema.fields(i).copy(name = newName)))
    commit(spark, root, next, snap.entries,
      nextMeta(Some(snap), None) :+ s"#colmap $next\trename\t$oldName\t$newName")
    // re-key the carried stats so pruning/NDV on the renamed column
    // keeps working for pre-rename files
    writeStats(spark, root, next,
      statsRaw(spark, root, snap.version)
        .map(l => if (l.col == oldName) l.copy(col = newName) else l)
        .map(_.line).sorted)
    writeSchema(spark, root, next, nextSchema)
    next
  }

  /** DROP COLUMN as a metadata-only version: the head schema loses the
    * field, a `#colmap` event breaks the lineage (a LATER re-add of the
    * same name is a fresh column — old files' stale values never leak
    * into it), stats lines for the column retire. Nothing is rewritten;
    * old versions still time-travel WITH the column. */
  def dropColumn(spark: SparkSession, root: String, name: String): Long = {
    val (snap, schema) = colDdlBase(spark, root, name, "DROP COLUMN")
    require(schema.fields.length > 1,
      s"cannot drop the only column of ${schema.simpleString}")
    val next = snap.version + 1
    val nextSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == name))
    commit(spark, root, next, snap.entries,
      nextMeta(Some(snap), None) :+ s"#colmap $next\tdrop\t$name")
    writeStats(spark, root, next,
      statsRaw(spark, root, snap.version).filterNot(_.col == name)
        .map(_.line).sorted)
    writeSchema(spark, root, next, nextSchema)
    next
  }

  def restore(spark: SparkSession, root: String, v: Long): Long = {
    val cur = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    require(versions(spark, root).contains(v),
      s"cannot restore: version $v is not retained at $root " +
        s"(retained: ${versions(spark, root).mkString(",")})")
    if (cur.version == v) return v // restoring the head is a no-op
    val snap = snapshot(spark, root, v)
    val f = fs(spark, root)
    (snap.entries.map(_.path) ++ snap.entries.map(_.dv).filter(_.nonEmpty))
      .foreach(p => require(f.exists(new Path(p)),
        s"cannot restore v$v: $p was already vacuumed"))
    val next = cur.version + 1
    val meta = partitionMeta(snap.partitionSpecs) ++
      sortMeta(snap.sortCols) ++ rowLevelMeta(snap.rowLevelModes) ++
      snap.meta.filter(l =>
        l.startsWith("#eqdelete ") || l.startsWith("#colmap ")) ++
      cur.txns.toSeq.sortBy(_._1).map {
        case ("", id) => s"#txn $id"
        case (app, id) => s"#txn $app $id"
      }
    commit(spark, root, next, snap.entries, meta)
    writeStats(spark, root, next, statsLines(spark, root, v))
    tableSchema(spark, root, v).foreach(writeSchema(spark, root, next, _))
    next
  }

  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
             graceMs: Long = 7L * 24 * 3600 * 1000): Int = {
    require(keepVersions >= 1, "must keep at least one version")
    require(graceMs >= 0, "graceMs must be >= 0")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    if (vs.isEmpty) return 0
    val cutoff = System.currentTimeMillis() - graceMs
    // ref-targeted versions (tags/branches) are pinned whatever the
    // retention window says — a tag IS the request to keep that version
    val refTargets = refs(spark, root).values.map(_._2).toSet
    val (dropCand, keepTail) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val dropAll = dropCand.filterNot(refTargets)
    val keep = dropCand.filter(refTargets) ++ keepTail
    // a dropped version retires WHOLE, on its manifest's age
    val (dropNow, dropLater) = dropAll.partition { v =>
      val m = manifestPath(root, v)
      f.exists(m) && f.getFileStatus(m).getModificationTime < cutoff
    }
    val retainedSnaps = (keep ++ dropLater).map(v => snapshot(spark, root, v))
    val referenced = retainedSnaps.flatMap(_.files).toSet
    // deletion-vector sidecars retire exactly like data files: keep the
    // ones any retained manifest references, drop old unreferenced ones
    // (the grace window protects an in-flight merge-on-read commit)
    val referencedDv = (retainedSnaps.flatMap(_.entries)
      .collect { case e if e.dv.nonEmpty => norm(e.dv) } ++
      // update-preimage sidecars (`#updv`) stay live while the version
      // whose change feed needs them is retained; equality-delete
      // sidecars while any retained manifest keeps them in force
      retainedSnaps.flatMap(_.updVectors.values.map(norm)) ++
      retainedSnaps.flatMap(_.eqDeletes.map(t => norm(t._1)))).toSet
    val dvDir = DeletionVectors.dir(root)
    if (f.exists(dvDir)) {
      f.listStatus(dvDir).foreach { st =>
        // partial-* dirs are a delta write's staging area (normally
        // dropped at commit); an old one is a crashed writer's orphan
        if (st.isDirectory && st.getPath.getName.startsWith("partial-") &&
            st.getModificationTime < cutoff)
          f.delete(st.getPath, true)
        else if (!st.isDirectory && !referencedDv(norm(st.getPath.toString)) &&
            st.getModificationTime < cutoff)
          f.delete(st.getPath, false)
      }
    }
    val dataDir = new Path(root, "data")
    val statuses = listParquetStatuses(f, dataDir)
    val dead = statuses.filter(st => !referenced(st.getPath.toString) &&
      st.getModificationTime < cutoff).map(_.getPath)
    // capture dir ages BEFORE deleting (deletions bump the parent mtime)
    val dirAge = f.listStatus(dataDir).collect {
      case st if st.isDirectory => st.getPath -> st.getModificationTime
    }.toMap
    dead.foreach(p => f.delete(p, false))
    val touched = dead.map(_.getParent).toSet
    // prune now-empty uuid dirs: ones THIS run emptied, plus ones already
    // old and empty (an in-flight writer's fresh dir stays)
    dirAge.foreach { case (dir, age) =>
      if ((touched(dir) || age < cutoff) && listParquet(f, dir).isEmpty)
        f.delete(dir, true)
    }
    dropNow.foreach { v =>
      // the streaming sink's txn ledger rides INSIDE the manifest and the
      // high-water marks are carried forward by every commit, so retiring
      // an old version never loses them
      f.delete(manifestPath(root, v), false)
      f.delete(statsPath(root, v), false)
      f.delete(schemaPath(root, v), false)
    }
    dead.size
  }
}
