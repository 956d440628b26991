package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for multi-dimensional data skipping.
  *
  * Parquet scans prune row groups / files from min-max statistics, but a
  * single-column sort only tightens ONE column's ranges: a box predicate
  * `x BETWEEN a AND b AND y BETWEEN c AND d` over a y-sorted 100 TB table
  * still reads every file for the x bound. Z-ordering sorts by the Morton
  * interleave of bucketed (x, y), so each file covers a small RECTANGLE of
  * the value domain and both bounds prune — the standard lakehouse
  * clustering technique, here as a plain column + writer (no table format
  * required).
  */
object Layout {

  /** Z-order key column: bucket both values into `bits`-bit ordinals over
    * [min, max] (clamped; nulls → bucket 0) and Morton-interleave them.
    * Requires GraftFunctions registration (graft.core.Tables.register does
    * it; Layout.zorderWrite does too). */
  def zorderKey(x: Column, xMin: Double, xMax: Double,
                y: Column, yMin: Double, yMax: Double, bits: Int = 15): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    require(xMax > xMin && yMax > yMin, "degenerate value domain")
    val buckets = (1L << bits) - 1
    def ord(c: Column, lo: Double, hi: Double): Column =
      least(lit(buckets), greatest(lit(0L),
        floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) /
          lit(hi - lo) * lit(buckets.toDouble)).cast("long")))
    call_function("graft_zorder", ord(x, xMin, xMax), ord(y, yMin, yMax))
  }

  /** Deterministic table-name suffix for a data directory — managed-table
    * names derived from a path must be stable across sessions AND
    * distinct across scale factors (a bucketed table built from sf0.001
    * must never be read by an sf0.01 run). Shared by the JOIN-BUCKETED
    * query and every test that reopens its tables. */
  def dirSuffix(dir: String): String = java.lang.Long.toHexString(
    org.apache.spark.unsafe.types.UTF8String.fromString(dir).hashCode() & 0xffffffffL)

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `keyCol` — the sort-merge-bucket layout. Two tables bucketed the
    * same way (same key semantics, same bucket count) join with NO
    * shuffle on either side: the scan's bucket metadata already
    * satisfies the join's required hash distribution, so a fact-fact
    * join over 100 TB pays zero Exchange — the co-location pattern for
    * repeated joins on a stable key (pre-shuffle once at write time,
    * join forever). The in-bucket sort lets the merge join skip its
    * sort too when each bucket lands in one file. */
  def bucketedWrite(df: DataFrame, keyCol: String, numBuckets: Int,
                    table: String): Unit = {
    val spark = df.sparkSession
    // a fresh in-memory catalog forgets the table but the managed
    // warehouse DIRECTORY survives the JVM — saveAsTable then refuses
    // (LOCATION_ALREADY_EXISTS), so drop both the entry and the location
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Rewrite `df` into `numFiles` z-order-clustered parquet files at
    * `path`. One metadata-scale min/max aggregate fixes the bucket
    * domains (the GlobalWindow pattern — same pass a RangePartitioner
    * pays), then range-partition + in-partition sort by the z-key.
    *
    * Degenerate inputs fall back instead of failing mid-job: an empty
    * (or all-null-dimension) frame writes plainly, and a constant
    * dimension widens to a unit domain so every row lands in its
    * bucket 0 — the z-key then degrades to a 1-D sort on the other
    * dimension, which is the right layout for that slice anyway. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  path: String, numFiles: Int, bits: Int = 15): Unit = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    val r = df.agg(min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    def dom(lo: Double, hi: Double): (Double, Double) =
      if (hi > lo) (lo, hi) else (lo, lo + 1.0)
    val (xMin, xMax) = dom(r.getDouble(0), r.getDouble(1))
    val (yMin, yMax) = dom(r.getDouble(2), r.getDouble(3))
    val z = zorderKey(col(xCol), xMin, xMax, col(yCol), yMin, yMax, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory into ≈`targetBytes` files at `outPath`;
    * returns the file count written.
    *
    * The small-files problem is the other half of layout at 100 TB: a
    * streaming sink or over-parallel writer leaves thousands of KB-scale
    * files per partition, and every later scan pays a task (plus footer
    * read + scheduler round trip) PER FILE — metadata overhead dwarfs the
    * data. Compaction is the standard maintenance pass (OPTIMIZE in the
    * table formats), here for plain parquet directories.
    *
    * File count = ceil(input bytes / targetBytes), sized from one
    * driver-side directory listing (metadata-scale; compression ratio is
    * assumed stable across the rewrite — exact sizing would need a dry
    * run). With `sortCol` set the rewrite range-partitions + sorts, so
    * the compacted files carry non-overlapping min-max ranges on that
    * column and scans with a `sortCol` predicate prune whole files —
    * compaction and clustering in one pass (one shuffle). Without it,
    * `coalesce` merges splits with NO shuffle when the scan has enough
    * partitions (the usual small-files case: more files than target),
    * falling back to a round-robin repartition when the scan packed the
    * input into FEWER splits than the target file count (coalesce can
    * only reduce). */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long = 128L * 1024 * 1024,
              sortCol: Option[String] = None): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(new org.apache.hadoop.fs.Path(outPath) !=
      new org.apache.hadoop.fs.Path(inPath), "compact in place is unsafe")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val out = sortCol match {
      case Some(c) => df.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(c)
      case None =>
        if (df.rdd.getNumPartitions >= nFiles) df.coalesce(nFiles)
        else df.repartition(nFiles)
    }
    out.write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Retention for hive-partitioned time data: DELETE whole partition
    * directories whose `partitionCol=value` is lexicographically below
    * `cutoff` — a pure METADATA operation (directory removals), never a
    * scan-and-rewrite. This is how 100 TB of date-partitioned metrics
    * actually expire: dropping `day=2024-01-01/` costs the same whether
    * it holds a megabyte or a terabyte. Values must be lexicographically
    * ordered (ISO dates, zero-padded hours — the layouts one partitions
    * time by). Returns the dropped partition values. */
  def dropPartitionsOlderThan(spark: org.apache.spark.sql.SparkSession,
                              path: String, partitionCol: String,
                              cutoff: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    val dropped = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => (st.getPath, st.getPath.getName.stripPrefix(prefix)))
      .filter { case (_, v) => v < cutoff }
    dropped.foreach { case (dir, _) => fs.delete(dir, true) }
    dropped.map(_._2).sorted
  }

  /** [[compact]] per hive partition — OPTIMIZE for a partitioned layout:
    * each `partitionCol=value` directory compacts independently toward
    * `targetBytes` files (so one hot day's small files don't force a
    * rewrite of cold history), preserving the partition structure.
    * Returns (partition value → files written). Driver-side loop over
    * partition DIRECTORIES (metadata-scale); each rewrite is its own
    * distributed job. */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         inPath: String, outPath: String, partitionCol: String,
                         targetBytes: Long = 128L * 1024 * 1024,
                         sortCol: Option[String] = None): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map { st =>
        val v = st.getPath.getName.stripPrefix(prefix)
        val n = compact(spark, st.getPath.toString,
          s"$outPath/${st.getPath.getName}", targetBytes, sortCol)
        v -> n
      }.toMap
  }

  // ------------------------------------------------------- keyed upsert

  /** Last-write-wins MERGE into a hive-partitioned parquet layout — the
    * table-format-free version of `MERGE INTO`: union the updates with the
    * CURRENT rows of only the partitions the updates touch, keep one row
    * per key (highest `versionCol`; ties prefer the update side), and
    * rewrite ONLY those partitions (dynamic partition overwrite — cold
    * partitions' files are never opened, read, or replaced).
    *
    * Scale shape: the partition list is a driver-side distinct over the
    * updates (metadata-scale); the read is partition-pruned to the
    * affected values; the merge is one shuffle on the key; the rewrite is
    * proportional to the touched partitions, not the table. The merged
    * frame is localCheckpoint-ed before the overwrite because Spark
    * (correctly) refuses to overwrite a path it is still reading —
    * bounded by the affected partitions only.
    *
    * Returns the affected partition values. */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                        updates: DataFrame, keyCols: Seq[String],
                        versionCol: String, partitionCol: String): Seq[String] = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    val affected = updates.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(p)) updates
      else {
        val partType = updates.schema(partitionCol).dataType
        val cur = spark.read.parquet(path)
          .where(col(partitionCol).cast("string").isin(affected: _*))
          .withColumn(partitionCol, col(partitionCol).cast(partType))
          .withColumn("__src", lit(0))
        val upd = updates.withColumn("__src", lit(1))
        cur.unionByName(upd)
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols.map(col): _*)
              .orderBy(col(versionCol).desc, col("__src").desc)))
          .where(col("__rn") === 1)
          .drop("__rn", "__src")
      }
    val staged = merged.localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try staged.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    affected
  }

  /** Incrementally maintain a sum/count/min/max rollup of a hive-partitioned
    * raw table: re-aggregate ONLY the named partition values (the read is
    * partition-pruned — cold history is never scanned) and dynamic-overwrite
    * exactly those partitions of the rollup table.
    *
    * Because sum/count/min/max are mergeable and the rollup partitions on
    * the same column as the raw table, recomputing an affected partition
    * from its raw rows alone is exact — this is the maintenance loop behind
    * the TS-ROLLUP-CASCADE contract: at 100 TB the daily delta touches one
    * partition's rows, not the table.
    *
    * Returns the overwritten partition values. */
  def incrementalRollup(spark: org.apache.spark.sql.SparkSession,
                        rawPath: String, rollupPath: String,
                        partitionCol: String, groupCols: Seq[String],
                        valueCol: String, partitions: Seq[String]): Seq[String] = {
    require(partitions.nonEmpty, "no partitions to roll up")
    // SELF-REFERENTIAL ROUTING GUARD: this maintenance aggregate is
    // exactly the shape RollupRouteRewrite routes (raw scan + group cols +
    // sum/count/min/max of valueCol) — with the route conf set, the
    // refresh would be served FROM THE ROLLUP ITSELF and never advance
    // (the classic MV-maintenance exclusion every rewrite engine needs).
    // Suspend routing until the aggregate MATERIALIZES (localCheckpoint),
    // then restore; concurrent dashboard queries in other threads briefly
    // plan unrouted, which is correct just slower.
    val routeKey = "spark.graft.rollup.route"
    val prevRoute = spark.conf.getOption(routeKey)
    prevRoute.foreach(_ => spark.conf.unset(routeKey))
    val staged = try {
      val raw = spark.read.parquet(rawPath)
        .where(col(partitionCol).cast("string").isin(partitions: _*))
      // `c` counts ROWS, `cnn` counts NON-NULL values: avg(value) divides
      // by the latter, so the RollupRouteRewrite avg decomposition needs
      // cnn to stay exact when valueCol contains nulls (sum/min/max
      // already skip nulls, matching the raw aggregates).
      raw.groupBy((groupCols :+ partitionCol).map(col): _*)
        .agg(sum(col(valueCol)).as("sv"), count(lit(1)).as("c"),
          count(col(valueCol)).as("cnn"),
          min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
        .localCheckpoint()
    } finally prevRoute.foreach(spark.conf.set(routeKey, _))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try staged.write.mode("overwrite").partitionBy(partitionCol).parquet(rollupPath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    partitions
  }

  // ---------------------------------------------- bloom data-skipping index

  /** Sidecar location for a per-file bloom index on `keyCol`. */
  def bloomIndexPath(path: String, keyCol: String): String =
    path.stripSuffix("/") + s"_bloomidx_$keyCol"

  /** Build a file-level bloom data-skipping index: ONE bloom sketch per
    * parquet file over `keyCol`, written as a (file, bloom) sidecar table.
    * Min-max stats (zorder/sort) prune RANGE predicates; blooms prune
    * POINT lookups on high-cardinality keys that no sort order helps —
    * "which files could hold series_id = X" — the secondary-index half of
    * lakehouse data skipping.
    *
    * Cost model: one scan of the table, grouped on the file name; the
    * bloom aggregate's buffer is a fixed bit array (map-side partials, OR
    * merge), so the index costs numBits/8 bytes per FILE — metadata-scale
    * output whatever the table size. Returns the number of files indexed. */
  def writeBloomIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      keyCol: String, expectedItemsPerFile: Long = 1000000L,
                      fpp: Double = 0.01): Long = {
    graft.functions.expressions.GraftFunctions.register(spark)
    val idx = spark.read.parquet(path)
      .select(input_file_name().as("file"), col(keyCol))
      .groupBy("file")
      .agg(call_function("graft_bloom_agg", col(keyCol),
        lit(expectedItemsPerFile), lit(fpp)).as("bloom"))
    idx.write.mode("overwrite").parquet(bloomIndexPath(path, keyCol))
    spark.read.parquet(bloomIndexPath(path, keyCol)).count()
  }

  /** Consult the sidecar: the files whose bloom might contain ANY of
    * `values`, plus the total file count. Driver-side over the index rows
    * (one per file — metadata-scale). No false negatives: a file missing
    * from the keep list provably holds none of the probe values. */
  def bloomPruneFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                      keyCol: String, values: Seq[Any]): (Seq[String], Int) = {
    import org.apache.spark.util.sketch.BloomFilter
    val rows = spark.read.parquet(bloomIndexPath(path, keyCol)).collect()
    val keep = rows.filter { r =>
      val bloom = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      values.exists {
        case l: Long => bloom.mightContainLong(l)
        case i: Int => bloom.mightContainLong(i.toLong)
        case s: String => bloom.mightContainBinary(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case other => throw new IllegalArgumentException(
          s"bloom probe supports Long/Int/String values, got $other")
      }
    }.map(_.getString(0)).toSeq.sorted
    (keep, rows.length)
  }

  /** Point-lookup read through the bloom index: scans ONLY the candidate
    * files, then applies the exact predicate (false positives cost I/O,
    * never correctness). Built for flat (non-hive-partitioned) layouts —
    * the file list is passed straight to the reader. */
  def bloomPrunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
                      keyCol: String, values: Seq[Any]): DataFrame = {
    val (keep, _) = bloomPruneFiles(spark, path, keyCol, values)
    val base =
      if (keep.isEmpty) spark.read.parquet(path).where(lit(false))
      else spark.read.parquet(keep: _*)
    base.where(col(keyCol).isin(values: _*))
  }
}
