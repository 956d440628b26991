package graft.storage.dsv2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.storage.SnapshotTable

/** DataSource V2 surface for [[graft.storage.SnapshotTable]] — the
  * integration that makes the snapshot/manifest ACID layer reachable from
  * ORDINARY Spark reads instead of only the bespoke library API:
  *
  * {{{
  *   spark.read.format("graft-snapshot").load(root)                  // latest
  *   spark.read.format("graft-snapshot")
  *     .option("versionAsOf", 3).load(root)                          // time travel
  *   df.where($"k" between (1000, 1999))                             // ← pushed
  * }}}
  *
  * What the connector does with a pushed predicate (the part that matters
  * at 100 TB):
  *  1. FILE-LEVEL SKIPPING — numeric comparison filters are folded into
  *     per-column [lo, hi] intervals and tested against the version's
  *     stats sidecar ([[SnapshotTable.stats]]); files whose min/max range
  *     cannot intersect are never opened (no false negatives: a file
  *     without stats is kept). This is the same pruning
  *     `SnapshotTable.readPruned` does, now firing from a plain
  *     `.where(...)` on a plain `spark.read`.
  *  2. ROW-GROUP SKIPPING — the same intervals become a parquet
  *     `FilterPredicate`, so row groups inside kept files prune on the
  *     footer min/max statistics.
  *  3. Everything stays BEST-EFFORT I/O reduction: every filter is also
  *     returned as a post-scan residual, so Spark re-evaluates exactly —
  *     a stats false positive costs I/O, never correctness (the contract
  *     every skipping layer in this engine follows).
  *
  * Column pruning flows through `SupportsPushDownRequiredColumns` into
  * the parquet requested-schema projection — a 2-column read of a
  * 20-column table decodes 2 columns.
  *
  * Snapshot isolation: the manifest is resolved ONCE, when the table
  * object is built; the file list is pinned for the query's lifetime
  * regardless of concurrent commits — same guarantee as the library API.
  *
  * Supported read schema: the flat analytic shapes this engine's tables
  * use — BOOLEAN/INT/LONG/FLOAT/DOUBLE/DATE/TIMESTAMP (INT96 and
  * INT64-annotated)/STRING/BINARY/DECIMAL plus one-level ARRAY of
  * primitives and MAP<STRING,STRING> (the Datapoint dimensions shape).
  * Deeper nesting fails fast with a clear message; the upgrade path is
  * the vectorized columnar reader, not silent wrong answers.
  */
class SnapshotDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def root(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-snapshot needs a table root: spark.read.format(\"graft-snapshot\").load(root)")
    p
  }

  private def resolve(options: CaseInsensitiveStringMap): SnapshotTable.Snapshot = {
    val spark = SparkSession.active
    val r = root(options)
    Option(options.get("versionAsOf")) match {
      case Some(v) => SnapshotTable.snapshot(spark, r, v.toLong)
      case None => SnapshotTable.latest(spark, r).getOrElse(
        throw new IllegalStateException(s"no committed snapshot at $r"))
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val snap = resolve(options)
    // schema from the first data file's footer, via Spark's own
    // parquet-to-Catalyst mapping (driver-side, one footer)
    SparkSession.active.read.parquet(snap.files.head).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new SnapshotTableV2(root(options), resolve(options), schema)
  }
}

/** A pinned snapshot version exposed as a V2 table. */
final class SnapshotTableV2(root: String, snap: SnapshotTable.Snapshot,
                            schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot:$root@v${snap.version}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(root, snap, schema)
}

/** Scan builder: collects pushed filters + required columns, prunes the
  * file list through the stats sidecar at `build()`. */
final class SnapshotScanBuilder(root: String, snap: SnapshotTable.Snapshot,
                                fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the numeric comparison shapes the stats sidecar can use;
    * EVERYTHING is returned as residual — pushdown here only prunes I/O,
    * Spark keeps exact post-scan evaluation (stats false positives cost
    * reads, never wrong rows). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(f => SnapshotFilters.bound(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    val spark = SparkSession.active
    val bounds = SnapshotFilters.intervals(accepted)
    val st = SnapshotTable.stats(spark, root, snap.version)
    val keep = snap.files.filter { f =>
      bounds.forall { case (c, (lo, hi)) =>
        st.get((SnapshotTable.norm(f), c)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true // no stats ⇒ keep — never a false negative
        }
      }
    }
    new SnapshotScan(root, snap.version, keep, snap.files.size, required,
      accepted, spark.sessionState.newHadoopConf())
  }
}

/** Interval folding for v1 `Filter`s: the comparison shapes whose file /
  * row-group pruning is expressible as a per-column [lo, hi] band. */
object SnapshotFilters {

  private def num(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  /** (column, lo, hi) for one supported leaf filter; None ⇒ unsupported
    * (strict bounds widen to non-strict — conservative for min/max). */
  def bound(f: Filter): Option[(String, Double, Double)] = f match {
    case sources.EqualTo(c, v) => num(v).map(x => (c, x, x))
    case sources.GreaterThan(c, v) => num(v).map(x => (c, x, Double.PositiveInfinity))
    case sources.GreaterThanOrEqual(c, v) => num(v).map(x => (c, x, Double.PositiveInfinity))
    case sources.LessThan(c, v) => num(v).map(x => (c, Double.NegativeInfinity, x))
    case sources.LessThanOrEqual(c, v) => num(v).map(x => (c, Double.NegativeInfinity, x))
    case _ => None
  }

  /** Conjunction of the accepted leaves, folded per column. */
  def intervals(filters: Array[Filter]): Map[String, (Double, Double)] =
    filters.flatMap(bound).foldLeft(Map.empty[String, (Double, Double)]) {
      case (m, (c, lo, hi)) =>
        val (l0, h0) = m.getOrElse(c, (Double.NegativeInfinity, Double.PositiveInfinity))
        m.updated(c, (math.max(l0, lo), math.min(h0, hi)))
    }
}

/** The scan: a pinned, pruned file list. One input partition per data
  * file (snapshot files are write-sized; at 100 TB a file is one
  * executor-task-sized unit, the same granularity every manifest-format
  * reader schedules). */
final class SnapshotScan(root: String, version: Long, files: Seq[String],
                         totalFiles: Int, required: StructType,
                         pushed: Array[Filter], conf: Configuration)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Plan-visible skipping evidence: `files=<kept>/<total>`. */
  override def description(): String =
    s"graft-snapshot root=$root version=$version " +
      s"files=${files.size}/$totalFiles " +
      s"pushed=[${pushed.mkString(", ")}] columns=${required.fieldNames.mkString(",")}"

  /** Exposed for tests/tools asserting file-level skipping. */
  def plannedFiles: Seq[String] = files
  def totalFileCount: Int = totalFiles

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => SnapshotFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SnapshotReaderFactory(required, SnapshotFilters.intervals(pushed),
      new SerializableHadoopConf(conf))
}

final case class SnapshotFilePartition(file: String) extends InputPartition

/** Hadoop `Configuration` is not `Serializable`; ship it with its own
  * wire format (the standard connector-side wrapper pattern). */
final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit =
    value.write(out)
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    value = new Configuration(false)
    value.readFields(in)
  }
}

final class SnapshotReaderFactory(required: StructType,
                                  intervals: Map[String, (Double, Double)],
                                  conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SnapshotFilePartition].file
    new SnapshotPartitionReader(file, required, intervals, conf.value)
  }
}
