package graft.storage.dsv2

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

import graft.storage.EqualityDeletes

/** EQUALITY-DELETE application for the connector's readers: a file with
  * applicable `#eqdelete` sidecars (committed AFTER the file — the
  * streaming-upsert retire-old-rows path) drops every row whose key
  * tuple is listed. The key set is loaded once per (executor, sidecar)
  * through a small JVM cache — sidecars are immutable, and their size
  * is bounded by keys upserted since the last compaction (compaction
  * materializes equality deletes away entirely). */
object SnapshotEqRead {

  // per-JVM sidecar cache (immutable content); bounded defensively —
  // a long-lived executor reading many epochs' sidecars re-reads
  // rather than growing without limit
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  def keySet(conf: Configuration, path: String): Set[String] = {
    val hit = cache.get(path)
    if (hit != null) return hit
    val (_, set) = EqualityDeletes.read(conf, path)
    if (cache.size > 256) cache.clear()
    cache.putIfAbsent(path, set)
    set
  }

  /** Union of several sidecars' key sets. */
  def keys(conf: Configuration, paths: Seq[String]): Set[String] =
    if (paths.size == 1) keySet(conf, paths.head)
    else paths.foldLeft(Set.empty[String])((s, p) => s ++ keySet(conf, p))

  /** The canonical ENCODED key-tuple of one row, from internal values
    * at `ords`/`types` — must agree with the sink's rendering. */
  def rowKey(row: InternalRow, ords: Array[Int], types: Array[DataType]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < ords.length) {
      if (i > 0) sb.append('\t')
      val v = if (row.isNullAt(ords(i))) null else row.get(ords(i), types(i))
      sb.append(EqualityDeletes.encodeValue(
        EqualityDeletes.canonical(types(i), v)))
      i += 1
    }
    sb.toString()
  }

  /** Extend `required` with any key columns it lacks (appended at the
    * END so consumer ordinals 0..n-1 are untouched), resolving types
    * from the full table schema. */
  def extend(required: StructType, keys: Seq[String],
             full: StructType): StructType =
    keys.filterNot(required.fieldNames.contains)
      .foldLeft(required)((sc, k) => sc.add(full(full.fieldIndex(k))))
}

/** Row-path wrapper: drop rows whose key tuple is in the delete set. */
final class EqApplyRowReader(inner: PartitionReader[InternalRow],
                             deleted: Set[String],
                             ords: Array[Int], types: Array[DataType])
  extends PartitionReader[InternalRow] {
  private var cur: InternalRow = _
  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      if (!deleted.contains(SnapshotEqRead.rowKey(r, ords, types))) {
        cur = r
        return true
      }
    }
    false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}

/** Columnar wrapper: per batch, probe each row's key tuple against the
  * delete set and re-expose survivors through the same zero-copy
  * selection views the deletion-vector path uses. */
final class EqApplyColumnarReader(inner: PartitionReader[ColumnarBatch],
                                  deleted: Set[String],
                                  ords: Array[Int], types: Array[DataType])
  extends PartitionReader[ColumnarBatch] {

  private var out: ColumnarBatch = _
  private var sel: Array[Int] = _

  private def keyOf(cols: Array[ColumnVector], row: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < ords.length) {
      if (i > 0) sb.append('\t')
      val cv = cols(i)
      val v =
        if (cv.isNullAt(row)) null
        else types(i) match {
          case org.apache.spark.sql.types.StringType => cv.getUTF8String(row)
          case org.apache.spark.sql.types.BooleanType => cv.getBoolean(row)
          case org.apache.spark.sql.types.ByteType => cv.getByte(row)
          case org.apache.spark.sql.types.ShortType => cv.getShort(row)
          case org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.DateType => cv.getInt(row)
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType => cv.getLong(row)
          case other => throw new UnsupportedOperationException(
            s"equality-delete key type $other")
        }
      sb.append(EqualityDeletes.encodeValue(
        EqualityDeletes.canonical(types(i),
          if (v == null) null else v)))
      i += 1
    }
    sb.toString()
  }

  override def next(): Boolean = {
    while (inner.next()) {
      val b = inner.get()
      val n = b.numRows()
      val keyCols = ords.map(b.column)
      if (sel == null || sel.length < n) sel = new Array[Int](n)
      var kept = 0
      var i = 0
      while (i < n) {
        if (!deleted.contains(keyOf(keyCols, i))) { sel(kept) = i; kept += 1 }
        i += 1
      }
      if (kept == n) { out = b; return true }
      if (kept > 0) {
        val cols = new Array[ColumnVector](b.numCols())
        var c = 0
        while (c < cols.length) {
          cols(c) = new SelectedColumnVector(b.column(c), sel, kept)
          c += 1
        }
        out = new ColumnarBatch(cols, kept)
        return true
      }
    }
    false
  }
  override def get(): ColumnarBatch = out
  override def close(): Unit = inner.close()
}
