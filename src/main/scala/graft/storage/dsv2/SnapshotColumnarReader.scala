package graft.storage.dsv2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, LogicalTypeAnnotation, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Vectorized parquet → `ColumnarBatch` reader for the graft-snapshot
  * connector — the 100 TB decode path the row materializer
  * ([[SnapshotPartitionReader]]) documents as its upgrade.
  *
  * Why it is faster: the record-materialization API assembles one
  * `GenericInternalRow` per row through a converter tree (a virtual call
  * and a boxed slot per value, an Array allocation per row). This reader
  * instead drives parquet-column's `ColumnReader` straight into Spark's
  * `OnHeapColumnVector`s, one COLUMN at a time — no per-row allocation,
  * no boxing, decode loops that stay monomorphic per column — and hands
  * Spark a `ColumnarBatch`, so the downstream plan gets the same
  * codegen'd `ColumnarToRow` + whole-stage pipeline as a native parquet
  * scan.
  *
  * Covered shapes: the FLAT analytic surface — BOOLEAN/BYTE/SHORT/INT/
  * LONG/FLOAT/DOUBLE/DATE/TIMESTAMP (INT96 and INT64-annotated)/STRING/
  * BINARY — plus the widening reads schema evolution allows (INT32 file →
  * LONG/DOUBLE column, FLOAT file → DOUBLE column), and (round 12+)
  * DECIMAL, one-level ARRAY of primitives (the embeddings
  * `array<float>` hot path) and MAP<STRING,STRING> through Spark's
  * vectorized nested assembly. Deeper nesting stays on the row reader:
  * [[SnapshotReaderFactory]] decides per scan from the required schema,
  * so mixed tables still read correctly, just row-at-a-time.
  *
  * Skipping contract (same as the row path): file-level pruning happened
  * at plan time from the stats sidecar; pushed intervals become a parquet
  * `FilterPredicate` so ROW GROUPS whose footer min/max cannot match are
  * dropped when the reader opens — and since every filter is also a Spark
  * residual, group-level skipping is I/O-only, never a correctness edge.
  * Columns a pushed predicate references but this (older) file predates
  * are excluded from the predicate, exactly like the row path.
  *
  * Add-column evolution: a required column absent from this file stays an
  * all-null vector. Batches reuse one vector set (`reset()` per batch) —
  * allocation is per reader, not per batch.
  */
final class SnapshotColumnarReader(file: String, required: StructType,
                                   intervals: Map[String, (Double, Double)],
                                   conf: Configuration,
                                   batchSize: Int = 4096)
  extends PartitionReader[ColumnarBatch] {

  // footer pre-read only when filters were pushed: the predicate must
  // be restricted to columns this file actually has (evolution)
  private val applicable: Map[String, (Double, Double)] =
    if (intervals.isEmpty) intervals
    else {
      val fr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
      val present =
        try fr.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
        finally fr.close()
      intervals.filter { case (c, _) => present(c) }
    }

  /** Spark's own vectorized page decoder when it accepts the shape (bulk
    * dictionary/RLE/bit-packed decode straight into column vectors —
    * native-scan speed); the ColumnReadStore fallback otherwise. Both
    * produce identical batches; the fallback also documents the decode
    * loop explicitly. */
  private val delegate: PartitionReader[ColumnarBatch] =
    try new SparkVectorizedDelegate(file, required, applicable, conf, batchSize)
    catch {
      // any init-time refusal (internal-API drift, odd footer) falls
      // back for FLAT shapes; nested/decimal shapes have no fallback
      // decoder, so they fail loudly with the escape hatch named — a
      // clear error, never a silent wrong answer
      case scala.util.control.NonFatal(e) =>
        if (SnapshotColumnar.flat(required))
          new ColumnStoreColumnarReader(file, required, applicable, conf, batchSize)
        else throw new IllegalStateException(
          "graft-snapshot vectorized nested decode failed to initialize " +
            s"for $file — read with option(\"columnar\", \"false\")", e)
    }

  override def next(): Boolean = delegate.next()
  override def get(): ColumnarBatch = delegate.get()
  override def close(): Unit = delegate.close()
}

/** [[org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader]]
  * wrapped as a DSv2 `PartitionReader[ColumnarBatch]`: the exact decode
  * engine behind Spark's native parquet scan (bulk-unpacks pages into
  * `OnHeapColumnVector`s, lazy dictionary materialization), driven here
  * over ONE snapshot data file. Pushed intervals ride the Hadoop conf as
  * a parquet `FilterPredicate` (row-group skipping, same contract as the
  * row path); rebase modes are pinned to CORRECTED because snapshot data
  * files are always written by THIS engine or modern Spark — no legacy
  * hybrid-calendar files exist in a snapshot table. */
private final class SparkVectorizedDelegate(file: String, required: StructType,
                                            intervals: Map[String, (Double, Double)],
                                            conf0: Configuration, batchSize: Int)
  extends PartitionReader[ColumnarBatch] {

  private val path = new org.apache.hadoop.fs.Path(file)
  private val conf = new Configuration(conf0)
  conf.set(
    org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport
      .SPARK_ROW_REQUESTED_SCHEMA, required.json)
  conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
    classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport]
      .getName)
  // the schema converter reads these RAW (`conf.get(...).toBoolean`), and
  // a session-propagated OPTIONAL conf arrives as the string "null" — pin
  // every key it touches, keeping a valid session-set value when present
  private def pin(key: String, v: String): Unit = {
    val cur = conf.get(key)
    if (cur == null || cur == "null") conf.set(key, v)
  }
  pin("spark.sql.parquet.binaryAsString", "false")
  pin("spark.sql.parquet.int96AsTimestamp", "true")
  pin("spark.sql.caseSensitive", "false")
  pin("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
  pin("spark.sql.legacy.parquet.nanosAsLong", "false")
  pin("spark.sql.parquet.fieldId.read.enabled", "false")
  pin("spark.sql.parquet.fieldId.read.ignoreMissing", "false")
  pin("spark.sql.legacy.parquet.allowIncompatibleSchemaChanges", "false")
  SnapshotParquet.predicate(required, intervals).foreach(p =>
    org.apache.parquet.hadoop.ParquetInputFormat.setFilterPredicate(conf, p))

  private val reader =
    new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, batchSize)

  locally {
    var ok = false
    try {
      val len = path.getFileSystem(conf0).getFileStatus(path).getLen
      // the old-API FileSplit (it extends the mapreduce one): Spark's
      // base reader downcasts to it for location info
      val split = new org.apache.hadoop.mapred.FileSplit(
        path, 0, len, Array.empty[String])
      val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
      reader.initialize(split, ctx)
      reader.initBatch(new StructType(),
        org.apache.spark.sql.catalyst.InternalRow.empty)
      reader.enableReturningBatches()
      ok = true
    } finally if (!ok) reader.close()
  }

  override def next(): Boolean = reader.nextBatch()
  override def get(): ColumnarBatch = reader.resultBatch()
  override def close(): Unit = reader.close()
}

/** The self-contained fallback decoder: parquet-column's `ColumnReader`
  * driven straight into `OnHeapColumnVector`s, one column at a time. */
private final class ColumnStoreColumnarReader(
    file: String, required: StructType,
    applicable: Map[String, (Double, Double)],
    conf: Configuration, batchSize: Int)
  extends PartitionReader[ColumnarBatch] {

  private val path = new org.apache.hadoop.fs.Path(file)

  private val reader: ParquetFileReader = {
    val inputFile = HadoopInputFile.fromPath(path, conf)
    val opts = SnapshotParquet.predicate(required, applicable) match {
      case Some(p) => HadoopReadOptions.builder(conf, path)
        .withRecordFilter(FilterCompat.get(p)).build()
      case None => HadoopReadOptions.builder(conf, path).build()
    }
    ParquetFileReader.open(inputFile, opts)
  }

  private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
  private val createdBy: String = reader.getFooter.getFileMetaData.getCreatedBy

  /** The projected parquet schema: required columns present in this file
    * (possibly none — then batches are pure row-counts over null/absent
    * columns, which PageReadStore.getRowCount still gives us). */
  private val projected: MessageType = {
    val fields: Seq[Type] = required.fields.toSeq
      .filter(f => fileSchema.containsField(f.name))
      .map(f => fileSchema.getType(fileSchema.getFieldIndex(f.name)))
    new MessageType(fileSchema.getName, fields.asJava)
  }
  reader.setRequestedSchema(projected)

  /** slot in `required` → projected-field index, or -1 when absent. */
  private val slotToProjected: Array[Int] = required.fields.map { f =>
    if (projected.containsField(f.name)) projected.getFieldIndex(f.name) else -1
  }

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  // ------------------------------------------------------- row-group state
  private var groupRowsLeft: Long = 0L
  private var columnReaders: Array[ColumnReader] = _
  private var maxDefs: Array[Int] = _
  private var kinds: Array[Int] = _

  // decode-kind tags: one WHILE LOOP per kind in fillColumn, so each hot
  // loop's call sites stay monomorphic and JIT-inlinable (a per-value
  // lambda would make one megamorphic site shared by all columns)
  private val K_BOOL = 0; private val K_INT = 1; private val K_SHORT = 2
  private val K_BYTE = 3; private val K_INT_AS_LONG = 4
  private val K_INT_AS_DOUBLE = 5; private val K_LONG = 6
  private val K_LONG_MILLIS = 7; private val K_LONG_NANOS = 8
  private val K_INT96 = 9; private val K_FLOAT = 10
  private val K_FLOAT_AS_DOUBLE = 11; private val K_DOUBLE = 12
  private val K_BINARY = 13

  private def kindOf(slot: Int): Int = {
    val pq = projected.getType(slotToProjected(slot)).asPrimitiveType()
    (pq.getPrimitiveTypeName, required.fields(slot).dataType) match {
      case (PrimitiveTypeName.BOOLEAN, BooleanType) => K_BOOL
      case (PrimitiveTypeName.INT32, IntegerType | DateType) => K_INT
      case (PrimitiveTypeName.INT32, ShortType) => K_SHORT
      case (PrimitiveTypeName.INT32, ByteType) => K_BYTE
      case (PrimitiveTypeName.INT32, LongType) => K_INT_AS_LONG // widened
      case (PrimitiveTypeName.INT32, DoubleType) => K_INT_AS_DOUBLE // widened
      case (PrimitiveTypeName.INT64, LongType) => K_LONG
      case (PrimitiveTypeName.INT64, TimestampType | TimestampNTZType) =>
        pq.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => K_LONG_MILLIS
              case LogicalTypeAnnotation.TimeUnit.MICROS => K_LONG
              case LogicalTypeAnnotation.TimeUnit.NANOS => K_LONG_NANOS
            }
          case _ => K_LONG
        }
      case (PrimitiveTypeName.INT96, TimestampType | TimestampNTZType) => K_INT96
      case (PrimitiveTypeName.FLOAT, FloatType) => K_FLOAT
      case (PrimitiveTypeName.FLOAT, DoubleType) => K_FLOAT_AS_DOUBLE // widened
      case (PrimitiveTypeName.DOUBLE, DoubleType) => K_DOUBLE
      case (PrimitiveTypeName.BINARY, StringType | BinaryType) => K_BINARY
      case (p, s) => throw new UnsupportedOperationException(
        s"graft-snapshot columnar reader: unsupported column shape $p/$s " +
          "(read with option columnar=false)")
    }
  }

  /** One tight decode loop per kind. `def`-level null check per value is
    * unavoidable with optional columns; everything else is a primitive
    * put into the vector's backing array. */
  private def fillColumn(kind: Int, cr: ColumnReader, v: OnHeapColumnVector,
                         maxDef: Int, n: Int): Unit = {
    var i = 0
    kind match {
      case K_BOOL => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putBoolean(i, cr.getBoolean)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_INT => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putInt(i, cr.getInteger)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_SHORT => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putShort(i, cr.getInteger.toShort)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_BYTE => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putByte(i, cr.getInteger.toByte)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_INT_AS_LONG => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putLong(i, cr.getInteger.toLong)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_INT_AS_DOUBLE => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putDouble(i, cr.getInteger.toDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_LONG => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putLong(i, cr.getLong)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_LONG_MILLIS => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putLong(i, cr.getLong * 1000L)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_LONG_NANOS => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putLong(i, cr.getLong / 1000L)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_INT96 => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putLong(i, SnapshotParquet.int96ToMicros(cr.getBinary))
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_FLOAT => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putFloat(i, cr.getFloat)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_FLOAT_AS_DOUBLE => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef)
          v.putDouble(i, cr.getFloat.toDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_DOUBLE => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) v.putDouble(i, cr.getDouble)
        else v.putNull(i)
        cr.consume(); i += 1
      }
      case K_BINARY => while (i < n) {
        if (cr.getCurrentDefinitionLevel == maxDef) {
          // toByteBuffer avoids Binary.getBytes' defensive copy when the
          // value is heap-backed (the common page layout)
          val bb = cr.getBinary.toByteBuffer
          if (bb.hasArray)
            v.putByteArray(i, bb.array, bb.arrayOffset + bb.position(), bb.remaining())
          else {
            val b = cr.getBinary.getBytes
            v.putByteArray(i, b, 0, b.length)
          }
        } else v.putNull(i)
        cr.consume(); i += 1
      }
    }
  }

  private def advanceRowGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) return false
    groupRowsLeft = pages.getRowCount
    val store = new ColumnReadStoreImpl(pages,
      NoopConverter.forType(projected)
        .asInstanceOf[org.apache.parquet.io.api.GroupConverter],
      projected, createdBy)
    columnReaders = new Array[ColumnReader](required.length)
    maxDefs = new Array[Int](required.length)
    kinds = new Array[Int](required.length)
    var s = 0
    while (s < required.length) {
      val p = slotToProjected(s)
      if (p >= 0) {
        // projected is FLAT: column order == field order
        val desc = projected.getColumns.get(p)
        columnReaders(s) = store.getColumnReader(desc)
        maxDefs(s) = desc.getMaxDefinitionLevel
        kinds(s) = kindOf(s)
      }
      s += 1
    }
    true
  }

  override def next(): Boolean = {
    if (groupRowsLeft <= 0L && !advanceRowGroup()) return false
    val n = math.min(batchSize.toLong, groupRowsLeft).toInt
    var s = 0
    while (s < required.length) {
      val vec = vectors(s)
      vec.reset()
      val cr = columnReaders(s)
      if (cr == null) vec.putNulls(0, n) // evolved column this file predates
      else fillColumn(kinds(s), cr, vec, maxDefs(s), n)
      s += 1
    }
    groupRowsLeft -= n
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    batch.close()
    reader.close()
  }
}

private[dsv2] object SnapshotColumnar {

  private def flatType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | StringType | BinaryType => true
    case _ => false
  }

  /** The flat-primitive surface BOTH columnar decoders cover (the
    * ColumnReadStore fallback is flat-only). */
  def flat(schema: StructType): Boolean =
    schema.nonEmpty && schema.fields.forall(f => flatType(f.dataType))

  /** Spark types the columnar path decodes (per scan, from the REQUIRED
    * schema — the file-side physical variants, INT96 included, are
    * handled at open time): the flat primitives, DECIMAL, one-level
    * ARRAY of primitives (the embeddings `array<float>` shape — Spark's
    * vectorized reader assembles nested columns since 3.3), and
    * MAP<STRING,STRING>. Everything else routes to the row reader. */
  def supported(schema: StructType): Boolean =
    schema.nonEmpty && schema.fields.forall(_.dataType match {
      case dt if flatType(dt) => true
      case _: DecimalType => true
      case ArrayType(elem, _) => flatType(elem) || elem.isInstanceOf[DecimalType]
      case MapType(StringType, StringType, _) => true
      case _ => false
    })
}
