package graft.storage.dsv2

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.hadoop.api.ReadSupport.ReadContext
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side parquet → `InternalRow` reader for the graft-snapshot
  * connector: parquet-hadoop's record materialization API with a
  * hand-written converter tree targeting Catalyst's internal
  * representations directly (UTF8String / micros-long timestamps /
  * days-int dates / GenericArrayData / ArrayBasedMapData) — no
  * row-to-row copy layer.
  *
  * Reads ONLY the projected columns (the requested schema handed to
  * parquet is the pruned one) and hands parquet a `FilterPredicate`
  * rebuilt from the pushed per-column intervals, so row groups whose
  * footer min/max cannot match are skipped executor-side — the second
  * half of the skipping story after the manifest-level file pruning.
  *
  * Correctness stance: parquet-level filtering is best-effort I/O
  * reduction; Spark re-evaluates every filter post-scan (the connector
  * returns all of them as residuals), so a too-wide read is invisible
  * and a too-narrow read is impossible by construction (non-strict
  * interval bounds only).
  *
  * This row materializer serves the shapes the vectorized path
  * ([[SnapshotColumnarReader]]) does not cover (nested arrays/maps,
  * decimals, empty projections) and the explicit `columnar=false`
  * escape hatch — flat analytic scans take the columnar path by
  * default. It trades peak decode speed for exactness over the full
  * type surface with zero internal-API dependence.
  */
final class SnapshotPartitionReader(file: String, required: StructType,
                                    intervals: Map[String, (Double, Double)],
                                    conf: Configuration,
                                    dvPath: String = "",
                                    emitMeta: Boolean = false,
                                    keepOnly: Array[Long] = null)
  extends PartitionReader[InternalRow] {

  // MERGE-ON-READ: the file's deletion vector (sorted row ordinals to
  // skip), loaded executor-side. Position tracking requires the reader
  // to see EVERY row of the file in order, so parquet-level row-group
  // filtering is disabled for DV-bearing files and for scans emitting
  // the `_pos` metadata column (I/O-only cost; Spark's residual filters
  // still apply exactly).
  private val dv: Array[Long] =
    if (dvPath.isEmpty) Array.emptyLongArray
    else graft.storage.DeletionVectors.read(conf, dvPath)

  // metadata-column slots in the required schema (`_file` STRING /
  // `_pos` LONG), filled reader-side — parquet never sees these names
  private val fileSlot = if (emitMeta) required.fieldNames.indexOf("_file") else -1
  private val posSlot = if (emitMeta) required.fieldNames.indexOf("_pos") else -1
  // `keepOnly` inverts the vector walk: emit ONLY these sorted ordinals
  // (the change feed's "read exactly the newly-deleted rows" shape),
  // with early termination once the set is exhausted
  private val needOrdinals = dv.nonEmpty || posSlot >= 0 || keepOnly != null

  private val reader: ParquetReader[InternalRow] = {
    val path = new org.apache.hadoop.fs.Path(file)
    // footer pre-read ONLY when filters were pushed: a pushed predicate
    // may reference a column an OLDER file predates (add-column
    // evolution) — parquet's filter validator rejects predicates on
    // absent columns, so restrict the predicate to this file's own
    // columns (the absent column is null here, and Spark's residual
    // filter still applies exactly). An unfiltered scan skips the extra
    // footer read entirely.
    val applicable =
      if (intervals.isEmpty || needOrdinals) Map.empty[String, (Double, Double)]
      else {
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
        val presentCols =
          try fr.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
          finally fr.close()
        intervals.filter { case (c, _) => presentCols(c) }
      }
    val base = ParquetReader
      .builder(new RowReadSupport(required), path)
      .withConf(conf)
    SnapshotParquet.predicate(required, applicable) match {
      case Some(p) => base.withFilter(FilterCompat.get(p)).build()
      case None => base.build()
    }
  }

  private val fileUtf8 =
    if (fileSlot >= 0) UTF8String.fromString(file) else null

  private var cur: InternalRow = _
  private var pos = -1L // ordinal of `cur` within the file
  private var dvIdx = 0 // next deletion-vector entry (sorted walk)
  private var keepIdx = 0 // next keepOnly entry (sorted walk)

  override def next(): Boolean = {
    while (true) {
      if (keepOnly != null && keepIdx >= keepOnly.length) return false
      cur = reader.read()
      if (cur == null) return false
      pos += 1
      val deleted =
        dvIdx < dv.length && dv(dvIdx) == pos && { dvIdx += 1; true }
      val kept = keepOnly == null ||
        (keepOnly(keepIdx) == pos && { keepIdx += 1; true })
      if (!deleted && kept) {
        if (fileSlot >= 0) cur.update(fileSlot, fileUtf8)
        if (posSlot >= 0) cur.update(posSlot, pos)
        return true
      }
    }
    false // unreachable
  }
  override def get(): InternalRow = cur
  override def close(): Unit = reader.close()
}

object SnapshotParquet {

  /** Rebuild the pushed intervals as a parquet `FilterPredicate` (typed
    * by the SPARK column type — the physical type parquet requires must
    * agree, which holds because the table schema was inferred from these
    * same files).
    *
    * Every bound is CONSERVATIVE, never tight: the interval came through
    * a double (`Filter` values fold via `doubleValue()`), which is LOSSY
    * for longs ≥ 2^53 — a ⌈lo⌉-style "exact" long bound built from the
    * rounded double could exclude the genuinely matching row, and a
    * record-level parquet filter that drops a row is unrecoverable
    * (Spark's residual never sees it). So integer bounds widen to
    * ⌊lo⌋/⌈hi⌉ and float bounds step one ulp outward; the residual
    * filter discards the at-most-one extra boundary value. I/O-only
    * pruning, correctness untouched — the same contract as the stats
    * sidecar. Unsupported column types simply contribute nothing. */
  def predicate(schema: StructType,
                intervals: Map[String, (Double, Double)]): Option[FilterPredicate] = {
    val leaves = intervals.toSeq.sortBy(_._1).flatMap { case (name, (lo, hi)) =>
      schema.fields.find(_.name == name).toSeq.flatMap { f =>
        f.dataType match {
          case IntegerType | DateType =>
            val c = FilterApi.intColumn(name)
            opt(lo != Double.NegativeInfinity,
              FilterApi.gtEq(c, Int.box(math.floor(lo).toInt))) ++
              opt(hi != Double.PositiveInfinity,
                FilterApi.ltEq(c, Int.box(math.ceil(hi).toInt)))
          case LongType =>
            val c = FilterApi.longColumn(name)
            // the original long bound was rounded to the nearest double,
            // an error of up to ulp/2 (512 at 2^62 — snowflake-id
            // territory); widen by a FULL ulp so the true bound is
            // always inside. Scala's Double.toLong saturates at the
            // long range, so ±overflow degrades to a vacuous bound.
            opt(lo != Double.NegativeInfinity,
              FilterApi.gtEq(c, Long.box(math.floor(lo - Math.ulp(lo)).toLong))) ++
              opt(hi != Double.PositiveInfinity,
                FilterApi.ltEq(c, Long.box(math.ceil(hi + Math.ulp(hi)).toLong)))
          case FloatType =>
            val c = FilterApi.floatColumn(name)
            opt(lo != Double.NegativeInfinity,
              FilterApi.gtEq(c, Float.box(math.nextDown(lo.toFloat)))) ++
              opt(hi != Double.PositiveInfinity,
                FilterApi.ltEq(c, Float.box(math.nextUp(hi.toFloat))))
          case DoubleType =>
            val c = FilterApi.doubleColumn(name)
            opt(lo != Double.NegativeInfinity, FilterApi.gtEq(c, Double.box(lo))) ++
              opt(hi != Double.PositiveInfinity, FilterApi.ltEq(c, Double.box(hi)))
          case _ => Seq.empty
        }
      }
    }
    leaves.reduceOption(FilterApi.and)
  }


  private def opt(cond: Boolean, p: => FilterPredicate): Seq[FilterPredicate] =
    if (cond) Seq(p) else Seq.empty

  /** Julian-day + nanos-of-day INT96 → micros since epoch (the classic
    * Impala/Spark timestamp encoding; 2440588 = epoch's julian day). */
  def int96ToMicros(b: Binary): Long = {
    val bytes = b.getBytes
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong(0)
    val julianDay = buf.getInt(8)
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }
}

/** ReadSupport: projects the file schema down to the required columns
  * (or a single cheap column for an empty projection — `count(*)` still
  * needs record boundaries) and wires the materializer. */
final class RowReadSupport(required: StructType) extends ReadSupport[InternalRow] {

  override def init(context: InitContext): ReadContext = {
    val fileSchema = context.getFileSchema
    // add-column evolution: a required column ABSENT from this (older)
    // file is simply not requested — its slot stays null in every row
    val present = required.fields.toSeq.filter(f => fileSchema.containsField(f.name))
    val projected =
      if (present.isEmpty)
        new MessageType(fileSchema.getName, fileSchema.getFields.get(0))
      else {
        val fields: Seq[Type] = present.map(f =>
          fileSchema.getType(fileSchema.getFieldIndex(f.name)))
        new MessageType(fileSchema.getName, fields.asJava)
      }
    new ReadContext(projected)
  }

  override def prepareForRead(conf: Configuration,
                              metadata: java.util.Map[String, String],
                              fileSchema: MessageType,
                              readContext: ReadContext): RecordMaterializer[InternalRow] =
    new RowMaterializer(readContext.getRequestedSchema, required)
}

private final class RowMaterializer(requested: MessageType, required: StructType)
  extends RecordMaterializer[InternalRow] {
  private val root = new RootConverter(requested, required)
  override def getCurrentRecord: InternalRow = root.currentRow
  override def getRootConverter: GroupConverter = root
}

/** Root record converter: one slot per required column, bound to the
  * REQUESTED parquet fields BY NAME — after add-column evolution the
  * requested schema can be a subset of the required one (older file),
  * and unbound slots stay null. Empty projections (count-star) and the
  * placeholder column they request ignore all values and emit width-0
  * rows. */
private final class RootConverter(requested: MessageType, required: StructType)
  extends GroupConverter {

  private val values = new Array[Any](required.length)

  private val slotByName: Map[String, Int] =
    required.fieldNames.zipWithIndex.toMap

  private val converters: Array[Converter] =
    (0 until requested.getFieldCount).map { i =>
      val pq = requested.getType(i)
      slotByName.get(pq.getName) match {
        case Some(slot) =>
          CatalystConverters.make(pq, required.fields(slot).dataType,
            v => values(slot) = v)
        case None => // the count-star placeholder column
          NoopConverter.forType(pq)
      }
    }.toArray

  var currentRow: InternalRow = _

  override def getConverter(fieldIndex: Int): Converter = converters(fieldIndex)
  override def start(): Unit = java.util.Arrays.fill(values.asInstanceOf[Array[AnyRef]], null)
  override def end(): Unit =
    currentRow =
      if (required.isEmpty) new GenericInternalRow(0)
      else new GenericInternalRow(values.clone())
}

/** Discards values — used for the placeholder column of an empty
  * projection, and as the dummy converter tree the columnar reader's
  * `ColumnReadStoreImpl` requires (its typed getters never touch it).
  * Must still match the parquet shape (group vs primitive). */
private[dsv2] object NoopConverter {
  def forType(t: Type): Converter =
    if (t.isPrimitive) new PrimitiveConverter {
      override def addBinary(value: Binary): Unit = ()
      override def addBoolean(value: Boolean): Unit = ()
      override def addDouble(value: Double): Unit = ()
      override def addFloat(value: Float): Unit = ()
      override def addInt(value: Int): Unit = ()
      override def addLong(value: Long): Unit = ()
    }
    else new GroupConverter {
      private val g = t.asGroupType()
      override def getConverter(i: Int): Converter = forType(g.getType(i))
      override def start(): Unit = ()
      override def end(): Unit = ()
    }
}

/** Parquet-to-Catalyst converter factory for the supported type surface. */
private object CatalystConverters {

  def make(parquet: Type, spark: DataType, update: Any => Unit): Converter =
    (parquet, spark) match {
      case (p: PrimitiveType, _) => primitive(p, spark, update)
      case (g: GroupType, ArrayType(elem, _)) => new ListConverter(g, elem, update)
      case (g: GroupType, MapType(StringType, StringType, _)) =>
        new StringMapConverter(g, update)
      case _ => throw new UnsupportedOperationException(
        s"graft-snapshot reader: unsupported column shape $spark for parquet $parquet " +
          "(flat analytic types, ARRAY of primitives, and MAP<STRING,STRING> are supported)")
    }

  private def primitive(p: PrimitiveType, spark: DataType,
                        update: Any => Unit): Converter =
    (p.getPrimitiveTypeName, spark) match {
      case (PrimitiveTypeName.INT96, TimestampType | TimestampNTZType) =>
        new PrimitiveConverter {
          override def addBinary(b: Binary): Unit =
            update(SnapshotParquet.int96ToMicros(b))
        }
      case (_, BooleanType) => new PrimitiveConverter {
        override def addBoolean(v: Boolean): Unit = update(v)
      }
      case (_, IntegerType | DateType | ShortType | ByteType) => new PrimitiveConverter {
        override def addInt(v: Int): Unit = spark match {
          case ShortType => update(v.toShort)
          case ByteType => update(v.toByte)
          case _ => update(v)
        }
      }
      // type-widening evolution: an INT32 file column read as the
      // table's widened long/double, a FLOAT file column as double
      case (PrimitiveTypeName.INT32, LongType) => new PrimitiveConverter {
        override def addInt(v: Int): Unit = update(v.toLong)
      }
      case (PrimitiveTypeName.INT32, DoubleType) => new PrimitiveConverter {
        override def addInt(v: Int): Unit = update(v.toDouble)
      }
      case (PrimitiveTypeName.FLOAT, DoubleType) => new PrimitiveConverter {
        override def addFloat(v: Float): Unit = update(v.toDouble)
      }
      case (PrimitiveTypeName.INT64, TimestampType | TimestampNTZType) =>
        val toMicros: Long => Long = p.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => identity
              case LogicalTypeAnnotation.TimeUnit.NANOS => _ / 1000L
            }
          case _ => identity
        }
        new PrimitiveConverter {
          override def addLong(v: Long): Unit = update(toMicros(v))
        }
      case (_, LongType) => new PrimitiveConverter {
        override def addLong(v: Long): Unit = update(v)
      }
      case (_, FloatType) => new PrimitiveConverter {
        override def addFloat(v: Float): Unit = update(v)
      }
      case (_, DoubleType) => new PrimitiveConverter {
        override def addDouble(v: Double): Unit = update(v)
      }
      case (_, StringType) => new PrimitiveConverter {
        override def addBinary(b: Binary): Unit =
          update(UTF8String.fromBytes(b.getBytes))
      }
      case (_, BinaryType) => new PrimitiveConverter {
        override def addBinary(b: Binary): Unit = update(b.getBytes)
      }
      case (PrimitiveTypeName.INT32, d: DecimalType) => new PrimitiveConverter {
        override def addInt(v: Int): Unit =
          update(Decimal(v.toLong, d.precision, d.scale))
      }
      case (PrimitiveTypeName.INT64, d: DecimalType) => new PrimitiveConverter {
        override def addLong(v: Long): Unit =
          update(Decimal(v, d.precision, d.scale))
      }
      case (PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY | PrimitiveTypeName.BINARY,
            d: DecimalType) => new PrimitiveConverter {
        override def addBinary(b: Binary): Unit =
          update(Decimal(new java.math.BigDecimal(
            new java.math.BigInteger(b.getBytes), d.scale), d.precision, d.scale))
      }
      case (pt, st) => throw new UnsupportedOperationException(
        s"graft-snapshot reader: unsupported primitive $pt for Spark type $st")
    }

  /** Standard 3-level parquet LIST: `group (LIST) { repeated group list
    * { element } }` (any single-field repeated-group naming accepted). */
  private final class ListConverter(g: GroupType, elem: DataType,
                                    update: Any => Unit) extends GroupConverter {
    require(g.getFieldCount == 1 && !g.getType(0).isPrimitive,
      s"unsupported parquet list shape: $g")
    private val buf = new ArrayBuffer[Any]
    private val repeated = g.getType(0).asGroupType()
    require(repeated.getFieldCount == 1, s"unsupported parquet list shape: $g")
    private val inner = new GroupConverter {
      private var slot: Any = null
      private val elemConv =
        CatalystConverters.make(repeated.getType(0), elem, v => slot = v)
      override def getConverter(i: Int): Converter = elemConv
      override def start(): Unit = slot = null
      override def end(): Unit = buf += slot
    }
    override def getConverter(i: Int): Converter = inner
    override def start(): Unit = buf.clear()
    override def end(): Unit = update(new GenericArrayData(buf.toArray))
  }

  /** Standard parquet MAP of string→string: `group (MAP) { repeated
    * group key_value { key, value } }` — the Datapoint dimensions shape. */
  private final class StringMapConverter(g: GroupType, update: Any => Unit)
    extends GroupConverter {
    require(g.getFieldCount == 1 && !g.getType(0).isPrimitive,
      s"unsupported parquet map shape: $g")
    private val kv = g.getType(0).asGroupType()
    require(kv.getFieldCount == 2, s"unsupported parquet map shape: $g")
    private val keys = new ArrayBuffer[Any]
    private val vals = new ArrayBuffer[Any]
    private val inner = new GroupConverter {
      private var k: Any = null
      private var v: Any = null
      private val kc = new PrimitiveConverter {
        override def addBinary(b: Binary): Unit = k = UTF8String.fromBytes(b.getBytes)
      }
      private val vc = new PrimitiveConverter {
        override def addBinary(b: Binary): Unit = v = UTF8String.fromBytes(b.getBytes)
      }
      override def getConverter(i: Int): Converter = if (i == 0) kc else vc
      override def start(): Unit = { k = null; v = null }
      override def end(): Unit = { keys += k; vals += v }
    }
    override def getConverter(i: Int): Converter = inner
    override def start(): Unit = { keys.clear(); vals.clear() }
    override def end(): Unit = update(new ArrayBasedMapData(
      new GenericArrayData(keys.toArray), new GenericArrayData(vals.toArray)))
  }
}
