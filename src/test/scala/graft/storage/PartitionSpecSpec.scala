package graft.storage

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import SnapshotPartition._

class PartitionSpecSpec extends AnyFunSuite {

  // ------------------------------------------------------------- encoding

  test("tuple encode/decode round-trips values, escapes and NULL") {
    val cols = Seq("host", "day", "note")
    val values = Seq(Some("a=b/c%d\te"), None, Some("%00"))
    val enc = encodeTuple(cols, values)
    assert(!enc.contains("\t"))
    val dec = decodeTuple(enc)
    assert(dec === Map("host" -> Some("a=b/c%d\te"), "day" -> None,
      "note" -> Some("%00")))
  }

  test("a literal %00 string is distinguishable from SQL NULL") {
    val enc = encodeTuple(Seq("a", "b"), Seq(Some("%00"), None))
    val dec = decodeTuple(enc)
    assert(dec("a") === Some("%00"))
    assert(dec("b") === None)
  }

  test("malformed tuples decode to empty (file kept, never mis-pruned)") {
    assert(decodeTuple("notatuple").isEmpty)
  }

  test("canonicalOf formats each supported type canonically") {
    val row = new GenericInternalRow(Array[Any](
      true, 42, 42L, 1.5f, 2.5, UTF8String.fromString("x"),
      19000, 1700000000000000L, null))
    assert(canonicalOf(BooleanType, row, 0) === Some("true"))
    assert(canonicalOf(IntegerType, row, 1) === Some("42"))
    assert(canonicalOf(LongType, row, 2) === Some("42"))
    assert(canonicalOf(FloatType, row, 3) === Some("1.5"))
    assert(canonicalOf(DoubleType, row, 4) === Some("2.5"))
    assert(canonicalOf(StringType, row, 5) === Some("x"))
    assert(canonicalOf(DateType, row, 6) === Some("2022-01-08"))
    assert(canonicalOf(TimestampType, row, 7) === Some("1700000000000000"))
    assert(canonicalOf(LongType, row, 8) === None)
  }

  // ------------------------------------------- transform interval domains

  private val MicrosPerDay = 86400000000L

  test("days interval evaluation: boundary-exact all/none/split tri-state") {
    val fields = fieldsOf(Seq("days(ts)"),
      StructType(Seq(StructField("ts", TimestampType))))
    // day 5 = [5d, 6d) micros
    val doms = fileDomains(fields, Map("days(ts)" -> Some("5")))
    def ev(f: sources.Filter) = evalFilter(f, doms)
    val d5 = 5 * MicrosPerDay; val d6 = 6 * MicrosPerDay
    // aligned cuts decide definitely
    assert(ev(sources.GreaterThanOrEqual("ts", d5)) === Some(TTrue))
    assert(ev(sources.LessThan("ts", d6)) === Some(TTrue))
    assert(ev(sources.GreaterThanOrEqual("ts", d6)) === Some(TFalse))
    assert(ev(sources.LessThan("ts", d5)) === Some(TFalse))
    // boundary micro-values: last row of the day is d6-1
    assert(ev(sources.LessThanOrEqual("ts", d6 - 1)) === Some(TTrue))
    assert(ev(sources.GreaterThan("ts", d6 - 1)) === Some(TFalse))
    assert(ev(sources.GreaterThan("ts", d5 - 1)) === Some(TTrue))
    // a cut INSIDE the day is undecidable → residual
    assert(ev(sources.GreaterThan("ts", d5 + 1)) === None)
    assert(ev(sources.EqualTo("ts", d5 + 7)) === None)
    // equality outside the day refutes definitely
    assert(ev(sources.EqualTo("ts", d6)) === Some(TFalse))
    // NULL domain: comparisons are NULL, IS NULL is true
    val nullDoms = fileDomains(fields, Map("days(ts)" -> None))
    assert(evalFilter(sources.GreaterThan("ts", d5), nullDoms) === Some(TNull))
    assert(evalFilter(sources.IsNull("ts"), nullDoms) === Some(TTrue))
    assert(evalFilter(sources.IsNull("ts"), doms) === Some(TFalse))
  }

  test("months domains map ordinals to calendar intervals (leap month included)") {
    val fields = fieldsOf(Seq("months(d)"),
      StructType(Seq(StructField("d", DateType))))
    // Feb 2024 (leap): ordinal (2024-1970)*12 + 1 = 649, days 19754..19783
    val doms = fileDomains(fields, Map("months(d)" -> Some("649")))
    val feb1 = java.time.LocalDate.of(2024, 2, 1).toEpochDay
    val mar1 = java.time.LocalDate.of(2024, 3, 1).toEpochDay
    assert(mar1 - feb1 === 29)
    assert(evalFilter(sources.GreaterThanOrEqual("d", java.sql.Date.valueOf("2024-02-01")),
      doms) === Some(TTrue))
    assert(evalFilter(sources.LessThan("d", java.sql.Date.valueOf("2024-03-01")),
      doms) === Some(TTrue))
    assert(evalFilter(sources.LessThanOrEqual("d", java.sql.Date.valueOf("2024-02-29")),
      doms) === Some(TTrue))
    assert(evalFilter(sources.GreaterThan("d", java.sql.Date.valueOf("2024-02-29")),
      doms) === Some(TFalse))
    assert(evalFilter(sources.LessThan("d", java.sql.Date.valueOf("2024-02-15")),
      doms) === None)
  }

  test("bucket domains refute equality and IN, never affirm") {
    val fields = fieldsOf(Seq("bucket[8](u)"),
      StructType(Seq(StructField("u", StringType))))
    val b = bucketOf("hit", 8)
    val doms = fileDomains(fields, Map(s"bucket[8](u)" -> Some(b.toString)))
    // a value hashing into THIS bucket proves nothing → residual
    assert(evalFilter(sources.EqualTo("u", "hit"), doms) === None)
    // find a value in another bucket; it must be refuted definitely
    val miss = (0 to 100).map(i => s"m$i").find(s => bucketOf(s, 8) != b).get
    assert(evalFilter(sources.EqualTo("u", miss), doms) === Some(TFalse))
    assert(evalFilter(sources.In("u", Array(miss)), doms) === Some(TFalse))
    assert(evalFilter(sources.In("u", Array(miss, "hit")), doms) === None)
    // range ops are never decidable on a bucket
    assert(evalFilter(sources.GreaterThan("u", "a"), doms) === None)
  }

  test("transformValue and domainOf agree: a row's value always lands in its own domain") {
    val micros = 1700000123456789L
    val fDays = SnapshotPartition.PartitionField("days", "ts")
    val ord = transformValue(fDays, TimestampType, micros)
    val doms = fileDomains(Seq((fDays, TimestampType)),
      Map("days(ts)" -> Some(ord)))
    assert(evalFilter(sources.EqualTo("ts", micros), doms) === None) // inside
    assert(evalFilter(sources.GreaterThan("ts", micros), doms) === None)
    assert(evalFilter(sources.LessThan("ts", micros - MicrosPerDay), doms) ===
      Some(TFalse))
    // hours
    val fH = SnapshotPartition.PartitionField("hours", "ts")
    val hOrd = transformValue(fH, TimestampType, micros).toLong
    assert(micros / 3600000000L === hOrd)
    // months round-trips through the calendar
    val fM = SnapshotPartition.PartitionField("months", "ts")
    val mOrd = transformValue(fM, TimestampType, micros).toLong
    val ld = java.time.LocalDate.ofEpochDay(micros / MicrosPerDay)
    assert(mOrd === (ld.getYear - 1970) * 12L + ld.getMonthValue - 1)
  }

  test("pre-epoch timestamps: floorDiv keeps negative days exact") {
    val fDays = SnapshotPartition.PartitionField("days", "ts")
    val micros = -1L // one micro before epoch → day -1
    assert(transformValue(fDays, TimestampType, micros) === "-1")
    val doms = fileDomains(Seq((fDays, TimestampType)),
      Map("days(ts)" -> Some("-1")))
    assert(evalFilter(sources.LessThan("ts", 0L), doms) === Some(TTrue))
    assert(evalFilter(sources.GreaterThanOrEqual("ts", 0L), doms) === Some(TFalse))
  }

  // ---------------------------------------------------- filter evaluation

  private val types: Map[String, DataType] =
    Map("k" -> LongType, "s" -> StringType, "d" -> DateType, "x" -> DoubleType)

  private def tup(kv: (String, Option[String])*): Map[String, Option[String]] =
    kv.toMap

  test("equality and ranges over long partitions are definite") {
    val t = tup("k" -> Some("7"))
    assert(evalFilter(sources.EqualTo("k", 7L), types, t) === Some(TTrue))
    assert(evalFilter(sources.EqualTo("k", 8), types, t) === Some(TFalse))
    assert(evalFilter(sources.GreaterThan("k", 6), types, t) === Some(TTrue))
    assert(evalFilter(sources.LessThanOrEqual("k", 6L), types, t) === Some(TFalse))
    assert(evalFilter(sources.In("k", Array(1, 7, 9)), types, t) === Some(TTrue))
    assert(evalFilter(sources.In("k", Array(1, 2)), types, t) === Some(TFalse))
  }

  test("NULL partition values follow SQL three-valued logic") {
    val t = tup("k" -> None)
    assert(evalFilter(sources.EqualTo("k", 7L), types, t) === Some(TNull))
    assert(evalFilter(sources.IsNull("k"), types, t) === Some(TTrue))
    assert(evalFilter(sources.IsNotNull("k"), types, t) === Some(TFalse))
    assert(evalFilter(sources.EqualNullSafe("k", null), types, t) === Some(TTrue))
    assert(evalFilter(sources.EqualNullSafe("k", 7L), types, t) === Some(TFalse))
    // NOT(NULL) is NULL — still excludes the file's rows
    assert(evalFilter(sources.Not(sources.EqualTo("k", 7L)), types, t) === Some(TNull))
    // x IN (..., NULL) with no match is NULL, not FALSE
    assert(evalFilter(sources.In("k", Array(1, null)), types,
      tup("k" -> Some("7"))) === Some(TNull))
  }

  test("string predicates compare in UTF8 binary order and support prefixes") {
    val t = tup("s" -> Some("host-09"))
    assert(evalFilter(sources.GreaterThan("s", "host-08"), types, t) === Some(TTrue))
    assert(evalFilter(sources.StringStartsWith("s", "host-"), types, t) === Some(TTrue))
    assert(evalFilter(sources.StringStartsWith("s", "x"), types, t) === Some(TFalse))
    assert(evalFilter(sources.StringContains("s", "t-0"), types, t) === Some(TTrue))
  }

  test("date partitions compare against external java.sql/java.time literals") {
    val t = tup("d" -> Some("2024-03-01"))
    assert(evalFilter(sources.GreaterThanOrEqual("d",
      java.sql.Date.valueOf("2024-03-01")), types, t) === Some(TTrue))
    assert(evalFilter(sources.LessThan("d",
      java.time.LocalDate.parse("2024-02-01")), types, t) === Some(TFalse))
  }

  test("And/Or short-circuit across an undecidable branch") {
    val t = tup("k" -> Some("7"))
    val undecidable = sources.EqualTo("other", 1) // not a partition column
    assert(evalFilter(sources.And(sources.EqualTo("k", 8), undecidable),
      types, t) === Some(TFalse))
    assert(evalFilter(sources.Or(sources.EqualTo("k", 7), undecidable),
      types, t) === Some(TTrue))
    assert(evalFilter(sources.And(sources.EqualTo("k", 7), undecidable),
      types, t) === None)
    assert(evalFilter(undecidable, types, t) === None)
  }

  test("a file without a tuple entry for the column is undecidable") {
    assert(evalFilter(sources.EqualTo("k", 7L), types, tup()) === None)
  }

  // --------------------------------------------------- manifest round-trip

  test("FileEntry tuples ride the manifest line format") {
    val e = SnapshotTable.FileEntry("/data/f.parquet", 10L, 100L,
      encodeTuple(Seq("k", "s"), Seq(Some("7"), Some("a/b"))))
    // simulate the manifest line round-trip through the parser shape
    val line = s"${e.path}\t${e.rows}\t${e.bytes}\t${e.tuple}"
    val parts = line.split("\t")
    assert(parts.length === 4)
    val back = SnapshotTable.FileEntry(parts(0), parts(1).toLong,
      parts(2).toLong, parts(3))
    assert(back === e)
    assert(decodeTuple(back.tuple) === Map("k" -> Some("7"), "s" -> Some("a/b")))
  }

  test("pre-1970 fractional java.sql.Timestamp literals convert with floor semantics") {
    // -1.5 s = -1500000 micros; a truncating getTime/1000 round-trip
    // yields -500000 (off by +1 s) — and decided partition filters are
    // CONSUMED, so the miss returns wrong rows, not just bad pruning
    val fields = fieldsOf(Seq("ts"),
      StructType(Seq(StructField("ts", TimestampType))))
    val doms = fileDomains(fields, Map("ts" -> Some("-1500000")))
    assert(evalFilter(
      sources.EqualTo("ts", new java.sql.Timestamp(-1500L)), doms) === Some(TTrue))
    assert(evalFilter(
      sources.LessThan("ts", new java.sql.Timestamp(-1000L)), doms) === Some(TTrue))
    assert(evalFilter(
      sources.GreaterThan("ts", new java.sql.Timestamp(-1500L)), doms) === Some(TFalse))
    // positive fractional values keep working
    val doms2 = fileDomains(fields, Map("ts" -> Some("1500000")))
    assert(evalFilter(
      sources.EqualTo("ts", new java.sql.Timestamp(1500L)), doms2) === Some(TTrue))
  }
}
