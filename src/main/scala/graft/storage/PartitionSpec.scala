package graft.storage

import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Identity partitioning for the snapshot table format — the Iceberg
  * shape, not the Hive one: data files keep EVERY column (a constant
  * column RLE-compresses to nothing), and the partition tuple each file
  * covers is recorded in the MANIFEST (`path\trows\tbytes\t<tuple>`),
  * with the column list on a `#partition c1,c2` metadata line carried by
  * every commit. Because membership is manifest metadata, partition
  * pruning is an exact driver-side decision over one manifest read — no
  * directory listings, no stats heuristics — and because the files are
  * self-contained, every existing reader (library, DSv2 row/columnar,
  * change feed, time travel) works on partitioned tables unchanged.
  *
  * The pruning contract is stronger than stats skipping: a file's tuple
  * is EXACT (every row of the file holds precisely these values), so a
  * supported predicate over partition columns evaluates to a definite
  * SQL tri-state per file. That exactness is what lets the scan CONSUME
  * such predicates (no residual re-evaluation) and answer
  * partition-filtered `count(*)` from the manifest alone.
  *
  * Tuple wire format: `c1=<enc>/c2=<enc>` where `<enc>` percent-encodes
  * `% = / TAB LF CR` and a SQL NULL value is the bare token `%00`
  * (unambiguous: a real "%00" string encodes as `%2500`). Values are
  * stored in a canonical per-type string form (see [[canonicalOf]]) so
  * equality of encoded tuples is equality of values. */
object SnapshotPartition {

  /** The partition-column types supported — the flat analytic surface
    * partition keys actually use. Anything else is refused at write
    * time, never silently mis-encoded. */
  def supportedType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  // ------------------------------------------------------------ encoding

  private val NullToken = "%00"

  private def encodeValue(v: String): String = {
    val sb = new StringBuilder(v.length)
    v.foreach {
      case c @ ('%' | '=' | '/' | '\t' | '\n' | '\r') =>
        sb.append(f"%%${c.toInt}%02X")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def decodeValue(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `cols` zipped with canonical values (None = SQL NULL) → the tuple
    * string stored in the manifest entry. */
  def encodeTuple(cols: Seq[String], values: Seq[Option[String]]): String = {
    require(cols.length == values.length, "cols/values arity mismatch")
    cols.zip(values).map { case (c, v) =>
      s"$c=${v.map(encodeValue).getOrElse(NullToken)}"
    }.mkString("/")
  }

  /** Tuple string → column → canonical value (None = SQL NULL). A
    * malformed tuple decodes to empty (the file is then never pruned —
    * the usual no-false-negative degradation). */
  def decodeTuple(s: String): Map[String, Option[String]] =
    try s.split("/").iterator.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"malformed tuple segment '$kv'")
      val raw = kv.substring(i + 1)
      kv.substring(0, i) ->
        (if (raw == NullToken) None else Some(decodeValue(raw)))
    }.toMap
    catch { case _: Exception => Map.empty }

  // ------------------------------------- canonical per-type value forms

  /** Canonical string for the partition value at ordinal `i` (None =
    * SQL NULL) — integral types as decimal, floats via their own
    * `toString` (round-trips exactly), dates as ISO local dates,
    * timestamps as epoch micros (timezone-free). */
  def canonicalOf(dt: DataType, row: SpecializedGetters, i: Int): Option[String] =
    if (row.isNullAt(i)) None
    else Some(canonicalOfValue(dt, dt match {
      case BooleanType => row.getBoolean(i)
      case ByteType => row.getByte(i)
      case ShortType => row.getShort(i)
      case IntegerType => row.getInt(i)
      case LongType => row.getLong(i)
      case FloatType => row.getFloat(i)
      case DoubleType => row.getDouble(i)
      case StringType => row.getUTF8String(i)
      case DateType => row.getInt(i)
      case TimestampType | TimestampNTZType => row.getLong(i)
      case other => throw new UnsupportedOperationException(
        s"unsupported partition column type $other")
    }))

  /** Same canonicalization from a non-null INTERNAL value (what
    * `Expression.eval` yields: `UTF8String`, days-Int, micros-Long).
    * [[canonicalOf]] delegates here so the row-side and expression-side
    * writers can never diverge. */
  def canonicalOfValue(dt: DataType, v: Any): String = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => v.toString
    case StringType => v.toString
    case DateType =>
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case TimestampType | TimestampNTZType => v.toString
    case other => throw new UnsupportedOperationException(
      s"unsupported partition column type $other")
  }

  /** A pushed-filter LITERAL in canonical comparable form, or None for a
    * class this evaluator does not understand (→ the filter stays
    * residual). Accepts both the EXTERNAL values v1 `Filter`s carry
    * (String, java.sql dates/timestamps, java.time, boxed numerics) and
    * the INTERNAL values V2 `Literal`s carry (UTF8String, days-Int,
    * micros-Long). */
  private def litComparable(dt: DataType, v: Any): Option[Any] = dt match {
    case StringType => v match {
      case s: String => Some(s)
      case u: UTF8String => Some(u.toString)
      case _ => None
    }
    case BooleanType => v match {
      case b: Boolean => Some(b)
      case _ => None
    }
    case ByteType | ShortType | IntegerType | LongType => v match {
      case n: Byte => Some(n.toLong)
      case n: Short => Some(n.toLong)
      case n: Int => Some(n.toLong)
      case n: Long => Some(n.toLong)
      case d: java.math.BigDecimal if d.stripTrailingZeros.scale <= 0 =>
        Some(d.longValueExact())
      case _ => None
    }
    case FloatType | DoubleType => v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    case DateType => v match {
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case days: Int => Some(days.toLong)
      case _ => None
    }
    case TimestampType | TimestampNTZType => v match {
      case t: java.sql.Timestamp =>
        Some(t.getTime / 1000L * 1000000L + t.getNanos.toLong / 1000L)
      case t: java.time.Instant =>
        Some(t.getEpochSecond * 1000000L + t.getNano.toLong / 1000L)
      case t: java.time.LocalDateTime =>
        Some(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano.toLong / 1000L)
      case micros: Long => Some(micros)
      case _ => None
    }
    case _ => None
  }

  /** Stored canonical value in the same comparable domain. */
  private def storedComparable(dt: DataType, s: String): Option[Any] =
    try dt match {
      case StringType => Some(s)
      case BooleanType => Some(s.toBoolean)
      case ByteType | ShortType | IntegerType | LongType => Some(s.toLong)
      // float canonical strings re-parse as FLOAT first: "1.1".toDouble
      // ≠ 1.1f widened to double, and the literal side arrives widened —
      // parsing to double directly would false-negative-prune
      case FloatType => Some(s.toFloat.toDouble)
      case DoubleType => Some(s.toDouble)
      case DateType => Some(java.time.LocalDate.parse(s).toEpochDay)
      case TimestampType | TimestampNTZType => Some(s.toLong)
      case _ => None
    } catch { case _: Exception => None }

  /** Spark-semantics comparison of stored vs literal: strings in UTF-8
    * binary order (what Spark's string ordering actually is), doubles
    * with `java.lang.Double.compare` (NaN = NaN is TRUE and NaN sorts
    * greatest — Spark's ordering, not IEEE's). None ⇒ incomparable
    * (filter stays residual). */
  private def cmp(dt: DataType, stored: String, lit: Any): Option[Int] =
    for { s <- storedComparable(dt, stored); l <- litComparable(dt, lit) }
    yield (s, l) match {
      case (a: String, b: String) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
      case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
      case (a: Long, b: Long) => java.lang.Long.compare(a, b)
      case (a: Double, b: Double) => java.lang.Double.compare(a, b)
      case _ => return None
    }

  // --------------------------------------- SQL tri-state filter evaluator

  /** SQL three-valued logic: a predicate over a file's exact tuple is
    * True, False, or Null — all three DEFINITE outcomes (False and Null
    * both exclude the row). The evaluator's outer Option is a fourth
    * state: None = "cannot decide" (unsupported shape, non-partition
    * column) — the file must be kept and the filter must stay residual. */
  sealed trait T3
  case object TTrue extends T3
  case object TFalse extends T3
  case object TNull extends T3

  private def not3(t: T3): T3 = t match {
    case TTrue => TFalse; case TFalse => TTrue; case TNull => TNull
  }
  private def and3(a: T3, b: T3): T3 =
    if (a == TFalse || b == TFalse) TFalse
    else if (a == TTrue && b == TTrue) TTrue else TNull
  private def or3(a: T3, b: T3): T3 =
    if (a == TTrue || b == TTrue) TTrue
    else if (a == TFalse && b == TFalse) TFalse else TNull

  /** Evaluate a pushed v1 [[Filter]] against one file's partition tuple.
    * `types` maps each partition column to its table type; `tuple` is
    * the file's decoded tuple. Kleene logic composes And/Or/Not so a
    * decidable branch can short-circuit an undecidable one. */
  def evalFilter(f: Filter, types: Map[String, DataType],
                 tuple: Map[String, Option[String]]): Option[T3] = {
    def stored(c: String): Option[Option[String]] =
      if (types.contains(c)) tuple.get(c) else None
    def compare(c: String, v: Any)(test: Int => Boolean): Option[T3] =
      stored(c).flatMap {
        case None => Some(TNull) // NULL compared to anything is NULL
        case Some(s) =>
          if (v == null) Some(TNull)
          else cmp(types(c), s, v).map(r => if (test(r)) TTrue else TFalse)
      }
    f match {
      case sources.AlwaysTrue() => Some(TTrue)
      case sources.AlwaysFalse() => Some(TFalse)
      case sources.IsNull(c) =>
        stored(c).map(s => if (s.isEmpty) TTrue else TFalse)
      case sources.IsNotNull(c) =>
        stored(c).map(s => if (s.isDefined) TTrue else TFalse)
      case sources.EqualTo(c, v) => compare(c, v)(_ == 0)
      case sources.EqualNullSafe(c, v) =>
        stored(c).flatMap {
          case None => Some(if (v == null) TTrue else TFalse)
          case Some(s) =>
            if (v == null) Some(TFalse)
            else cmp(types(c), s, v).map(r => if (r == 0) TTrue else TFalse)
        }
      case sources.GreaterThan(c, v) => compare(c, v)(_ > 0)
      case sources.GreaterThanOrEqual(c, v) => compare(c, v)(_ >= 0)
      case sources.LessThan(c, v) => compare(c, v)(_ < 0)
      case sources.LessThanOrEqual(c, v) => compare(c, v)(_ <= 0)
      case sources.In(c, vs) =>
        stored(c).flatMap {
          case None => Some(TNull)
          case Some(s) =>
            val hasNull = vs.contains(null)
            val results = vs.filter(_ != null)
              .map(v => cmp(types(c), s, v).map(_ == 0))
            if (results.exists(_.isEmpty)) None // some element incomparable
            else if (results.exists(_.contains(true))) Some(TTrue)
            else if (hasNull) Some(TNull) // x IN (..., NULL) with no match
            else Some(TFalse)
        }
      case sources.StringStartsWith(c, p) =>
        if (types.get(c).contains(StringType))
          stored(c).map {
            case None => TNull
            case Some(s) => if (s.startsWith(p)) TTrue else TFalse
          }
        else None
      case sources.StringEndsWith(c, p) =>
        if (types.get(c).contains(StringType))
          stored(c).map {
            case None => TNull
            case Some(s) => if (s.endsWith(p)) TTrue else TFalse
          }
        else None
      case sources.StringContains(c, p) =>
        if (types.get(c).contains(StringType))
          stored(c).map {
            case None => TNull
            case Some(s) => if (s.contains(p)) TTrue else TFalse
          }
        else None
      case sources.And(l, r) =>
        (evalFilter(l, types, tuple), evalFilter(r, types, tuple)) match {
          // FALSE dominates even an undecidable sibling
          case (Some(TFalse), _) | (_, Some(TFalse)) => Some(TFalse)
          case (Some(a), Some(b)) => Some(and3(a, b))
          case _ => None
        }
      case sources.Or(l, r) =>
        (evalFilter(l, types, tuple), evalFilter(r, types, tuple)) match {
          // TRUE dominates even an undecidable sibling
          case (Some(TTrue), _) | (_, Some(TTrue)) => Some(TTrue)
          case (Some(a), Some(b)) => Some(or3(a, b))
          case _ => None
        }
      case sources.Not(inner) => evalFilter(inner, types, tuple).map(not3)
      case _ => None
    }
  }

  /** True when `f` is DEFINITELY decidable for every tuple a partitioned
    * table can present — i.e. it references only partition columns in
    * supported shapes. Per-file decidability still requires the file to
    * CARRY a tuple covering those columns; callers check both. */
  def referencesOnlyPartitionCols(f: Filter, types: Map[String, DataType]): Boolean =
    f.references.forall(types.contains)

  /** Partition-prune a file set under one pushed filter: drops every
    * entry whose EXACT tuple makes `f` definitely non-True (False and
    * Null both exclude every row of the file), keeps the rest. The
    * returned Boolean is "decidable for ALL entries" — when true the
    * caller may CONSUME `f` (every row of every kept file is known to
    * satisfy it, no residual evaluation needed); when false (a tuple-less
    * legacy file, an uncovered column, an unsupported literal) the kept
    * set is still sound but `f` must stay residual. */
  def pruneEntries[A](entries: Seq[A], tupleOf: A => String, f: Filter,
                      types: Map[String, DataType]): (Seq[A], Boolean) = {
    var decidableAll = true
    val kept = entries.filter { e =>
      val ts = tupleOf(e)
      if (ts.isEmpty) { decidableAll = false; true }
      else evalFilter(f, types, decodeTuple(ts)) match {
        case Some(TTrue) => true
        case Some(_) => false
        case None => decidableAll = false; true
      }
    }
    (kept, decidableAll)
  }

  // ----------------------------------- V2 Predicate → v1 Filter bridge

  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse => V2False, AlwaysTrue => V2True, And => V2And, Not => V2Not, Or => V2Or, Predicate => V2Predicate}

  private def v2Name(e: V2Expr): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }
  private def v2Lit(e: V2Expr): Option[Any] = e match {
    case l: V2Literal[_] => Some(l.value)
    case _ => None
  }

  /** The partition-tuple field for one row of a write, derived from the
    * partition columns' ordinals in the write schema — the DSv2 writer's
    * per-row keying function. */
  def tupleOfRow(cols: Seq[String], types: Seq[DataType], ordinals: Seq[Int],
                 row: SpecializedGetters): String =
    encodeTuple(cols, types.zip(ordinals).map { case (dt, i) =>
      canonicalOf(dt, row, i)
    })

  /** The DSv2 `Predicate` shapes (DELETE WHERE, row-level conditions)
    * translated onto the v1 `Filter` evaluator above. None ⇒ shape not
    * supported (callers degrade to their conservative path). */
  def v2ToV1(p: V2Predicate): Option[Filter] = p match {
    case _: V2True => Some(sources.AlwaysTrue())
    case _: V2False => Some(sources.AlwaysFalse())
    case a: V2And =>
      for (l <- v2ToV1(a.left()); r <- v2ToV1(a.right())) yield sources.And(l, r)
    case o: V2Or =>
      for (l <- v2ToV1(o.left()); r <- v2ToV1(o.right())) yield sources.Or(l, r)
    case n: V2Not => v2ToV1(n.child()).map(sources.Not)
    case g: V2Predicate =>
      val ch = g.children()
      (g.name(), ch.length) match {
        case ("IS_NULL", 1) => v2Name(ch(0)).map(sources.IsNull)
        case ("IS_NOT_NULL", 1) => v2Name(ch(0)).map(sources.IsNotNull)
        case ("IN", n) if n >= 2 =>
          v2Name(ch(0)).flatMap { c =>
            val vs = ch.drop(1).map(v2Lit)
            if (vs.exists(_.isEmpty)) None
            else Some(sources.In(c, vs.map(_.get)))
          }
        case (op @ ("=" | "<=>" | "<" | "<=" | ">" | ">=" | "<>"), 2) =>
          val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=",
            "=" -> "=", "<=>" -> "<=>", "<>" -> "<>")
          def leaf(c: String, v: Any, o: String): Filter = o match {
            case "=" => sources.EqualTo(c, v)
            case "<=>" => sources.EqualNullSafe(c, v)
            case "<" => sources.LessThan(c, v)
            case "<=" => sources.LessThanOrEqual(c, v)
            case ">" => sources.GreaterThan(c, v)
            case ">=" => sources.GreaterThanOrEqual(c, v)
            case "<>" => sources.Not(sources.EqualTo(c, v))
          }
          (v2Name(ch(0)), v2Lit(ch(1)), v2Name(ch(1)), v2Lit(ch(0))) match {
            case (Some(c), Some(v), _, _) => Some(leaf(c, v, op))
            case (_, _, Some(c), Some(v)) => Some(leaf(c, v, flip(op)))
            case _ => None
          }
        case _ => None
      }
  }
}

/** `graft_part_canonical(c)` — [[SnapshotPartition.canonicalOfValue]] as
  * a Catalyst expression, so the library write path can `partitionBy` on
  * shadow canonical-string columns and read each file's tuple back off
  * its directory name EXACTLY (expression-side and manifest-side
  * canonicalization share one code path by construction). Write-staging
  * only — never on a read hot path, so `CodegenFallback` costs nothing
  * that matters; NULL in, NULL out (Spark's writer then uses its default
  * null-partition directory name, decoded back to the tuple's NULL
  * token). */
case class PartitionCanonical(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (SnapshotPartition.supportedType(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_part_canonical: unsupported partition column type ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      SnapshotPartition.canonicalOfValue(child.dataType, v))

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PartitionCanonical =
    copy(child = newChild)
}
