package graft.functions.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregates (DataSketches): mergeable distinct-count
  * sketches CLOSED UNDER SET ALGEBRA. HLL unions, but cannot intersect or
  * subtract — "users who did A and B" / "did A but not B" over 100 TB
  * needs either an exact double-shuffle semi-join per question, or theta
  * sketches: build one sketch per segment ONCE (map-side partials, one
  * narrow shuffle of ≤64 KiB buffers at lgK=12), then answer every
  * union / intersection / difference cardinality from the sketch column
  * alone. Hashing is deterministic (fixed default seed) and results are
  * compact-ordered, so estimates — and error-bound booleans — are
  * bit-stable on fixed data, the same oracle contract as the HLL/KLL/MG
  * sketches.
  *
  * Buffer is a theta Union: it accepts raw updates AND sketch merges, so
  * one buffer type serves build (update) and both partial/final merge
  * phases; [[ThetaSketchAgg]] (raw values in) and [[ThetaUnionAgg]]
  * (serialized sketches in) differ only in their update path.
  */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  // abstract, implemented by the case-class param — validated in
  // checkInputDataTypes (NOT a body-level require: the superclass
  // constructor would read the subclass val before it is initialized)
  def lgK: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  protected def checkLgK(): TypeCheckResult =
    if (lgK >= 4 && lgK <= 26) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName lgK must be in [4, 26], got $lgK")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }
}

/** Build sketches from raw values (the scan-side aggregate). */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def prettyName: String = "graft_theta_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType | DoubleType => checkLgK()
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string/binary/integral/double, got ${other.catalogString}")
  }

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buf.update(s.toString)
      case b: Array[Byte] => buf.update(b)
      case l: Long => buf.update(l)
      case i: Int => buf.update(i.toLong)
      case d: Double => buf.update(d)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union of serialized theta sketches — the rollup aggregate (coarser
  * segments from finer sketch columns, no raw-data rescan). */
case class ThetaUnionAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def prettyName: String = "graft_theta_union"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) checkLgK()
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY sketch column, got ${child.dataType.catalogString}")

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Distinct-count estimate readout from a serialized theta sketch.
  * Group-level rows only — the heapify is metadata-scale work. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY sketch column, got ${child.dataType.catalogString}")

  override def nullSafeEval(sk: Any): Any =
    ThetaOps.estimate(sk.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.ThetaOps.estimate($a)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Pairwise set algebra over serialized sketches: mode 0 = intersection,
  * mode 1 = A-and-not-B, mode 2 = union. Returns the result as a
  * serialized compact sketch, so expressions compose:
  * estimate(intersect(a, union(b, c))). */
case class ThetaSetOp(left: Expression, right: Expression, mode: Int)
    extends BinaryExpression {

  require(mode >= 0 && mode <= 2, "mode must be 0 (intersect), 1 (aNotB) or 2 (union)")

  override def dataType: DataType = BinaryType
  override def prettyName: String = mode match {
    case 0 => "graft_theta_intersect"
    case 1 => "graft_theta_anotb"
    case 2 => "graft_theta_union_pair"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY) sketches, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.setOp(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.ThetaOps.setOp($a, $b, $mode)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}

object ThetaOps {
  def estimate(bytes: Array[Byte]): Double =
    Sketches.heapifySketch(Memory.wrap(bytes)).getEstimate

  def setOp(a: Array[Byte], b: Array[Byte], mode: Int): Array[Byte] = {
    val sa = Sketches.heapifySketch(Memory.wrap(a))
    val sb = Sketches.heapifySketch(Memory.wrap(b))
    val out: CompactSketch = mode match {
      case 0 => SetOperation.builder().buildIntersection().intersect(sa, sb)
      case 1 => SetOperation.builder().buildANotB().aNotB(sa, sb)
      case 2 =>
        // Intersection and A-not-B inherit precision from the input thetas,
        // but a Union has its own nominal-entries cap: the builder default
        // (4096 = lgK 12) would silently DOWNSAMPLE sketches built at a
        // larger lgK. A compact sketch retains at most its nominal entries,
        // so sizing the union to the next power of two >= the larger input's
        // retained count guarantees the pairwise union never throws away
        // precision the caller paid for (floor 12 keeps exact-mode inputs on
        // the default; cap 26 is the library max).
        val retained = math.max(sa.getRetainedEntries(true), sb.getRetainedEntries(true))
        val lgNom = math.min(26,
          math.max(12, 32 - Integer.numberOfLeadingZeros(math.max(retained - 1, 1))))
        SetOperation.builder().setLogNominalEntries(lgNom).buildUnion().union(sa, sb)
    }
    out.toByteArray
  }
}
