package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave of two non-negative 31-bit bucket ids into
  * one long: bit i of x lands at position 2i, bit i of y at 2i+1. Sorting
  * by the result places rows close in BOTH dimensions into the same file /
  * row group, so parquet min-max statistics prune multi-dimensional box
  * predicates — the standard lakehouse layout trick for "WHERE x BETWEEN …
  * AND y BETWEEN …" scans where a single-column sort only prunes one
  * dimension (see graft.operators.Layout.zorderBuckets).
  *
  * Inputs are bucket ordinals (INT/BIGINT, caller-computed, e.g. via
  * width_bucket-style arithmetic); values are masked to 31 bits. Codegen
  * is the branch-free magic-constant spread (Morton via bit tricks),
  * evaluated inside whole-stage codegen.
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
        e.dataType == LongType || e.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires INT/BIGINT bucket ids, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
    }
    ZOrderInterleave.interleave(asLong(a), asLong(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.ZOrderInterleave.interleave((long) $a, (long) $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderInterleave {
  /** Spread the low 31 bits of v so bit i moves to bit 2i (Morton spread,
    * branch-free magic constants). */
  private def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
