package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial string hash: acc = (acc·31 + codepoint) mod 1e9+7
  * folded over the string's Unicode code points (acc₀ = 0).
  *
  * Semantically identical to the higher-order-function formulation
  *   aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s,i,1))),
  *             0L, (acc, x) -> (acc*31 + x) % P)
  * and to the DuckDB list_reduce twin in graft.queries.Extensions — both
  * engines' ascii/substr are code-point-based — but compiled to one fused
  * Java loop inside whole-stage codegen instead of ~len interpreted lambda
  * frames per value (~10× on the shingle-hash workloads at sf0.1).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  // fail at ANALYSIS on non-string input (the function is SQL-exposed) —
  // without this, a graft_poly_hash(bigint) call dies at runtime with a
  // codegen/ClassCastException instead of a clear error
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  final val P: Long = 1000000007L

  /** Fold over code points. ASCII fast path: bytes >= 0 are themselves the
    * code point, so the common all-ASCII shingle never leaves the byte
    * loop; multi-byte sequences fall back to String.codePointAt. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b >= 0) { acc = (acc * 31L + b) % P; i += 1 }
      else ascii = false
    }
    if (ascii) acc
    else {
      // restart in code-point mode from the first non-ASCII byte's char index
      val str = s.toString
      acc = 0L
      var ci = 0
      val len = str.length
      while (ci < len) {
        val cp = str.codePointAt(ci)
        ci += Character.charCount(cp)
        acc = (acc * 31L + cp) % P
      }
      acc
    }
  }
}
