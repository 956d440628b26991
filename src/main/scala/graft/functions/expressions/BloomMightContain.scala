package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `mightContain` probe against a pre-built [[BloomFilter]] sketch — the
  * filter half of a semi-join reduction (see
  * graft.operators.Skew.bloomPrunedJoin). The serialized sketch ships with
  * the plan (one copy per executor via the codegen reference table, not
  * per row), is deserialized lazily once per JVM, and the probe compiles
  * into whole-stage codegen as a single virtual call — no UDF, no boxing
  * for the common bigint-key case.
  *
  * Key hashing matches DataFrameStatFunctions.bloomFilter: integral keys
  * probe via mightContainLong, strings via their UTF-8 bytes — so a sketch
  * built by `df.stat.bloomFilter(col, n, fpp)` is probe-compatible.
  * Guarantees no false negatives (join results survive exactly); false
  * positives only waste shuffle, never corrupt results.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT/INT/STRING keys, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def probeLong(v: Long): Boolean = bloom.mightContainLong(v)
  def probeString(v: UTF8String): Boolean = bloom.mightContainBinary(v.getBytes)

  override def nullSafeEval(input: Any): Any = input match {
    case l: Long => probeLong(l)
    case i: Int => probeLong(i.toLong)
    case s: UTF8String => probeString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomMightContain].getName)
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev, c => s"$ref.probeString($c)")
      case _ => defineCodeGen(ctx, ev, c => s"$ref.probeLong((long) $c)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array[Byte] as a case-class field compares by reference, so two probes
  // built from identical sketch bytes would never be equal — defeating
  // common-subexpression elimination and canonicalized plan comparison.
  // Compare the payload by content instead.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}
