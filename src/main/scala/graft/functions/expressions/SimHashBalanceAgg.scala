package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Portable-SimHash balance aggregate: folds the two 30-bit affine
  * projections (g1, g2) of each shingle hash into the 60-bit document
  * fingerprint (bitᵢ = sign of Σ ±1 over the shingles' projected bits —
  * g1 supplies bits 0–29, g2 bits 30–59).
  *
  * Replaces the 60-separate-`sum()` hash aggregate (60 aggregate buffers +
  * 60 shift/mask expression trees per row, the round-2 perf regression
  * named in VERDICT.md) with ONE imperative aggregate holding a fixed
  * 60-int buffer: same math, same oracle SQL, one buffer. Map-side partial
  * aggregation ships 240 bytes per (partition, doc) — same scale shape as
  * [[SimHashAgg]], the xxhash64 path.
  */
case class SimHashBalanceAgg(left: Expression, right: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with BinaryLike[Expression] {

  // inputs must be LongType (no ExpectsInputTypes: AbstractDataType is
  // private[sql]; callers go through Dedup.simhashPortable)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_balance"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](60)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v1 = left.eval(input)
    val v2 = right.eval(input)
    if (v1 != null && v2 != null) {
      val g1 = v1.asInstanceOf[Long]
      val g2 = v2.asInstanceOf[Long]
      var i = 0
      while (i < 30) {
        buf(i) += (if (((g1 >>> i) & 1L) == 1L) 1 else -1)
        buf(i + 30) += (if (((g2 >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 60) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (buf(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(60 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(60)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashBalanceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashBalanceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SimHashBalanceAgg =
    copy(left = newLeft, right = newRight)
}
