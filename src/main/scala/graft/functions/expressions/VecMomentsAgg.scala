package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise vector mean over an `array<float>` column: one fixed
  * (dims + 1)-double buffer per group — [count, Σx₀, …, Σx_{d-1}] — with
  * map-side partial aggregation, evaluated to the per-dimension average.
  *
  * Scale design: the k-means UPDATE step needs per-cell centroid means.
  * The posexplode formulation shuffled n·dims exploded rows through two
  * exchanges; `dims` separate avg() columns keep one shuffle but generate a
  * dims-wide aggregate (codegen source grows with dims and recompiles per
  * loop iteration). This aggregate is ONE column with a fixed buffer —
  * shuffle bytes per group = 8·(dims+1), independent of row count, and the
  * per-row update is a single fused loop.
  *
  * Accumulation: per-partition left-to-right double sums merged in partial
  * order — same determinism class as avg() (repeatable up to fp merge
  * order; k-means callers are ScalaTest/bound-check-gated, not
  * oracle-hashed). Rows shorter than `dims` contribute their prefix; nulls
  * are skipped. */
case class VecMomentsAgg(child: Expression, dims: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vec_mean"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](dims + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dims, arr.numElements())
      buf(0) += 1.0
      var i = 0
      while (i < n) { buf(i + 1) += arr.getFloat(i).toDouble; i += 1 }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dims) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(0)
    val out = new Array[Double](dims)
    if (n > 0) {
      var i = 0
      while (i < dims) { out(i) = buf(i + 1) / n; i += 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate((dims + 1) * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dims + 1)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMomentsAgg =
    copy(child = newChild)
}
