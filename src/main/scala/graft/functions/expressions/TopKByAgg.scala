package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact top-k rows per group as a bounded-heap aggregate — the scale
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v) <= k`
  * window, which must SORT every group's full row set. Here each map-side
  * partial keeps at most k (ord, item) pairs, the shuffle ships k rows per
  * group per partition, and the reduce-side merge is k·log k. A bounded
  * top-k heap is exact under any merge order (pruned elements are dominated
  * by k retained ones in the same partial, so they are dominated globally),
  * which is why — unlike the Misra-Gries sketch — this aggregate IS part of
  * the DuckDB oracle inventory (AGG-GROUP-TOPK).
  *
  * Ordering is total and deterministic: larger `ord` wins, ties break
  * toward the binary-smaller `item` string. Result is
  * array<struct<ord double, item string>> sorted strongest-first. Null
  * `ord` or `item` rows are skipped.
  */
case class TopKByAgg(ord: Expression, item: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, UTF8String)]]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def left: Expression = ord
  override def right: Expression = item

  // fail at ANALYSIS on bad input types (the PolyHash convention): without
  // this a string ord or non-string item dies mid-job inside executor
  // tasks with MatchError/ClassCastException instead of a clear error
  override def checkInputDataTypes(): TypeCheckResult = {
    val ordOk = ord.dataType.isInstanceOf[NumericType]
    val itemOk = item.dataType == StringType
    if (ordOk && itemOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (numeric ord, string item), got " +
        s"(${ord.dataType.catalogString}, ${item.dataType.catalogString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("item", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_by"

  // head of the queue = WEAKEST retained element (smallest ord, then
  // binary-largest item), so a stronger arrival replaces it in O(log k).
  // Signed zeros compare EQUAL (SQL ordering semantics — the window
  // formulation this aggregate must match) but rows keep their original
  // value; only the comparison normalizes.
  private val weakestFirst: Ordering[(Double, UTF8String)] =
    (a: (Double, UTF8String), b: (Double, UTF8String)) => {
      val av = if (a._1 == 0.0d) 0.0d else a._1
      val bv = if (b._1 == 0.0d) 0.0d else b._1
      val c = java.lang.Double.compare(bv, av)
      if (c != 0) c else a._2.compareTo(b._2)
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty(weakestFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, UTF8String)],
                    v: Double, s: UTF8String, owned: Boolean): Unit = {
    if (buf.size < k) {
      buf.enqueue((v, if (owned) s else s.clone())) // eval may reuse its buffer
    } else if (weakestFirst.compare((v, s), buf.head) < 0) {
      buf.dequeue()
      buf.enqueue((v, if (owned) s else s.clone()))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, UTF8String)],
                      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val v = ord.eval(input)
    val s = item.eval(input)
    if (v != null && s != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case n: Number => n.doubleValue()
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      }
      offer(buf, d, s.asInstanceOf[UTF8String], owned = false)
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, UTF8String)],
                     b: mutable.PriorityQueue[(Double, UTF8String)]): mutable.PriorityQueue[(Double, UTF8String)] = {
    b.foreach { case (v, s) => offer(a, v, s, owned = true) }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    // weaker elements compare GREATER under weakestFirst, so the plain
    // ascending sort yields strongest-first
    val arr = buf.toArray.sorted(weakestFirst)
    new GenericArrayData(arr.map { case (v, s) =>
      new GenericInternalRow(Array[Any](v, s))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val items = buf.toArray
    val size = 4 + items.map { case (_, s) => 8 + 4 + s.numBytes() }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.foreach { case (v, s) =>
      val bytes = s.getBytes
      bb.putDouble(v); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val v = bb.getDouble
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.enqueue((v, UTF8String.fromBytes(arr)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKByAgg =
    copy(ord = newLeft, item = newRight)
}
