package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch (heavy hitters): at most `k` counters
  * per group, returned as map<string,bigint> of item → estimated count.
  *
  * The third member of the sketch trio (HLL distinct / GK quantiles /
  * frequent items) — "which keys dominate this 100 TB column" without a
  * full (value, count) shuffle. Guarantees (Misra-Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS'12):
  *   - estimates never overstate: est ≤ true count;
  *   - total undercount is bounded: true − est ≤ n/(k+1) for n rows seen;
  *   - therefore every item with true count > n/(k+1) is guaranteed present.
  *
  * Update: increment if tracked; insert if a slot is free; else decrement
  * ALL counters (dropping zeros) — the classic O(1)-amortized step. Merge:
  * sum counters, then if more than k survive, subtract the (k+1)-th
  * largest value from all and drop ≤0 — keeps the bound additive across
  * partials, so map-side partial aggregation ships at most k entries per
  * partition instead of the raw keys.
  *
  * Which of several EQUALLY-borderline items survives can depend on Spark's
  * partial-merge order, so this is ScalaTest/BENCH surface (bounds are
  * asserted, not hashes) — same contract as the DataSketches HLL column,
  * not part of the DuckDB oracle inventory.
  */
case class FreqItemsAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k =>
          buf.update(key.clone(), 1L) // eval may reuse its backing buffer
        case None =>
          // decrement-all: charges this row and one row of every tracked item
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else buf.update(kk, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0:
      // at most k survive, and the subtraction keeps the MG bound additive
      val d = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.foreach { case (kk, c) =>
        if (c - d <= 0L) dead += kk else a.update(kk, c - d)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (kk, c) => (-c, kk.toString) }
    ArrayBasedMapData(entries.map(_._1), entries.map(_._2))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val items = buf.toArray
    val size = 4 + items.map { case (kk, _) => 4 + kk.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.foreach { case (kk, c) =>
      val bytes = kk.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}
