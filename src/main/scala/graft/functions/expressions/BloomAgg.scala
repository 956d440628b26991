package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Grouped bloom-filter build: one [[BloomFilter]] sketch PER GROUP, as a
  * TypedImperativeAggregate — the grouped twin of
  * `DataFrameStatFunctions.bloomFilter` (which can only build one global
  * sketch on the driver). Key hashing matches that API and therefore
  * [[BloomMightContain]]: integral keys via putLong, strings via their
  * UTF-8 bytes — build with this aggregate, probe with
  * `graft_bloom_might_contain`, no false negatives.
  *
  * The buffer is a fixed-size bit array (`numBits`), merged by OR — map-side
  * partial aggregation works, and a group's sketch costs numBits/8 bytes
  * whatever its row count. This is what makes a per-FILE data-skipping
  * index one aggregation over the table (see
  * graft.operators.Layout.writeBloomIndex).
  */
case class BloomFilterBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType =>
      if (expectedItems <= 0) TypeCheckResult.TypeCheckFailure(
        s"$prettyName expectedItems must be positive, got $expectedItems")
      else if (fpp <= 0 || fpp >= 1) TypeCheckResult.TypeCheckFailure(
        s"$prettyName fpp must be in (0, 1), got $fpp")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT/INT/STRING keys, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buf.putLong(l)
      case i: Int => buf.putLong(i.toLong)
      case s: UTF8String => buf.putBinary(s.getBytes)
    }
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterBuildAgg =
    copy(child = newChildren.head)
}
