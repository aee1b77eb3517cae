package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a custom sketch aggregate: per group, 64 signed vote
  * counters (one per bit of the input hash), weighted by a count
  * column; finalized to the 64-bit fingerprint whose bit j is set when
  * the net vote is positive.
  *
  * Replaces 64 generated `sum(CASE …)` aggregate columns with a single
  * expression over a primitive long[64] buffer — same motivation as
  * [[MinHashSketch]]: less codegen to JIT, tight update loop, standard
  * partial→final merge.
  */
case class SimHashSketch(
    left: Expression,  // 64-bit word hash
    right: Expression, // occurrence count (weight)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = left.eval(input)
    val cv = right.eval(input)
    if (hv != null && cv != null) {
      val h = hv.asInstanceOf[Long]
      val c = cv.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (((h >>> b) & 1L) * 2L - 1L) * c
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashSketch =
    copy(left = newLeft, right = newRight)
}
