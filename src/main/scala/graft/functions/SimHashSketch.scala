package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a custom sketch aggregate: per group, `numBits` signed
  * vote counters (one per bit of the input hash), weighted by a count
  * column; finalized to the fingerprint whose bit j is set when the net
  * vote is positive (ties → 0, mirrored by the oracle's `vote > 0`).
  *
  * Replaces generated `sum(CASE …)` aggregate columns with a single
  * expression over a primitive long[] buffer — same motivation as
  * [[MinHashSketch]]: less codegen to JIT, tight update loop, standard
  * partial→final merge.
  *
  * numBits defaults to 63: dd3 feeds fingerprints assembled from two
  * affine halves of an RK word hash, `(g1 mod 2^31)·2^32 + (g2 mod
  * 2^32)` — 63 bits is the most that construction can pack into a
  * signed 64-bit value on BOTH engines (DuckDB BIGINT is overflow-
  * checked), and every bit position must carry signal or banding would
  * put dead bits in a chunk.
  */
case class SimHashSketch(
    left: Expression,  // word hash (bits 0..numBits-1 vote)
    right: Expression, // occurrence count (weight)
    numBits: Int = 63,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(numBits >= 1 && numBits <= 63, s"numBits must be in [1,63], got $numBits")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = left.eval(input)
    val cv = right.eval(input)
    if (hv != null && cv != null) {
      val h = hv.asInstanceOf[Long]
      val c = cv.asInstanceOf[Long]
      var b = 0
      while (b < numBits) {
        buf(b) += (((h >>> b) & 1L) * 2L - 1L) * c
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numBits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < numBits) { if (buf(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numBits * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numBits)(bb.getLong)
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
