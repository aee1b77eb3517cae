package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of an `array<double>` column as one sketch-style
  * aggregate (`TypedImperativeAggregate`, same pattern as
  * [[MinHashSketch]]): the buffer is a primitive double array of
  * `dim + 1` slots (slot 0 = row count, slots 1..dim = running sums),
  * partial buffers merge element-wise through ObjectHashAggregate, and
  * eval divides once.
  *
  * Motivation: sim3's k-means centroid update previously exploded every
  * vector into (cell, dim_index, component) rows — a ×64 row inflation
  * per Lloyd iteration feeding a 64-way wider groupBy — when the whole
  * update is one K×(dim+1) state object. With this aggregate each
  * iteration is a single scan + one tiny ObjectHashAggregate over ≤K
  * groups; only the K×dim mean matrix reaches the driver (model state,
  * not data).
  *
  * Ragged/null inputs: rows whose array is null are skipped; the first
  * non-null row fixes `dim` and subsequent rows must match (the caller
  * feeds fixed-dim embeddings; a mismatch throws rather than silently
  * truncating). Empty groups eval to null.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](dim + 1) else buf
    require(b.length == dim + 1,
      s"vector_avg: dimension mismatch (${b.length - 1} vs $dim)")
    b(0) += 1.0
    var i = 0
    while (i < dim) { b(i + 1) += arr.getDouble(i); i += 1 }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"vector_avg: dimension mismatch in merge (${a.length - 1} vs ${b.length - 1})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0.0) return null
    val n = buf(0)
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / n; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_avg"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvg =
    copy(child = newChild)
}
