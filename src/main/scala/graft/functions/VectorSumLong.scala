package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise SUM of an `array<bigint>` column as one sketch-style
  * aggregate — the integer sibling of [[VectorAvg]] (same
  * `TypedImperativeAggregate` shape: primitive `dim + 1` buffer, slot 0
  * = row count, slots 1..dim = running sums, merged element-wise through
  * ObjectHashAggregate).
  *
  * Why it exists: sim3's k-means centroid update must be ENGINE-NEUTRAL
  * for the DuckDB oracle, and a float mean is not — summation order
  * across rows differs between engines (and between Spark partitions),
  * so the low bits of a double centroid are nondeterministic. Integer
  * sums are exact and therefore order-independent: quantize the unit
  * vectors to an integer grid once, sum with this aggregate, and every
  * downstream centroid is an identical integer sequence on both engines
  * ([[graft.ops.Similarity]] sim3).
  *
  * Output is `struct(n: bigint, s: array<bigint>)` — the caller usually
  * needs the member count alongside the sums (and it rides in slot 0 for
  * free). Overflow posture: callers quantize components to |x| ≤ Q
  * (512 in sim3), so a sum only wraps past ~2^63/Q ≈ 1.8e16 rows per
  * group — beyond any per-cell cardinality this library targets.
  *
  * Ragged/null inputs: null rows are skipped; the first non-null row
  * fixes `dim`, a later mismatch throws. Empty groups eval to null.
  */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val b = if (buf.isEmpty) new Array[Long](dim + 1) else buf
    require(b.length == dim + 1,
      s"vector_sum_long: dimension mismatch (${b.length - 1} vs $dim)")
    b(0) += 1L
    var i = 0
    while (i < dim) { b(i + 1) += arr.getLong(i); i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"vector_sum_long: dimension mismatch in merge (${a.length - 1} vs ${b.length - 1})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf.isEmpty || buf(0) == 0L) return null
    InternalRow(buf(0), new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, buf.length)))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s", ArrayType(LongType, containsNull = false),
        nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum_long"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumLong =
    copy(child = newChild)
}
