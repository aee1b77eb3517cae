package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a custom sketch aggregate
  * (`TypedImperativeAggregate`, the pattern Spark itself uses for
  * HLL/percentile sketches): per group, the element-wise minimum of
  * `numPerms` permutations of the input hashes.
  *
  * Motivation over `agg(min(perm_0), …, min(perm_31))`: one expression
  * instead of 32 generated aggregate columns (whose whole-stage codegen
  * alone took ~10 s to JIT), a primitive-array buffer updated in a
  * tight loop, and standard partial→final merge through Spark's
  * ObjectHashAggregate path.
  *
  * Permutations are the ENGINE-NEUTRAL affine maps `(a_j·x + b_j) mod P`
  * from [[RkLsh]] over mod-2^40 RK shingle hashes — the same integers a
  * DuckDB oracle computes, so dd2/cc2 are hash-checked end to end. (The
  * round-2 rotate-XOR bijections existed to dodge 64-bit multiply
  * overflow; 40-bit inputs make the classic affine form overflow-free,
  * see the audit in [[RkLsh]].)
  */
case class MinHashSketch(
    child: Expression,
    numPerms: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  @inline private def perm(h: Long, i: Int): Long = RkLsh.perm(i, h)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val p = perm(h, i)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}
