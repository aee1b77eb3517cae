package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded smallest-n sketch: per group, keep the n smallest
  * (key, id) pairs in (key, id) order and return the ids.
  *
  * This is the per-stratum TakeOrdered shape: each map task maintains
  * an n-bounded buffer per group, partial buffers merge through
  * ObjectHashAggregate, and the shuffle carries at most n pairs per
  * (task, group) — NEVER the group's full row set. It replaces smp2's
  * `row_number() OVER (PARTITION BY lang ORDER BY h)`, which funneled
  * the entire corpus through one reducer per language (~5 partitions at
  * 100 TB — the round-2 verdict's one genuine scale-killer).
  *
  * Determinism: total order on (key, id); ties in key break on id,
  * mirroring the oracle's `ORDER BY h, doc_id`.
  *
  * Buffer is a flat long[2n] (key, id interleaved) + fill count,
  * insertion-sorted — n is small (a sample quota), so O(n) insert beats
  * heap constant factors and serializes trivially.
  */
case class TopNByKey(
    left: Expression,  // ordering key
    right: Expression, // payload id
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNByKey.Buf] with BinaryLike[Expression] {

  require(n >= 1, s"topn_by_key: n must be >= 1, got $n")

  override def createAggregationBuffer(): TopNByKey.Buf =
    new TopNByKey.Buf(new Array[Long](2 * n), 0)

  override def update(buf: TopNByKey.Buf, input: InternalRow): TopNByKey.Buf = {
    val kv = left.eval(input)
    val iv = right.eval(input)
    if (kv != null && iv != null)
      buf.insert(kv.asInstanceOf[Long], iv.asInstanceOf[Long], n)
    buf
  }

  override def merge(a: TopNByKey.Buf, b: TopNByKey.Buf): TopNByKey.Buf = {
    var i = 0
    while (i < b.size) { a.insert(b.arr(2 * i), b.arr(2 * i + 1), n); i += 1 }
    a
  }

  override def eval(buf: TopNByKey.Buf): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = buf.arr(2 * i + 1); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopNByKey.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < 2 * buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopNByKey.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getInt
    val arr = new Array[Long](2 * n)
    var i = 0
    while (i < 2 * size) { arr(i) = bb.getLong; i += 1 }
    new TopNByKey.Buf(arr, size)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topn_by_key"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopNByKey =
    copy(left = newLeft, right = newRight)
}

object TopNByKey {
  /** interleaved (key, id) pairs, sorted ascending by (key, id) */
  final class Buf(val arr: Array[Long], var size: Int) {

    @inline private def lt(k: Long, id: Long, i: Int): Boolean =
      k < arr(2 * i) || (k == arr(2 * i) && id < arr(2 * i + 1))

    def insert(k: Long, id: Long, n: Int): Unit = {
      if (size == n && !lt(k, id, n - 1)) return
      // position = first slot where (k, id) sorts before the occupant
      var pos = size
      while (pos > 0 && lt(k, id, pos - 1)) pos -= 1
      if (pos >= n) return
      val last = math.min(size, n - 1)
      var i = last
      while (i > pos) {
        arr(2 * i) = arr(2 * (i - 1)); arr(2 * i + 1) = arr(2 * (i - 1) + 1)
        i -= 1
      }
      arr(2 * pos) = k; arr(2 * pos + 1) = id
      if (size < n) size += 1
    }
  }
}
