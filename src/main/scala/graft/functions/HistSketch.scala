package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Log-scaled histogram percentile sketch with ENGINE-NEUTRAL integer
  * arithmetic — the one-pass mergeable percentile path whose estimates
  * a DuckDB oracle reproduces exactly, so apx2 is hash-checked end to
  * end (the round-2 `percentile_approx` had engine-local interpolation
  * ⇒ rows-only check).
  *
  * The sketch is an HdrHistogram-style fixed-boundary histogram over
  * positive longs (here: price cents): value v with highest set bit e
  * lands in bucket `e·2^MB + sub` where `sub` keeps the next MB
  * mantissa bits (`(v >> (e−MB)) & (2^MB−1)`; values below 2^MB map to
  * themselves). Buckets are monotone in v with relative width ≤ 2^−MB
  * (3.1% at MB = 5), so a percentile estimated as the LOWER BOUND of
  * the bucket containing rank ⌈q·n⌉ is within 2^−MB relative error of
  * the true order statistic — deterministic, no interpolation, no
  * floats. ApproxSpec pins the realized error against exact
  * percentiles.
  *
  * Buffer: one long count per bucket (fixed 41·2^MB slots ≈ 10 KB);
  * merge = vector add. At 100 TB the map-side partials collapse to one
  * 10 KB state per group per task — the same shape Spark's own
  * ApproximatePercentile uses, minus the variable-size quantile buffer
  * and minus the engine-specific compaction.
  *
  * Output struct: (p50, p95) bucket lower bounds, in input units.
  */
case class HistSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import HistSketch._

  override def createAggregationBuffer(): Array[Long] = new Array[Long](BUCKETS)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x > 0, s"hist_sketch expects positive values, got $x")
      buf(bucketOf(x)) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < BUCKETS) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < BUCKETS) { n += buf(i); i += 1 }
    InternalRow(percentile(buf, n, 50), percentile(buf, n, 95))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(BUCKETS * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("p50", LongType, nullable = false),
    StructField("p95", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hist_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketch =
    copy(child = newChild)
}

object HistSketch {

  /** mantissa bits kept per bucket: relative width 2^−MB ≈ 3.1%. */
  final val MB = 5
  final val SUBS = 1 << MB

  /** highest supported exponent: values up to 2^41 (40-bit cents). */
  final val MAX_E = 40
  final val BUCKETS = (MAX_E + 1) * SUBS

  def bucketOf(v: Long): Int = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    if (e < MB) v.toInt // small values map to themselves (exact)
    else (e << MB) | (((v >> (e - MB)) & (SUBS - 1)).toInt)
  }

  /** lower bound of bucket i — the percentile representative. */
  def lowerBound(i: Int): Long = {
    val e = i >> MB
    val sub = i & (SUBS - 1)
    if (e < MB) i.toLong
    else (SUBS.toLong + sub) << (e - MB)
  }

  /** rank ⌈q%·n⌉ bucket lower bound by an ascending scan. */
  private def percentile(buf: Array[Long], n: Long, q: Int): Long = {
    val rank = (n * q + 99) / 100
    var cum = 0L
    var i = 0
    while (i < BUCKETS) {
      cum += buf(i)
      if (cum >= rank) return lowerBound(i)
      i += 1
    }
    0L
  }

  /** DuckDB mirror of [[bucketOf]]/[[lowerBound]] over positive SQL
    * fragment `v`: (bucket expr, lower-bound-of-bucket expr over a
    * bucket column `b`). The msb CASE chain descends from MAX_E. */
  def bucketSql(v: String): String = {
    val e = (MAX_E to 0 by -1)
      .map(t => s"WHEN $v >= ${1L << t} THEN $t").mkString("(CASE ", " ", " END)")
    s"(CASE WHEN $e < $MB THEN $v ELSE ($e * $SUBS) + (($v // (1::BIGINT << ($e - $MB))) % $SUBS) END)"
  }

  def lowerBoundSql(b: String): String =
    s"(CASE WHEN ($b // $SUBS) < $MB THEN $b ELSE ($SUBS + $b % $SUBS) * (1::BIGINT << (($b // $SUBS) - $MB)) END)"
}
