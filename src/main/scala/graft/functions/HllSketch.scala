package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** HyperLogLog distinct-count sketch with ENGINE-NEUTRAL arithmetic —
  * every intermediate integer is reproducible by a DuckDB oracle, so
  * apx1 is hash-checked end to end instead of rows-only (the round-2
  * formulation used Spark's built-in HLL++, whose register hashing is
  * engine-local).
  *
  * Construction (classic Flajolet et al. 2007, integer-only):
  *  - hash: the [[RkLsh]] affine pair `HLL_J` over the 40-bit-masked
  *    key, re-masked to 40 bits: `h = ((a·x + b) mod P) mod 2^40`;
  *  - bucket `h mod m` (m = 2^p registers), payload `w = h div m`
  *    (40 − p bits);
  *  - register value ρ = (trailing zeros of w) + 1, or `41 − p` when
  *    w = 0 — trailing zeros instead of the usual leading zeros because
  *    SQL can test `w mod 2^t` cheaply and the bits are equally uniform;
  *  - estimator: the raw harmonic mean `α_m · m² / Σ 2^{−M[j]}`, scaled
  *    integer-only: with S = Σ 2^{(41−p) − M[j]} (empty register ⇒
  *    2^{41−p}) the estimate is `(ALPHA20 << SHIFT) / S` where
  *    ALPHA20 = ⌊α_m · 2^20⌋ and SHIFT = 2p + (41−p) − 20 — exact
  *    because m²·2^{41−p} is divisible by 2^20. All values < 2^63; no
  *    floating point anywhere, so both engines produce identical longs.
  *
  * m = 512 keeps the sf0.01 oracle corpus (~2 000 distinct parts per
  * group) in the raw-estimate regime (n > 2.5m — below that classic HLL
  * switches to linear counting, whose `ln` is NOT engine-neutral; a
  * production deployment at 100 TB cardinalities would run m = 2^14+
  * with the same registers and never see the small-n branch). Standard
  * error 1.04/√512 ≈ 4.6%; ApproxSpec pins the realized error.
  *
  * Buffer: m bytes of register maxima; merge = element-wise max — the
  * mergeability is the whole point at scale (partial sketches combine
  * map-side, only m-byte states cross the shuffle).
  *
  * Output struct: (approx_distinct, zero_regs, harmonic_s) — the
  * estimate plus the two state summaries the oracle recomputes.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketch._

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // two-round avalanche: sequential keys through ONE affine map keep
      // structured low bits (alternating parity, patterned trailing
      // zeros) — fatal for a trailing-zero register. See RkLsh.mix2.
      val h = RkLsh.mix2(RkLsh.HLL_A, RkLsh.HLL_B, v.asInstanceOf[Long]) % RkLsh.M40
      val bucket = (h % M).toInt
      val w = h / M
      val rho = if (w == 0) MAX_RHO else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < M) {
      s += (1L << MAX_RHO) >> buf(i) // register 0 contributes 2^(41-p)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    InternalRow((ALPHA20 << SHIFT) / s, zeros, s)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StructType(Seq(
    StructField("approx_distinct", LongType, nullable = false),
    StructField("zero_regs", LongType, nullable = false),
    StructField("harmonic_s", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {

  /** register-count exponent / register count. */
  final val P_BITS = 9
  final val M = 1 << P_BITS

  /** ρ for a zero payload = payload width + 1 = (40 − p) + 1. */
  final val MAX_RHO = 41 - P_BITS

  /** ⌊α_m · 2^20⌋ for m = 512 (α_m = 0.7213 / (1 + 1.079/m)). A frozen
    * integer constant interpolated into BOTH engines' arithmetic. */
  final val ALPHA20: Long = (0.7213 / (1 + 1.079 / M) * (1L << 20)).toLong

  /** estimate = (ALPHA20 << SHIFT) / S, SHIFT = 2p + (41−p) − 20. */
  final val SHIFT = 2 * P_BITS + MAX_RHO - 20

  /** DuckDB mirror: per-row (bucket, ρ) over key SQL fragment `x`
    * (caller guarantees x ≥ 0). The trailing-zero CASE chain tests
    * `w mod 2^(t+1) = 2^t` for each t — pure integer arithmetic. */
  def bucketRhoSql(x: String): (String, String) = {
    val h = s"(${RkLsh.mix2Sql(RkLsh.HLL_A, RkLsh.HLL_B, s"($x % ${RkLsh.M40})")} % ${RkLsh.M40})"
    val bucket = s"($h % $M)"
    val w = s"($h // $M)"
    val tz = (0 until MAX_RHO - 1)
      .map(t => s"WHEN $w % ${1L << (t + 1)} = ${1L << t} THEN ${t + 1}")
      .mkString(" ")
    val rho = s"(CASE WHEN $w = 0 THEN $MAX_RHO $tz END)"
    (bucket, rho)
  }

  /** DuckDB mirror of [[eval]] given per-group aggregates `present`
    * (registers with rows) and `sPresent` (Σ 2^{MAX_RHO − ρ} over them). */
  def estimateSql(present: String, sPresent: String): (String, String, String) = {
    val s = s"($sPresent + ($M - $present) * ${1L << MAX_RHO})"
    (s"((${ALPHA20 << SHIFT}) // $s)", s"($M - $present)", s)
  }
}
