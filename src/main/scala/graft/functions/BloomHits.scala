package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of array elements whose BLOOM_K probe bits are ALL set in a
  * fixed bit array — the per-document contamination count of dc4,
  * fused into one codegen'd expression.
  *
  * Why an Expression and not `size(filter(arr, λ))`: Spark's
  * higher-order functions evaluate their lambda INTERPRETED, once per
  * element — for dc4 that is 4 probes × ~8 arithmetic nodes per
  * shingle allocated and dispatched per row element, measured 51 s
  * warm at sf10 vs 3.4 s for this compiled loop. The sketch rides
  * along as a codegen reference object (16 KB, shipped once per task
  * in the serialized expression — bounded model state, never corpus).
  *
  * The probe arithmetic is [[RkLsh.mix2]] over chains blA/blB — the
  * same engine-neutral integers the DuckDB oracle replays — so this
  * expression changes the execution strategy of dc4, not its answer.
  */
case class BloomHits(child: Expression, sketch: Array[Long], bits: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "bloom_hits expects array<bigint> without null elements " +
        "(containsNull = true would read garbage via getLong)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_hits expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hits"

  override def nullSafeEval(input: Any): Any =
    BloomHits.compute(input.asInstanceOf[ArrayData], sketch, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sk = ctx.addReferenceObj("bloomSketch", sketch, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomHits.compute($c, $sk, ${bits}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHits =
    copy(child = newChild)
}

object BloomHits {
  import RkLsh.{A, B, P, blA, blB}

  /** JVM twin of the column-level probe arithmetic in
    * `graft.ops.Pipeline.bloomProbe` (two-round avalanche → bit
    * position); kept in one place so eval and codegen share it. */
  private def probe(i: Int, x: Long, bits: Long): Int = {
    val s1 = (A(blA(i)) * (x & (RkLsh.M40 - 1)) + B(blA(i))) % P
    val s1x = s1 ^ (s1 >>> 20)
    val s2 = (A(blB(i)) * s1x + B(blB(i))) % P
    // mix2 output is non-negative, so % == pmod here
    (((s2 ^ (s2 >>> 20)) % bits).toInt)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, sketch: Array[Long], bits: Long): Long = {
    val n = arr.numElements()
    var cnt = 0L
    var j = 0
    while (j < n) {
      val s = arr.getLong(j)
      var ok = true
      var i = 0
      while (ok && i < 4) {
        val p = probe(i, s, bits)
        if (((sketch(p >>> 6) >>> (p & 63)) & 1L) == 0L) ok = false
        i += 1
      }
      if (ok) cnt += 1
      j += 1
    }
    cnt
  }
}
