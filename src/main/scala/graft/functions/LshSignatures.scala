package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All `tables` random-hyperplane LSH signatures of a vector in ONE
  * compiled pass: signature t has bit j set iff
  * `dot(v, plane(t·bits + j)) >= 0`, planes being the deterministic
  * splitmix-derived hyperplanes of [[LshSignatures.planeComponent]].
  *
  * Exists for COMPILATION shape, not semantics: the Column formulation
  * (`array(sigCol(0), …, sigCol(L−1))`, each sig a sum of
  * `when(dot(v, array(lit, ×64)) >= 0, 1<<j)`) inlines tables×bits×dim
  * literal nodes — 5120 for the production 8×10×64 point — whose
  * generated code bursts the JVM's effective method-size limits, so the
  * whole stage falls back to interpreted evaluation (measured 10.4 s
  * for sim4 at sf0.1; this expression: one tight loop over a cached
  * plane matrix). Same float semantics, same signatures.
  */
case class LshSignatures(child: Expression, tables: Int, bits: Int)
  extends UnaryExpression {

  require(tables >= 1 && bits >= 1 && bits <= 30 && tables * bits <= 512,
    s"implausible LSH shape: $tables x $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures expects array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_signatures"

  override def nullSafeEval(input: Any): Any =
    LshSignatures.compute(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshSignatures.compute($c, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object LshSignatures {

  /** Deterministic pseudo-random hyperplane component: a 64-bit
    * avalanche of (plane, dim) scaled to [−1, 1] — no RNG state, same
    * on every executor, reproducible across runs. (Moved verbatim from
    * graft.ops.Similarity so the Column and compiled paths share one
    * definition.) */
  def planeComponent(p: Int, d: Int): Double = {
    var x = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L; x ^= x >>> 33
    x.toDouble / Long.MaxValue.toDouble
  }

  /** plane matrix cache keyed by (planes, dim) — built once per JVM,
    * shared across tasks (the matrix is a pure function of its shape) */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(n: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((n, dim), _ =>
      Array.tabulate(n, dim)((p, d) => planeComponent(p, d)))

  /** Called from both interpreted eval and generated code. */
  def compute(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val vec = new Array[Double](dim)
    var d = 0
    while (d < dim) { vec(d) = v.getDouble(d); d += 1 }
    val pl = planes(tables * bits, dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var j = 0
      while (j < bits) {
        val p = pl(t * bits + j)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += vec(i) * p(i); i += 1 }
        if (dot >= 0) sig |= (1 << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
