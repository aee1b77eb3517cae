package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot products of one `array<double>` column against a CONSTANT K×dim
  * matrix (the k-means centroid model), returning `array<double>` of K
  * dots.
  *
  * The unrolled alternative — `array(double_dot(v, lit(c0)), ...,
  * double_dot(v, lit(cK)))` — embeds K×dim literal nodes in the plan:
  * fine at K=16, but with a corpus-proportional cell count (K≈1.5k at
  * the sf10 probe, unbounded at 100 TB) it detonates analysis time and
  * overflows the generated class's constant pool, kicking the whole
  * stage out of codegen. Here the matrix rides along as ONE reference
  * object (a flat `double[]`, `ctx.addReferenceObj`), so plan size and
  * generated code are O(1) in K and assignment stays inside
  * whole-stage codegen at any K.
  *
  * Per-centroid accumulation is strict left-to-right double addition —
  * identical to [[DoubleDot]] and DuckDB's `list_dot_product`, keeping
  * the k-means oracle replay bit-exact. Null semantics also match the
  * per-centroid [[DoubleDot]] formulation: a null input element or a
  * vector/matrix width mismatch nulls every dot (same input is fed to
  * all K centroids, so per-element nulls are all-or-nothing).
  *
  * `right` must be a foldable `array<array<double>>` (the model
  * literal); rows must be rectangular.
  */
case class MatrixDots(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "matrix_dots"

  /** Flattened model: (K, dim, row-major double[K*dim]). Extracted once
    * per task from the foldable literal; @transient so only the literal
    * expression, not the duplicate flat copy, is serialized. */
  @transient private lazy val model: (Int, Int, Array[Double]) = {
    require(right.foldable, "matrix_dots: matrix must be a constant")
    val m = right.eval().asInstanceOf[ArrayData]
    val k = m.numElements()
    val dim = if (k == 0) 0 else m.getArray(0).numElements()
    val flat = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val row = m.getArray(c)
      require(row.numElements() == dim, "matrix_dots: ragged matrix")
      var j = 0
      while (j < dim) { flat(c * dim + j) = row.getDouble(j); j += 1 }
      c += 1
    }
    (k, dim, flat)
  }

  override def nullSafeEval(v: Any, unused: Any): Any = {
    val (k, dim, flat) = model
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Any](k) // nulls until proven otherwise
    if (x.numElements() == dim) {
      val vec = new Array[Double](dim)
      var ok = true
      var i = 0
      while (ok && i < dim) {
        if (x.isNullAt(i)) ok = false else { vec(i) = x.getDouble(i); i += 1 }
      }
      if (ok) {
        var c = 0
        while (c < k) {
          var acc = 0.0
          var j = 0
          val off = c * dim
          while (j < dim) { acc += vec(j) * flat(off + j); j += 1 }
          out(c) = acc
          c += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (k, dim, flat) = model
    val mRef = ctx.addReferenceObj("centroidMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val out = ctx.freshName("out")
      val vec = ctx.freshName("vec")
      val okv = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      s"""
         |Object[] $out = new Object[$k];
         |if ($a.numElements() == $dim) {
         |  double[] $vec = new double[$dim];
         |  boolean $okv = true;
         |  for (int $i = 0; $okv && $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) $okv = false; else $vec[$i] = $a.getDouble($i);
         |  }
         |  if ($okv) {
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $acc = 0.0;
         |      int $off = $c * $dim;
         |      for (int $j = 0; $j < $dim; $j++) $acc += $vec[$j] * $mRef[$off + $j];
         |      $out[$c] = (Double) $acc;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatrixDots =
    copy(left = newLeft, right = newRight)
}
