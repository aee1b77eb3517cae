package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The built-in higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) evaluates its lambda
  * interpreted, outside whole-stage codegen — at 2M pairs × 64 dims that
  * interpretation dominated the dd5/sim1 runtime. This expression
  * generates a tight primitive loop inside whole-stage codegen instead
  * (preference order per the design notes: compose built-ins → custom
  * Expression → custom operator; this is step two).
  *
  * Accumulation is strict left-to-right double addition — the same
  * order as the HOF version and DuckDB's `list_dot_product`, keeping
  * oracle comparisons bit-exact.
  */
case class DoubleDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // callers (VectorFunctions.dot) cast both sides to array<double>
  override def dataType: DataType = DoubleType

  // a null ELEMENT nullifies the result even when both arrays are
  // non-null — without this, codegen folds isNull to a literal false
  // and the null-element branch silently yields 0.0
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  /** A null ELEMENT nullifies the whole product, and so does a LENGTH
    * MISMATCH — matching the `aggregate(zip_with(a,b,_*_),0.0,_+_)`
    * formulation exactly (zip_with pads the shorter array with nulls,
    * null×x → null element → null sum; the round-1 version returned the
    * common-prefix product there, silently diverging on ragged input).
    * ArrayData's getDouble would otherwise read a null slot as 0.0. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}
