package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word pairs (bigrams) of a tokenized document in one
  * codegen-friendly pass — the construction lm1/cooc1/ng1/rep1/apx3
  * all open with.
  *
  * The built-in formulations —
  * `zip_with(slice(w,1,n-1), slice(w,2,n-1), struct)` (lm1) and
  * `transform(sequence(...), i -> ...)` (cooc1/ng1/rep1/apx3) —
  * evaluate their lambdas through the higher-order-function
  * interpreter per TOKEN, allocating slices/sequences per document
  * (optimization r13: the ShingleHashes move applied to the bigram
  * family). This expression emits the n−1 pairs in one linear pass.
  *
  * Modes (fixed at plan time):
  *  - ORD (0):   array<struct<l,r>> — pairs in document order
  *    (lm1's zip_with twin);
  *  - UNORD (1): array<struct<x,y>> — each pair canonically ordered
  *    x ≤ y with the built-ins' null-skip (least/greatest return the
  *    non-null side) (cooc1's twin);
  *  - STR (2):   array<string> — `concat_ws(" ", l, r)` strings,
  *    nulls skipped exactly like concat_ws (ng1/rep1/apx3's twin).
  *
  * Windowing matches all call sites: n < 2 words → empty array (the
  * sites either filter size ≥ 2 or wrap in when/otherwise(empty));
  * a null words ARRAY yields null (explode drops it). split(text," ")
  * never produces null elements, but the null handling above keeps
  * the expression a drop-in for arbitrary input.
  */
case class WordPairs(child: Expression, mode: Int)
  extends UnaryExpression {

  require(mode >= 0 && mode <= 2, s"word_pairs mode must be 0|1|2, got $mode")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_pairs expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = mode match {
    case 0 => ArrayType(StructType(Seq(
      StructField("l", StringType), StructField("r", StringType))), containsNull = false)
    case 1 => ArrayType(StructType(Seq(
      StructField("x", StringType), StructField("y", StringType))), containsNull = false)
    case 2 => ArrayType(StringType, containsNull = true)
  }

  override def prettyName: String = "word_pairs"

  override def nullSafeEval(input: Any): Any =
    WordPairs.compute(input.asInstanceOf[ArrayData], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordPairs.compute($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): WordPairs =
    copy(child = newChild)
}

object WordPairs {

  private val SEP = UTF8String.fromString(" ")

  /** Called from both interpreted eval and generated code. */
  def compute(words: ArrayData, mode: Int): ArrayData = {
    val n = words.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var a: UTF8String = if (words.isNullAt(0)) null else words.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val b: UTF8String = if (words.isNullAt(i + 1)) null else words.getUTF8String(i + 1)
      out(i) = mode match {
        case 0 => new GenericInternalRow(Array[Any](a, b))
        case 1 =>
          // least/greatest semantics: nulls skipped, binary UTF-8 order
          if (a == null) new GenericInternalRow(Array[Any](b, b))
          else if (b == null) new GenericInternalRow(Array[Any](a, a))
          else if (a.compareTo(b) <= 0) new GenericInternalRow(Array[Any](a, b))
          else new GenericInternalRow(Array[Any](b, a))
        case 2 => UTF8String.concatWs(SEP, a, b)
      }
      a = b
      i += 1
    }
    new GenericArrayData(out)
  }
}
