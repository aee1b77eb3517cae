package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Extended
import graft.plans.GraftExtensions

/** The RewriteDotProduct optimizer rule: fires on the exact HOF
  * dot-product pattern (plan shows `double_dot`), leaves near-miss
  * patterns alone, and preserves the HOF null semantics through the
  * rewrite. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  private val HOF = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // non-foldable array columns: a literal array would be constant-folded
  // by the main optimizer batches BEFORE the extra-optimization batch
  // the rule runs in, so nothing would be left to rewrite
  private def vecs(aExpr: String, bExpr: String): DataFrame = {
    GraftExtensions.install(spark)
    spark.range(1)
      .select(when(col("id") >= 0, expr(aExpr)).as("a"),
        when(col("id") >= 0, expr(bExpr)).as("b"))
      .select(expr(HOF).as("dot"))
  }

  test("ext1 runs rewritten: parquet-backed plan contains double_dot, values exact") {
    val df = Extended.ext1DotRewrite(spark, sf)
    assert(optimized(df).contains("double_dot"), optimized(df))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map { r =>
        val v = r.getSeq[Double](1)
        // same left-to-right accumulation as DoubleDot and the HOF
        val dot = v.zip(v.reverse).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
        r.getLong(0) -> math.floor(dot * 1e6) / 1e6
      }.toMap
    assert(got == want)
  }

  test("rewrite preserves HOF semantics: values, empty, null element, ragged") {
    val cases = Seq(
      ("array(1D, 2D, 3D)", "array(4D, 5D, 6D)", Some(32.0)),
      ("cast(array() as array<double>)", "cast(array() as array<double>)", Some(0.0)),
      ("array(1D, cast(null as double))", "array(1D, 2D)", None), // null element
      ("array(1D, 2D)", "array(1D)", None)) // ragged: zip_with pads nulls
    cases.foreach { case (a, b, want) =>
      val df = vecs(a, b)
      assert(optimized(df).contains("double_dot"), s"no rewrite for ($a, $b)")
      val row = df.head()
      assert((if (row.isNullAt(0)) None else Some(row.getDouble(0))) == want,
        s"($a, $b)")
    }
  }

  test("near-miss patterns are not rewritten") {
    GraftExtensions.install(spark)
    val base = spark.range(1)
      .select(when(col("id") >= 0, expr("array(1D, 2D)")).as("a"),
        when(col("id") >= 0, expr("array(3D, 4D)")).as("b"))
    Seq(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1D, (acc, x) -> acc + x)", // zero != 0
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0D, (acc, x) -> acc + x)", // not a product
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc - x)", // not a sum
      "aggregate(zip_with(a, b, (x, y) -> x * x), 0D, (acc, x) -> acc + x)") // one-var body
      .foreach { e =>
        val p = optimized(base.select(expr(e).as("v")))
        assert(!p.contains("double_dot"), s"must not rewrite: $e\n$p")
      }
  }

  test("install is idempotent") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.RewriteDotProduct) == 1)
  }
}
