package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns.
  *
  * `dot` is the custom codegen'd [[DoubleDot]] Catalyst expression — the
  * built-in `zip_with`/`aggregate` HOF formulation evaluates its lambdas
  * interpreted, which dominated runtime on pairwise-cosine workloads.
  *
  * All math is done in DOUBLE with strict left-to-right accumulation,
  * the same order as DuckDB's list functions — keeping the oracle
  * comparison bit-exact.
  *
  * For pairwise work, precompute `norm2` once per vector and combine
  * with one `dot` per pair (cosine = dot / (normA * normB)) instead of
  * calling [[cosine]] per pair (3 dots).
  */
object VectorFunctions {

  /** Registers `double_dot` in the active session's function registry
    * so [[DoubleDot]] is reachable from the public Column API — Spark 4
    * hides direct Expression→Column construction. Delegates to
    * [[GraftFunctions.registerAll]], whose per-session guard makes this
    * a no-op after the first call — `dot` is called per-Column-build,
    * and re-registering each time flooded stderr with registry
    * "function replaced" warnings. */
  private def ensureRegistered(): Unit =
    GraftFunctions.registerAll(SparkSession.active)

  /** Elementwise dot product in double precision (codegen'd). */
  def dot(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("double_dot", a.cast("array<double>"), b.cast("array<double>"))
  }

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0-vector guard returns 0.0 rather than NaN.
    * Prefer dot + precomputed norms for pairwise workloads. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** array<float> -> array<double> (compute in double everywhere). */
  def asDouble(a: Column): Column = a.cast("array<double>")
}
