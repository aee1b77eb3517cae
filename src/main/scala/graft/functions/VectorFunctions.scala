package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns,
  * built from codegen'd higher-order functions (`zip_with`/`aggregate`)
  * — no UDFs, so the expressions stay inside whole-stage codegen and
  * Catalyst can prune/push around them.
  *
  * All math is done in DOUBLE with strict left-to-right accumulation,
  * which is also how DuckDB's list functions accumulate — keeping the
  * oracle comparison bit-exact.
  */
object VectorFunctions {

  /** Elementwise dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0-vector guard returns 0.0 rather than NaN. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** array<float> -> array<double> (compute in double everywhere). */
  def asDouble(a: Column): Column = a.cast("array<double>")
}
