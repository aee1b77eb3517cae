package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** Registers every custom function this library ships into a session's
  * function registry, making them available to both the Column API
  * (`call_function`) and plain SQL text:
  *
  *  - `double_dot(array<double>, array<double>)` — codegen'd dot product
  *  - `minhash_sketch(bigint)` — 32-permutation MinHash signature sketch
  *  - `ma_agg(double, bigint, string)` — the reference's moving-average
  *    aggregation protocol (sum/count/sma/real/filled/n struct)
  *
  * Idempotent; safe to call per query.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "double_dot", exprs => DoubleDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_sketch", exprs => MinHashSketch(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash_sketch", exprs => SimHashSketch(exprs(0), exprs(1)), "scala_udf")
    spark.udf.register("ma_agg", udaf(new MaAggregator))
  }
}
