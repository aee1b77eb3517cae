package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Registers every custom function this library ships into a session's
  * function registry, making them available to both the Column API
  * (`call_function`) and plain SQL text:
  *
  *  - `double_dot(array<double>, array<double>)` — codegen'd dot product
  *  - `minhash_sketch(bigint)` — 32-permutation MinHash signature sketch
  *  - `simhash_sketch(bigint, bigint)` — weighted 64-bit SimHash
  *  - `shingle_hashes(array<string>, k)` — distinct word-k-gram hashes
  *  - `vector_avg(array<double>)` — element-wise mean sketch aggregate
  *  - `rolling_hash(array<string>, k)` — Rabin–Karp [min, full] fingerprint
  *  - `ma_agg(double, bigint, string)` — the reference's moving-average
  *    aggregation protocol (sum/count/sma/real/filled/n struct)
  *
  * The builders validate arity and insert casts to the expected input
  * types — the expressions themselves read primitive slots and would
  * otherwise silently misread (or crash on) e.g. an array<float> column
  * passed from SQL. Idempotent; safe to call per query. This is the
  * single registration point — VectorFunctions delegates here.
  */
object GraftFunctions {

  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Unit =
    require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")

  private[functions] def doubleDotBuilder(exprs: Seq[Expression]): Expression = {
    arity("double_dot", 2)(exprs)
    DoubleDot(Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("double_dot", doubleDotBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sketch", exprs => {
      arity("minhash_sketch", 1)(exprs)
      MinHashSketch(Cast(exprs.head, LongType))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash_sketch", exprs => {
      arity("simhash_sketch", 2)(exprs)
      SimHashSketch(Cast(exprs(0), LongType), Cast(exprs(1), LongType))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("vector_avg", exprs => {
      arity("vector_avg", 1)(exprs)
      VectorAvg(Cast(exprs.head, ArrayType(DoubleType)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash", exprs => {
      arity("rolling_hash", 2)(exprs)
      val k = exprs(1).eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"rolling_hash: k must be a foldable integer, got $other")
      }
      RollingHashFp(exprs(0), k)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes", exprs => {
      arity("shingle_hashes", 2)(exprs)
      // k must be a compile-time constant (it shapes the generated code)
      val k = exprs(1).eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"shingle_hashes: k must be a foldable integer, got $other")
      }
      ShingleHashes(exprs(0), k)
    }, "scala_udf")
    spark.udf.register("ma_agg", udaf(new MaAggregator))
  }
}
