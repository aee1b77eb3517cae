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
  *  - `long_match_count(array<bigint>, array<bigint>)` — codegen'd count
  *    of equal positions (MinHash signature match)
  *  - `count_in(array<string>, array<string>)` — codegen'd membership
  *    hit count (stopword/marker/top-vocab scoring)
  *  - `word_pairs(array<string>, mode)` — codegen'd adjacent word
  *    pairs (0 ordered structs, 1 canonical structs, 2 joined strings)
  *  - `minhash_sketch(bigint)` — 32-permutation MinHash signature sketch
  *    (engine-neutral affine perms over mod-2^40 inputs, see [[RkLsh]])
  *  - `simhash_sketch(bigint, bigint)` — weighted 63-bit SimHash
  *  - `shingle_hashes(array<string>, k)` — distinct word-k-gram hashes
  *    (engine-LOCAL values; oracles re-join raw strings)
  *  - `rk_shingle_hashes(array<string>, k)` — distinct word-k-gram RK
  *    hashes (engine-NEUTRAL values; oracles replay the arithmetic)
  *  - `rk_word_hash(string)` — RK char fold mod 2^40 of one word
  *  - `topn_by_key(bigint, bigint, n)` — bounded smallest-n (key, id)
  *    sketch; returns ids ordered by (key, id)
  *  - `hll_sketch(bigint)` — engine-neutral HyperLogLog distinct sketch
  *  - `hist_sketch(bigint)` — engine-neutral log-histogram percentile sketch
  *  - `rk_lsh_signatures(array<double>, tables, bits)` — ±1 Rademacher
  *    hyperplane LSH signatures (engine-NEUTRAL planes; oracles replay them)
  *  - `vector_avg(array<double>)` — element-wise mean sketch aggregate
  *  - `vector_sum_long(array<bigint>)` — element-wise integer sum sketch
  *    aggregate → `struct(n, s)` (engine-NEUTRAL: exact, order-free)
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

  /** Extract a compile-time integer argument (e.g. a shingle width that
    * shapes generated code). Checking `foldable` FIRST matters: eval()
    * on a non-foldable (unbound attribute) expression surfaces as an
    * obscure analyzer-time UnsupportedOperationException instead of
    * this message. */
  private def foldableInt(name: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: argument must be a foldable (constant) integer, got ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: argument must be a foldable integer, got $other")
    }
  }

  private[functions] def doubleDotBuilder(exprs: Seq[Expression]): Expression = {
    arity("double_dot", 2)(exprs)
    DoubleDot(Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))
  }

  /** Extract a compile-time long-array argument (dc4's Bloom sketch —
    * model state baked into the generated code's references, not a
    * per-row input). */
  private def foldableLongArray(name: String, e: Expression): Array[Long] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: argument must be a foldable (constant) array<bigint>, got ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toLongArray()
      case other => throw new IllegalArgumentException(
        s"$name: argument must be a foldable array<bigint>, got $other")
    }
  }

  /** Sessions already registered, keyed weakly on their function
    * registry: every query entry point calls [[registerAll]]
    * defensively, and re-registering 17 functions per query floods
    * stderr with "function X replaced" registry warnings — hundreds of
    * lines per bench sweep burying any real warning. Registration is
    * idempotent either way; this guard only makes it once-per-session.
    * Weak keys: a dropped session must not be pinned by the guard. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]())

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // fast path without the lock — the map is a synchronizedMap, and
    // a TRUE entry is only ever published AFTER registerInto succeeded
    if (registered.get(reg) != null) return
    // registration runs under a lock and the flag publishes after it
    // completes: a putIfAbsent-then-register would let a concurrent
    // first caller (e.g. VectorFunctions.dot racing a training thread)
    // return early and fail with "undefined function double_dot"
    registered.synchronized {
      if (registered.get(reg) == null) {
        registerInto(spark, reg)
        registered.put(reg, java.lang.Boolean.TRUE)
      }
    }
  }

  private def registerInto(spark: SparkSession,
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    reg.createOrReplaceTempFunction("double_dot", doubleDotBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("bloom_hits", exprs => {
      arity("bloom_hits", 3)(exprs)
      BloomHits(exprs(0), foldableLongArray("bloom_hits", exprs(1)),
        foldableInt("bloom_hits", exprs(2)).toLong)
    }, "scala_udf")
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
    reg.createOrReplaceTempFunction("vector_sum_long", exprs => {
      arity("vector_sum_long", 1)(exprs)
      VectorSumLong(Cast(exprs.head, ArrayType(LongType)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("quantize_unit", exprs => {
      arity("quantize_unit", 2)(exprs)
      QuantizeUnit(Cast(exprs(0), ArrayType(DoubleType)),
        foldableInt("quantize_unit", exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("matrix_dots", exprs => {
      arity("matrix_dots", 2)(exprs)
      MatrixDots(Cast(exprs(0), ArrayType(DoubleType)),
        Cast(exprs(1), ArrayType(ArrayType(DoubleType))))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash", exprs => {
      arity("rolling_hash", 2)(exprs)
      RollingHashFp(exprs(0), foldableInt("rolling_hash", exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes", exprs => {
      arity("shingle_hashes", 2)(exprs)
      // k must be a compile-time constant (it shapes the generated code)
      ShingleHashes(exprs(0), foldableInt("shingle_hashes", exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes_pos", exprs => {
      arity("shingle_hashes_pos", 2)(exprs)
      ShingleHashesPos(exprs(0), foldableInt("shingle_hashes_pos", exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("rk_shingle_hashes", exprs => {
      arity("rk_shingle_hashes", 2)(exprs)
      RkShingleHashes(exprs(0), foldableInt("rk_shingle_hashes", exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("rk_word_hash", exprs => {
      arity("rk_word_hash", 1)(exprs)
      RkWordHash(exprs.head)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hll_sketch", exprs => {
      arity("hll_sketch", 1)(exprs)
      HllSketch(Cast(exprs.head, LongType))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hist_sketch", exprs => {
      arity("hist_sketch", 1)(exprs)
      HistSketch(Cast(exprs.head, LongType))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("rk_lsh_signatures", exprs => {
      arity("rk_lsh_signatures", 3)(exprs)
      RkLshSignatures(Cast(exprs(0), ArrayType(DoubleType)),
        foldableInt("rk_lsh_signatures", exprs(1)), foldableInt("rk_lsh_signatures", exprs(2)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("word_pairs", exprs => {
      arity("word_pairs", 2)(exprs)
      WordPairs(Cast(exprs(0), ArrayType(org.apache.spark.sql.types.StringType)),
        foldableInt("word_pairs", exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("count_in", exprs => {
      arity("count_in", 2)(exprs)
      CountIn(Cast(exprs(0), ArrayType(org.apache.spark.sql.types.StringType)),
        Cast(exprs(1), ArrayType(org.apache.spark.sql.types.StringType)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("long_match_count", exprs => {
      arity("long_match_count", 2)(exprs)
      LongMatchCount(Cast(exprs(0), ArrayType(LongType)),
        Cast(exprs(1), ArrayType(LongType)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("topn_by_key", exprs => {
      arity("topn_by_key", 3)(exprs)
      TopNByKey(Cast(exprs(0), LongType), Cast(exprs(1), LongType),
        foldableInt("topn_by_key", exprs(2)))
    }, "scala_udf")
    spark.udf.register("ma_agg", udaf(new MaAggregator))
  }
}
