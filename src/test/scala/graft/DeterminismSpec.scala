package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-less (rows-only) queries would have no cross-engine check,
  * so at minimum they must be self-deterministic: two executions in
  * the same session yield identical row sets (catches unseeded
  * randomness, Map-iteration-order leaks, partition-order sensitivity
  * in collect-free plans, etc.).
  *
  * Since round 3 the rows-only set is EMPTY — every registered query
  * has a DuckDB oracle (sim3, the last holdout, became engine-neutral
  * integer-grid k-means). The first test pins that as the registry
  * invariant: a new query without an oracle entry fails here and must
  * either gain one or be consciously added to `allowedRowsOnly`, at
  * which point the determinism check below covers it. */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  // Empty again since round 8: mm10 (the last rows-only entry, lossy
  // JPEG) now registers an oracle over its deterministic projection
  // (recovered dims); the codec-accuracy bound is spec-tier since
  // round 9 (it is an environment property — see mm10's scaladoc). So
  // every registered query is DuckDB-hash-checked.
  private val allowedRowsOnly = Set.empty[String]

  private val rowsOnly =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  test("every registered query has a DuckDB oracle") {
    assert(rowsOnly == allowedRowsOnly,
      s"queries without an oracle entry: ${rowsOnly -- allowedRowsOnly}")
  }

  test("every rows-only query is run-to-run deterministic") {
    rowsOnly.toSeq.sorted.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name differs between two runs")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }

  test("Exact.utf8Order matches Spark's string comparison past the BMP") {
    // the advisory case: a supplementary-plane string (surrogate pair,
    // UTF-16 code units 0xD83D 0xDE00) vs a BMP string above 0xE000.
    // Scala's default Ordering (UTF-16 code units) sorts the emoji
    // FIRST; Spark/DuckDB compare UTF-8 bytes (0xF0... > 0xEE...) and
    // sort it LAST. Driver-held model state (w1's type dictionary,
    // tok2's vocabulary ids) must follow the engines.
    val emoji = new String(Character.toChars(0x1F600)) // UTF-8 F0 9F 98 80
    val bmp = "\uee00"         // private-use BMP, UTF-8 EE B8 80
    assert(Ordering.String.lt(emoji, bmp),
      "precondition: UTF-16 order puts the surrogate pair first")
    assert(graft.ops.Exact.utf8Order.gt(emoji, bmp),
      "utf8Order must put the supplementary-plane string last, like the engines")
    // and it agrees with Spark's min(string) on the same pair
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val engineMin = Seq(emoji, bmp).toDF("s").agg(min(col("s"))).head.getString(0)
    assert(Seq(emoji, bmp).min(graft.ops.Exact.utf8Order) == engineMin,
      "driver-side utf8Order min must equal Spark's min(string)")
    // prefix case: equal prefixes order by length in both systems
    assert(graft.ops.Exact.utf8Order.lt("ab", "abc"))
  }
}
