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
}
