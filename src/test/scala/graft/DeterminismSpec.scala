package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-less (rows-only) queries have no cross-engine check, so
  * at minimum they must be self-deterministic: two executions in the
  * same session yield identical row sets (catches unseeded randomness,
  * Map-iteration-order leaks, partition-order sensitivity in
  * collect-free plans, etc.). */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  private val rowsOnly =
    SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet

  test("every rows-only query is run-to-run deterministic") {
    assert(rowsOnly.nonEmpty)
    rowsOnly.toSeq.sorted.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val b = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name differs between two runs")
      assert(a.nonEmpty, s"$name returned no rows")
    }
  }
}
