package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Extended

/** Layout properties of z1 the DuckDB oracle can't check: the point of
  * the Morton interleave is that per-bucket min/max ranges are TIGHT IN
  * BOTH dimensions at once — the file-skipping property — which is a
  * geometry claim about the emitted bucket stats, not a value claim.
  * (The values themselves ARE oracle-checked; this spec pins why the
  * layout is worth producing.)
  */
class ZorderSpec extends AnyFunSuite {
  import TestSpark._

  // z1 output: (zbucket, n_rows, min_key, max_key, min_day, max_day)
  private lazy val rows = Extended.z1ZorderLayout(spark, sf).collect()

  test("every z-bucket spans <= 1/8 of BOTH dimension ranges") {
    assert(rows.nonEmpty && rows.length <= 64)
    val minK = rows.map(_.getLong(2)).min; val maxK = rows.map(_.getLong(3)).max
    val minD = rows.map(_.getLong(4)).min; val maxD = rows.map(_.getLong(5)).max
    // the top-6-bit bucket fixes 3 high bits of each 16-bit grid
    // dimension — an 8x8 grid cell, 8192 grid units per side. One grid
    // unit is range/65535 in original units (floor scaling), so a cell
    // side maps back to at most 8192*range/65535 + 1 original units.
    def cap(range: Long): Long = range * 8192 / 65535 + 2
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= cap(maxK - minK),
        s"bucket ${r.getLong(0)}: key span ${r.getLong(3) - r.getLong(2)} > ${cap(maxK - minK)}")
      assert(r.getLong(5) - r.getLong(4) <= cap(maxD - minD),
        s"bucket ${r.getLong(0)}: day span ${r.getLong(5) - r.getLong(4)} > ${cap(maxD - minD)}")
    }
  }

  test("a point predicate on either dimension overlaps <= 8 of the 64 buckets") {
    // the footer-stats pruning story: a scan with key = v keeps only
    // buckets whose [min_key, max_key] contains v. The grid maps v into
    // exactly one of the 8 x-slices, and bucket stats never cross a
    // slice (the scaling is monotonic), so at most the 8 buckets of
    // that slice survive — ~7/8 of the files pruned, in EITHER
    // dimension, from one layout. A lexicographic (key, day) sort gets
    // this for key only; a day predicate would keep everything.
    val minK = rows.map(_.getLong(2)).min; val maxK = rows.map(_.getLong(3)).max
    val minD = rows.map(_.getLong(4)).min; val maxD = rows.map(_.getLong(5)).max
    for (frac <- Seq(0.1, 0.5, 0.9)) {
      val vK = minK + ((maxK - minK) * frac).toLong
      val vD = minD + ((maxD - minD) * frac).toLong
      val byKey = rows.count(r => r.getLong(2) <= vK && vK <= r.getLong(3))
      val byDay = rows.count(r => r.getLong(4) <= vD && vD <= r.getLong(5))
      assert(byKey <= 8, s"key=$vK overlaps $byKey buckets")
      assert(byDay <= 8, s"day=$vD overlaps $byDay buckets")
    }
  }
}
