package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Round-2 verdict item 5: the exact-cents bound was documented but
  * unenforced — past ~sf1 the e6-scaled charge sum wrapped a long
  * SILENTLY (ANSI off in the harness). q1 now aggregates the two
  * multiplicative sums as DECIMAL(38,0); this spec feeds a synthetic
  * lineitem whose charge sum exceeds Long.MaxValue and asserts the
  * widened path returns the EXACT value where the old long sum wrapped
  * negative. */
class ExactOverflowSpec extends AnyFunSuite {
  import TestSpark._

  test("q1's widened charge sum is exact past Long.MaxValue") {
    import spark.implicits._
    // 20 rows of cents = 4.5e13 (price 4.5e11, 2-decimal-exact), d = 0,
    // t = 0.10 ⇒ per-row charge_e6 = 4.5e13·100·110 = 4.95e17 (long-
    // safe per row — the expression computes the product in long before
    // the decimal cast); the SUM = 9.9e18 > Long.MaxValue (9.22e18), so
    // the round-2 long aggregation would wrap negative while the
    // DECIMAL(38) sum stays exact. The magnitudes are tuned so only the
    // charge sum crosses the line: price_cents·10^4 = 9e18 stays inside
    // long for the centsMean divisions (their documented ~2^53/sf10
    // bound is separate).
    val price = 4.5e11 // dollars ⇒ cents = 4.5e13
    val rows = Seq.fill(20)(("A", "F", 1.0, price, 0.0, 0.10, "1995-01-01 00:00:00"))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_ship")
      .withColumn("l_shipdate", col("l_ship").cast("timestamp"))
      .drop("l_ship")
    val dir = java.nio.file.Files.createTempDirectory("q1_overflow").toString
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val r = Relational.q1Pricing(spark, dir).collect()
    assert(r.length == 1)
    val sumCharge = r.head.getAs[Double]("sum_charge")
    // exact expected: 20 · (4.5e13 · 100 · 110) / 1e6 = 9.9e12 — an
    // integer < 2^53, and the e6 sum 9.9e18 = 2^17·99·5^17·… has a
    // < 2^53 odd part, so BOTH the decimal sum and its double rendering
    // are exact: strict equality is the right assertion
    assert(sumCharge == 9.9e12, s"sum_charge=$sumCharge expected=9.9e12")
    assert(sumCharge > 0, "a wrapped long sum would be negative here")
    // and the long form WOULD have wrapped: 20 × 4.95e17 > Long.MaxValue
    assert(BigInt(20) * BigInt("495000000000000000") > BigInt(Long.MaxValue))
  }

  test("an1's integer z-score test matches an independent BigInt reference; sigma=0 flags nothing") {
    import org.apache.spark.sql.functions._
    import graft.ops.Extended
    // independent reference: replay the registered test
    // (cn−S)² > 4(nQ−S²) in plain BigInt over the fixture's cents,
    // then compare per-user flag counts
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val cs = rows.map(x => BigInt(x._2))
      val n = BigInt(cs.length); val s = cs.sum; val q = cs.map(c => c * c).sum
      val rhs = 4 * (n * q - s * s)
      u -> ((cs.length.toLong,
        cs.count(c => { val d = c * n - s; d * d > rhs }).toLong))
    }
    val got = Extended.an1ZscoreAnomaly(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: got ${got(u)}, want $e") }
    assert(expect.values.map(_._2).sum > 0, "fixture should produce some anomalies")
    // sigma = 0 degeneracy on a constant-value user
    val cs = Seq.fill(5)(BigInt(777))
    val n = BigInt(5); val s = cs.sum; val q = cs.map(c => c * c).sum
    assert(cs.forall(c => { val d = c * n - s; d * d <= 4 * (n * q - s * s) }))
  }
}
