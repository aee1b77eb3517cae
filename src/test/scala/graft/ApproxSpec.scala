package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Extended

/** Accuracy bounds for the approximate sketches (no cross-engine oracle
  * — sketch internals are engine-specific). */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("apx1 HLL distinct count is within 5% of exact per group") {
    val approx = Extended.apx1HllDistinct(spark, sf)
      .select("l_returnflag", "approx_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"group $k: approx=$a exact=$e")
    }
  }

  test("apx2 percentile_approx brackets the true median per group") {
    val approx = Extended.apx2Percentile(spark, sf)
      .select("l_returnflag", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact median via sort (test-scale only)
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      val a = approx(k)
      assert(math.abs(a - m) / m <= 0.05, s"group $k: approx-median=$a exact=$m")
    }
  }
}
