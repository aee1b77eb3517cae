package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-level parity with the reference's V1 aggregation semantics
  * (`faust_app/ma_agg.py:49-81`) at the reference's own scale — 5-second
  * windows over per-second data — exercising every SURVEY §1.3 edge:
  * zero-volume exclusion, safe division (0.0 not NULL), exactly-5 gate,
  * real/filled tallies, min/max window bounds. */
class ReferenceSemanticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // one record per second, schema mirrors StockData's aggregation-relevant slice
  private val rows = Seq(
    // symbol A: 5 consecutive seconds, one zero-volume, one 'filled'
    ("A", t("2024-01-01 00:00:00"), 10.0, 1L, "real"),
    ("A", t("2024-01-01 00:00:01"), 20.0, 2L, "real"),
    ("A", t("2024-01-01 00:00:02"), 30.0, 0L, "real"), // zero volume: excluded from mean
    ("A", t("2024-01-01 00:00:03"), 40.0, 1L, "filled"),
    ("A", t("2024-01-01 00:00:04"), 50.0, 3L, "real"),
    // symbol B: only 4 seconds -> gate fails, no emission
    ("B", t("2024-01-01 00:00:00"), 1.0, 1L, "real"),
    ("B", t("2024-01-01 00:00:01"), 2.0, 1L, "real"),
    ("B", t("2024-01-01 00:00:02"), 3.0, 1L, "real"),
    ("B", t("2024-01-01 00:00:03"), 4.0, 1L, "real"),
    // symbol C: 5 seconds ALL zero-volume -> sma must be 0.0, not NULL
    ("C", t("2024-01-01 00:00:00"), 9.0, 0L, "real"),
    ("C", t("2024-01-01 00:00:01"), 9.0, 0L, "real"),
    ("C", t("2024-01-01 00:00:02"), 9.0, 0L, "filled"),
    ("C", t("2024-01-01 00:00:03"), 9.0, 0L, "filled"),
    ("C", t("2024-01-01 00:00:04"), 9.0, 0L, "real"))
    .toDF("symbol", "ts", "vwap", "size", "flag")

  // the V1 aggregation (`ma_agg.py:57-76`) over a 5s/1s hopping window
  private def v1(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(window($"ts", "5 seconds", "1 second"), $"symbol")
    .agg(
      coalesce(sum(when($"size" =!= 0, $"vwap")), lit(0.0)).as("sum_of_vwap"),
      count(when($"size" =!= 0, lit(1))).as("count_of_vwap"),
      count(when($"flag" === "real", lit(1))).as("real_count"),
      count(when($"flag" =!= "real", lit(1))).as("filled_count"),
      min($"ts").as("start"), max($"ts").as("end"),
      count(lit(1)).as("n"))
    .filter($"n" === 5)
    .withColumn("sma_value",
      when($"count_of_vwap" > 0, $"sum_of_vwap" / $"count_of_vwap").otherwise(0.0))

  test("exactly-5 gate: A and C emit (1 window each), B never emits") {
    val out = v1(rows).select($"symbol").as[String].collect()
    assert(out.sorted.toSeq == Seq("A", "C"))
  }

  test("zero-volume rows are excluded from sum and count (ma_agg.py:58-59)") {
    val a = v1(rows).filter($"symbol" === "A")
      .select($"sum_of_vwap", $"count_of_vwap", $"sma_value").head()
    assert(a.getDouble(0) == 120.0) // 10+20+40+50, 30 excluded
    assert(a.getLong(1) == 4L)
    assert(a.getDouble(2) == 30.0)
  }

  test("all-zero-volume window: sma is 0.0 and sum is 0.0, never NULL (ma_agg.py:70)") {
    val c = v1(rows).filter($"symbol" === "C")
      .select($"sum_of_vwap", $"count_of_vwap", $"sma_value").head()
    assert(!c.isNullAt(0) && c.getDouble(0) == 0.0)
    assert(c.getLong(1) == 0L)
    assert(!c.isNullAt(2) && c.getDouble(2) == 0.0)
  }

  test("real/filled tallies (ma_agg.py:60-61)") {
    val a = v1(rows).filter($"symbol" === "A").select($"real_count", $"filled_count").head()
    assert(a.getLong(0) == 4L && a.getLong(1) == 1L)
  }

  test("window bounds are min/max member event-times (ma_agg.py:67-68)") {
    val a = v1(rows).filter($"symbol" === "A").select($"start", $"end").head()
    assert(a.getTimestamp(0) == t("2024-01-01 00:00:00"))
    assert(a.getTimestamp(1) == t("2024-01-01 00:00:04"))
  }

  test("partial->final merge equals direct aggregation (ma_agg.py:284-300)") {
    // pre-aggregate 2s sub-buckets, merge additively, compare to direct
    val partials = rows
      .withColumn("sub", (unix_timestamp($"ts") / 2).cast("long"))
      .groupBy($"symbol", $"sub")
      .agg(sum(when($"size" =!= 0, $"vwap")).as("ps"),
        count(when($"size" =!= 0, lit(1))).as("pc"))
    val merged = partials.groupBy($"symbol")
      .agg(coalesce(sum($"ps"), lit(0.0)).as("s"), sum($"pc").as("c"))
      .withColumn("sma", when($"c" > 0, $"s" / $"c").otherwise(0.0))
      .select($"symbol", $"sma")
    val direct = rows.groupBy($"symbol")
      .agg((coalesce(sum(when($"size" =!= 0, $"vwap")), lit(0.0)) /
        greatest(count(when($"size" =!= 0, lit(1))), lit(1L))).as("sma_d"))
    val joined = merged.join(direct, "symbol")
      .select($"symbol", $"sma", $"sma_d").collect()
    joined.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12))
  }
}
