package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The relational surface SURVEY.md §2.12 inherits from Spark rather than
  * reimplements — joins (broadcast/semi/anti), sorts+limits, set ops,
  * OVER-clause window functions, distinct aggregation, rollup — each
  * exercised over the TPC-H-ish tables with a DuckDB oracle so the
  * "inherited" claim is itself verified.
  *
  * Scale notes: dimension sides of joins (customer, nation, orders-per-
  * key slices) are explicitly `broadcast()` so no shuffle of the fact
  * table happens for them at any SF; sort+limit uses Spark's TakeOrdered
  * (per-partition top-k then merge, no global sort); rollup/distinct
  * aggregate through the standard two-phase partial/final pipeline.
  */
object Relational {
  import Fmt._

  /** TPC-H Q1-shaped pricing summary over lineitem.
    *
    * Monetary aggregation runs in EXACT integer cents (quantities are
    * integral, prices/discounts/taxes 2-decimal): at sf0.1 these sums
    * pass 1e10 where a double's ulp exceeds the round-6 step, so float
    * sums are not comparable across engines at all. Per-row products
    * expand to cents×(100−d)×(100+t) — ≤ ~4e11, comfortably a long —
    * but their SUMS are the overflow frontier: the e6-scaled charge sum
    * crosses 1e18 near sf1 and would wrap a long SILENTLY (ANSI off in
    * the harness). Since round 3 the two multiplicative sums aggregate
    * as DECIMAL(38,0) — exact to 1e38, i.e. unreachable — matching
    * DuckDB's own HUGEINT widening of integer sums; EdgeSpec proves the
    * widened path is exact past Long.MaxValue where the long form
    * wraps. Means truncate in scaled integer space (graft.ops.Exact);
    * their double division is ulp-exact while the scaled sums stay
    * below 2^53 (~sf10, same bound the DuckDB oracle's `/` carries). */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val cents = Exact.cents(col("l_extendedprice"))
    val dC = Exact.cents(col("l_discount"))   // 0..10
    val tC = Exact.cents(col("l_tax"))        // 0..10
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        sum(cents).as("price_cents"),
        sum((cents * (lit(100L) - dC)).cast("decimal(38,0)")).as("disc_e4"),
        sum((cents * (lit(100L) - dC) * (lit(100L) + tC)).cast("decimal(38,0)")).as("charge_e6"),
        sum(dC).as("disc_cents"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("qty_sum").cast("double").as("sum_qty"),
        (col("price_cents").cast("double") / 100).as("sum_base_price"),
        (col("disc_e4").cast("double") / 10000).as("sum_disc_price"),
        (col("charge_e6").cast("double") / 1000000).as("sum_charge"),
        Exact.intRatio(col("qty_sum"), col("count_order")).as("avg_qty"),
        Exact.centsMean(col("price_cents"), col("count_order")).as("avg_price"),
        Exact.centsMean(col("disc_cents"), col("count_order")).as("avg_disc"),
        col("count_order"))
  }

  private val q1Oracle =
    """WITH a AS (
      |  SELECT l_returnflag, l_linestatus,
      |         sum(CAST(l_quantity AS BIGINT)) AS qty_sum,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS disc_e4,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS charge_e6,
      |         CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents,
      |         count(*) AS count_order
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |  GROUP BY l_returnflag, l_linestatus)
      |SELECT l_returnflag, l_linestatus,
      |       CAST(qty_sum AS DOUBLE) AS sum_qty,
      |       CAST(price_cents AS DOUBLE) / 100 AS sum_base_price,
      |       CAST(disc_e4 AS DOUBLE) / 10000 AS sum_disc_price,
      |       CAST(charge_e6 AS DOUBLE) / 1000000 AS sum_charge,
      |       floor(qty_sum * 1000000 / count_order) / 1000000 AS avg_qty,
      |       floor(price_cents * 10000 / count_order) / 1000000 AS avg_price,
      |       floor(disc_cents * 10000 / count_order) / 1000000 AS avg_disc,
      |       count_order
      |FROM a""".stripMargin

  /** Fact ⋈ broadcast(dim) ⋈ broadcast(dim): revenue per nation. */
  def j1RevenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Exact.fromCents(sum(Exact.cents(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  private val j1Oracle =
    """SELECT n_name,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
      |       count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |            JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Left-semi join: customers that have at least one big order. */
  def j2SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  private val j2Oracle =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  /** Left-anti join: customers with no high-value order. */
  def j3AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  private val j3Oracle =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  /** OVER-clause analytics: top-3 orders per customer by price,
    * deterministic tie-break on orderkey. */
  def wf1TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  private val wf1Oracle =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin

  /** Analytic moving average over an event-time frame — the batch-oracle
    * formulation of the reference's sliding MA (SURVEY §2.9): avg OVER
    * (PARTITION BY key ORDER BY ts RANGE BETWEEN 4 hours PRECEDING AND
    * CURRENT ROW). */
  def wf2RangeMa(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // order on MICROSECOND-exact epoch — whole-second truncation would
    // disagree with the oracle's fractional-second frame membership for
    // pairs straddling the 4h boundary by less than a second
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-4L * 3600 * 1000000L, 0L)
    e.withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("s_cents", sum(Exact.cents(col("value"))).over(w))
      .withColumn("n_in_frame", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"),
        Exact.centsMean(col("s_cents"), col("n_in_frame")).as("ma"),
        col("n_in_frame"))
  }

  private val wf2Oracle =
    """SELECT event_id, user_id,
      |       floor(sum(CAST(round(value * 100) AS BIGINT)) OVER w * 10000
      |             / (count(*) OVER w)) / 1000000 AS ma,
      |       count(*) OVER w AS n_in_frame
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 14400000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Sort + limit (top-k): TakeOrdered physical plan, deterministic via
    * full tie-break. */
  def srt1TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  private val srt1Oracle =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  /** UNION (distinct) of keys from two predicates. */
  def set1Union(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_totalprice") > 450000).select(col("o_custkey"))
    val b = Tables.customer(spark, dir).filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("o_custkey"))
    a.union(b).distinct()
  }

  private val set1Oracle =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 450000
      |UNION
      |SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal < 0""".stripMargin

  /** INTERSECT of two key sets. */
  def set2Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
  }

  private val set2Oracle =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  /** EXCEPT of two key sets. */
  def set3Except(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.select(col("c_custkey"))
      .except(o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("c_custkey")))
  }

  private val set3Oracle =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000""".stripMargin

  /** Distinct aggregation. */
  def aggd1Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))

  private val aggd1Oracle =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** ROLLUP over two grouping columns. */
  def rollup1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 6).as("sum_qty"), count(lit(1)).as("n"))

  private val rollup1Oracle =
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over two grouping columns (all 4 grouping-set combinations). */
  def cube1(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(Exact.fromCents(sum(Exact.cents(col("l_extendedprice")))).as("sum_price"),
        count(lit(1)).as("n"))

  private val cube1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_price,
      |       count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** lag/lead analytics: per-customer order-to-order price delta. */
  def wf3LagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") - coalesce(col("prev_price"), lit(0.0)), 6).as("delta_prev"),
        round(coalesce(col("next_price"), lit(0.0)), 6).as("next_price"))
  }

  private val wf3Oracle =
    """SELECT o_orderkey, o_custkey,
      |       round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, 0), 6) AS delta_prev,
      |       round(coalesce(lead(o_totalprice, 1) OVER w, 0), 6) AS next_price
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** Correlated scalar subqueries — Catalyst decorrelates them into
    * aggregates + joins (no per-row subquery execution at any scale):
    * orders above 1.1× their customer's average order value. The
    * comparison is all-integer (price·10·n > 11·sum_cents ⇔
    * price > 1.1·avg) per the Exact conventions — a float avg here
    * would make boundary rows flip between engines. */
  def sq1ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 10 *
        |      (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
        |    > 11 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
        |            FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  private val sq1Oracle =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 10 *
      |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |    > 11 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
      |            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  /** PIVOT: per-user event counts spread across event-type columns
    * (explicit value list ⇒ deterministic schema; Spark plans this as
    * a single aggregation with one CASE-guarded count per value —
    * no extra shuffle versus the flat groupBy). */
  def pv1Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  private val pv1Oracle =
    """SELECT user_id,
      |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
      |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |FROM events GROUP BY user_id""".stripMargin

  /** Regex scalar functions (simple patterns identical under Java and
    * RE2 regex dialects). */
  def f11Regex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      regexp_replace(col("text"), "[aeiou]", "").substr(1, 40).as("devoweled"),
      regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"))

  private val f11Oracle =
    """SELECT doc_id,
      |       substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 40) AS devoweled,
      |       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word
      |FROM documents""".stripMargin

  /** String scalar functions: case, pad, trim, substring, length. */
  def f12StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"),
      upper(col("c_name")).as("uname"),
      lpad(col("c_mktsegment"), 12, ".").as("padded"),
      substring(col("c_name"), 1, 8).as("prefix"),
      length(col("c_name")).as("name_len"))

  private val f12Oracle =
    """SELECT c_custkey, upper(c_name) AS uname, lpad(c_mktsegment, 12, '.') AS padded,
      |       substr(c_name, 1, 8) AS prefix, length(c_name) AS name_len
      |FROM customer""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("pv1_pivot", pv1Pivot, Some(pv1Oracle)),
    Q("f11_regex", f11Regex, Some(f11Oracle)),
    Q("f12_string_funcs", f12StringFuncs, Some(f12Oracle)),
    Q("cube1", cube1, Some(cube1Oracle)),
    Q("wf3_lag_lead", wf3LagLead, Some(wf3Oracle)),
    Q("sq1_scalar_subquery", sq1ScalarSubquery, Some(sq1Oracle)),
    Q("q1_pricing_summary", q1Pricing, Some(q1Oracle)),
    Q("j1_revenue_per_nation", j1RevenuePerNation, Some(j1Oracle)),
    Q("j2_semi_join", j2SemiJoin, Some(j2Oracle)),
    Q("j3_anti_join", j3AntiJoin, Some(j3Oracle)),
    Q("wf1_top_orders", wf1TopOrders, Some(wf1Oracle)),
    Q("wf2_range_ma", wf2RangeMa, Some(wf2Oracle)),
    Q("srt1_topk", srt1TopK, Some(srt1Oracle)),
    Q("set1_union", set1Union, Some(set1Oracle)),
    Q("set2_intersect", set2Intersect, Some(set2Oracle)),
    Q("set3_except", set3Except, Some(set3Oracle)),
    Q("aggd1_distinct", aggd1Distinct, Some(aggd1Oracle)),
    Q("rollup1", rollup1, Some(rollup1Oracle)))
}
