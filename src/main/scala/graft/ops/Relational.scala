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

  /** TPC-H Q1-shaped pricing summary over lineitem. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 6).as("sum_qty"),
        round(sum(col("l_extendedprice")), 6).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 6).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 6) AS sum_qty,
      |       round(sum(l_extendedprice), 6) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_extendedprice), 6) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Fact ⋈ broadcast(dim) ⋈ broadcast(dim): revenue per nation. */
  def j1RevenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice")), 6).as("revenue"), count(lit(1)).as("n_orders"))
  }

  private val j1Oracle =
    """SELECT n_name, round(sum(o_totalprice), 6) AS revenue, count(*) AS n_orders
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
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-4L * 3600, 0L)
    e.withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("ma", round(avg(col("value")).over(w), 6))
      .withColumn("n_in_frame", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("ma"), col("n_in_frame"))
  }

  private val wf2Oracle =
    """SELECT event_id, user_id,
      |       round(avg(value) OVER w, 6) AS ma,
      |       count(*) OVER w AS n_in_frame
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
      |             RANGE BETWEEN 14400 PRECEDING AND CURRENT ROW)""".stripMargin

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
      .agg(round(sum(col("l_extendedprice")), 6).as("sum_price"), count(lit(1)).as("n"))

  private val cube1Oracle =
    """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 6) AS sum_price, count(*) AS n
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

  /** Correlated scalar subquery — Catalyst decorrelates it into an
    * aggregate + join (no per-row subquery execution at any scale):
    * orders above their customer's average order value. */
  def sq1ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
        |WHERE o_totalprice > (SELECT 1.1 * avg(o2.o_totalprice) FROM orders_v o2
        |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  private val sq1Oracle =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > (SELECT 1.1 * avg(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  val queries: Seq[Q] = Seq(
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
