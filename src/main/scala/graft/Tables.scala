package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables at /root/testdata/sf*.
  *
  * Scale posture: these are plain parquet scans — Catalyst pushes filters
  * and prunes columns into the scan, so every query built on top of them
  * keeps `PushedFilters`/`ReadSchema` tight. On a real cluster the same
  * code reads a partitioned table; nothing here is local-mode-specific.
  */
object Tables {
  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects by default. We read it as raw nanos (legacy conf) and
    * truncate to microseconds ourselves — the exact truncation DuckDB
    * applies when it reads the same file, so oracle comparisons agree.
    * The conf is a runtime SQLConf, set here so any session (including
    * the driver's own) can load the table.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
