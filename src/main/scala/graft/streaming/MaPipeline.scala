package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.model.Schemas

/** The streaming replacement for the reference job
  * (`faust_app/ma_agg.py`): Kafka JSON in → per-symbol windowed moving
  * average → Kafka JSON out, expressed as Structured Streaming.
  *
  * Topology parity (SURVEY §3):
  *  - S1 source topic        → `fromKafka` (readStream kafka)
  *  - S2 JSON deserialization→ `parse` (from_json, explicit schema)
  *  - S5 group_by repartition→ the Exchange Spark inserts for groupBy
  *  - W1/W2 windows + gate   → `windowedSma`
  *  - S3 sink topic          → `toKafka` (to_json → writeStream kafka)
  *  - S4 changelog durability→ checkpointLocation (state store)
  *  - W5 1s timer            → Trigger.ProcessingTime("1 second")
  *  - W6 emission policy     → outputMode update (V1 re-emit cadence)
  *                             vs append (V2/V3 close-of-window)
  *
  * The watermark is event-time (idiomatic Spark) where the reference
  * evicts by wall clock (`ma_agg.py:51-54`); bit-exact V1 timer behavior
  * lives in [[V1StateProcessor]].
  *
  * Scale notes: state is keyed by (window, symbol) in the state store —
  * RocksDB-backed on a real cluster (`spark.sql.streaming.stateStore
  * .providerClass`), partitioned by the groupBy exchange, so 1000
  * executors each own a key range; nothing is driver-resident.
  */
object MaPipeline {

  /** S1 — Kafka source. The wiring mirrors
    * `app.topic('kafka_per_sec_data')` (`ma_agg.py:40`). Requires the
    * spark-sql-kafka connector on the classpath (not shipped in this
    * build environment — exercised via [[fromJsonFiles]]/MemoryStream,
    * which feed the identical downstream pipeline through `parse`). */
  def fromKafka(spark: SparkSession, servers: String,
      topic: String = "kafka_per_sec_data"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()

  /** S1 alternative runnable anywhere: stream JSON-lines files. Emits
    * the same single `value: string` column as the Kafka source, so the
    * downstream pipeline is byte-identical. */
  def fromJsonFiles(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)

  /** S2 — JSON bytes → typed columns with event-time `ts` parsed from
    * the ISO-8601 `current_time` (F1, `ma_agg.py:87`) and normalized to
    * UTC (F3, `ma_agg.py:46-47`; session TZ is pinned UTC). */
  def parse(raw: DataFrame): DataFrame =
    raw.select(Schemas.parseStockJson(col("value").cast("string")).as("v"))
      .select(col("v.*"))
      .withColumn("ts", to_timestamp(col("current_time")))

  /** ISO-8601 with Python-`isoformat()` fractional behavior: whole
    * seconds print without a fractional part, sub-second timestamps keep
    * full microseconds — matching the reference's output wire and
    * [[V1StateProcessor]]'s formatter (the round-1 seconds-only pattern
    * silently truncated sub-second tick timestamps on this path). */
  private def isoMicro(ts: Column): Column =
    when(date_format(ts, "SSSSSS") === "000000",
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .otherwise(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))

  /** W1/W2 — the windowed moving average over a parsed stream (or batch
    * DataFrame — same code, Spark's unified API). `gate = Some(5)`
    * reproduces the exactly-5 emission gate (`ma_agg.py:57`).
    *
    * `type` rides as a GROUPING key, not a `first()` in the aggregation
    * buffer: a string column in the buffer demotes the whole aggregate
    * from hash to sort-based (the batch w1 learned this in round 1;
    * PlanSpec pins it for this path too). The reference's type is
    * constant per symbol (`ma_agg.py:30`, one type per stock record
    * stream), so the grouping is unchanged. */
  def windowedSma(parsed: DataFrame, size: String = "5 seconds",
      slide: String = "1 second", watermark: String = "5 seconds",
      gate: Option[Int] = Some(5)): DataFrame = {
    val windowed = parsed
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("symbol"), col("type"))
      .agg(
        coalesce(sum(when(col("size_per_sec") =!= 0, col("vwap_price_per_sec"))), lit(0.0))
          .as("sum_of_vwap"),
        count(when(col("size_per_sec") =!= 0, lit(1))).as("count_of_vwap"),
        count(when(col("real_or_filled") === "real", lit(1))).as("real_data_count"),
        count(when(col("real_or_filled") =!= "real", lit(1))).as("filled_data_count"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        count(lit(1)).as("window_data_count"))
    val gated = gate.fold(windowed)(g => windowed.filter(col("window_data_count") === g))
    gated.select(
      col("symbol"), col("type"),
      lit("5_MA_data").as("MA_type"),
      isoMicro(col("min_ts")).as("start"),
      isoMicro(col("max_ts")).as("end"),
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("current_time"),
      when(col("count_of_vwap") > 0, col("sum_of_vwap") / col("count_of_vwap"))
        .otherwise(0.0).as("sma_value"),
      col("sum_of_vwap"), col("count_of_vwap"), col("window_data_count"),
      col("real_data_count"), col("filled_data_count"))
  }

  /** W3/V3 — tumbling-window merge of pre-aggregated partials
    * (`ma_agg.py:261-304`): consumes AggregatedData-shaped partials and
    * combines them additively, recomputing the SMA from merged sums. */
  def tumblingMerge(partials: DataFrame, size: String = "35 seconds",
      watermark: String = "35 seconds"): DataFrame =
    partials
      .withColumn("ts", to_timestamp(col("start")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size), col("symbol"), col("type"), col("MA_type"))
      .agg(
        sum(col("sum_of_vwap")).as("sum_of_vwap"),
        sum(col("count_of_vwap")).as("count_of_vwap"),
        sum(col("window_data_count")).as("window_data_count"),
        sum(col("real_data_count")).as("real_data_count"),
        sum(col("filled_data_count")).as("filled_data_count"))
      .select(
        col("symbol"), col("type"), col("MA_type"),
        date_format(col("window.start"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("start"),
        date_format(col("window.end"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("end"),
        when(col("count_of_vwap") > 0, col("sum_of_vwap") / col("count_of_vwap"))
          .otherwise(0.0).as("sma_value"),
        col("sum_of_vwap"), col("count_of_vwap"), col("window_data_count"),
        col("real_data_count"), col("filled_data_count"))

  /** S3 — JSON-serialize every column into `value` and write to the
    * sink topic (`ma_agg.py:44,78`). Checkpointing supplies the
    * durability the reference gets from its changelog topic (S4). */
  def toKafka(result: DataFrame, servers: String, checkpoint: String,
      topic: String = "kafka_MA_data_aggregated",
      mode: String = "update"): DataStreamWriter[Row] =
    Schemas.toWireJson(result).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(mode)
      .trigger(Trigger.ProcessingTime("1 second"))

  /** Full job wiring, V1/V2 shape: source → parse → window → sink. */
  def run(spark: SparkSession, servers: String, checkpoint: String,
      mode: String = "update"): StreamingQuery = {
    val gate = if (mode == "update") Some(5) else None
    toKafka(windowedSma(parse(fromKafka(spark, servers)), gate = gate),
      servers, checkpoint, mode = mode).start()
  }
}
