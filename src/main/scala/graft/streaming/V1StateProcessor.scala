package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.model.AggregatedData

/** One parsed input record keyed for the V1 processor (event time in
  * epoch micros, already UTC). */
final case class StockTick(
    symbol: String,
    tsMicros: Long,
    `type`: String,
    vwap_price_per_sec: Double,
    size_per_sec: Long,
    real_or_filled: String)

/** Bit-exact replica of the reference's ACTIVE implementation (V1,
  * `faust_app/ma_agg.py:42-91`) on Spark 4's `transformWithState`:
  *
  *  - per-symbol `MapState[event_ts → record]` ≙ the Faust Table of
  *    dicts (`ma_agg.py:42,89-91`); RocksDB/checkpoint-backed where the
  *    reference used a Kafka changelog topic
  *  - a processing-time timer re-registered every `timerIntervalMs`
  *    ≙ `@app.timer(interval=1.0)` (`ma_agg.py:49`) — fires per key,
  *    independent of data arrival, so a complete window re-emits every
  *    second exactly like the reference (duplicate emissions by design)
  *  - on fire: evict entries older than now−5s comparing EVENT time
  *    against PROCESSING-time now (`ma_agg.py:51-55` — the reference's
  *    wall-clock-vs-event-time hybrid, reproduced deliberately), then
  *    emit iff exactly `gateCount` survivors (`ma_agg.py:57`), with
  *    conditional sums, safe division, min/max bounds, and first-member
  *    type (`ma_agg.py:58-76`).
  *
  * Scale notes: state is per-symbol in the partitioned state store; the
  * timer registry is also per-key and distributed. No global scan —
  * unlike the reference's every-second full-table scan (`ma_agg.py:52`),
  * each timer fire touches one key's map only.
  */
/** @param firstTimerDelayMs delay before a key's FIRST fire; subsequent
  *        fires re-arm at `timerIntervalMs`. With an always-armed timer
  *        and micro-batches slower than the interval, the query never
  *        goes idle (exactly like the reference's perpetual 1 s timer);
  *        tests use a short first fire + long re-arm so
  *        `processAllAvailable` can reach quiescence. */
class V1StateProcessor(
    windowMs: Long = 5000L,
    timerIntervalMs: Long = 1000L,
    gateCount: Int = 5,
    firstTimerDelayMs: Long = -1L)
  extends StatefulProcessor[String, StockTick, AggregatedData] {

  private val firstDelay = if (firstTimerDelayMs >= 0) firstTimerDelayMs else timerIntervalMs

  @transient private var windowState: MapState[Long, StockTick] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    windowState = getHandle.getMapState[Long, StockTick](
      "window_table", Encoders.scalaLong, Encoders.product[StockTick], TTLConfig.NONE)
    // timers are registered lazily on first input per key
  }

  override def handleInputRows(key: String, rows: Iterator[StockTick],
      timerValues: TimerValues): Iterator[AggregatedData] = {
    // ingest agent (`ma_agg.py:83-91`): upsert each record at its event time
    rows.foreach(r => windowState.updateValue(r.tsMicros, r))
    // ensure a ticking timer exists for this key (the reference's timer
    // is global; per-key timers are the distributed equivalent)
    if (!getHandle.listTimers().hasNext) {
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs + firstDelay)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[AggregatedData] = {
    val nowMs = timerValues.getCurrentProcessingTimeInMs
    val horizonMicros = (nowMs - windowMs) * 1000L

    // eviction (`ma_agg.py:54-55`): keep ts >= now - 5s, write back
    val entries = windowState.iterator().toVector
    val (keep, evict) = entries.partition(_._1 >= horizonMicros)
    evict.foreach { case (ts, _) => windowState.removeKey(ts) }

    // reclaim dead keys: once eviction empties a symbol's window, drop
    // its state and STOP its timer (the next input re-arms it). The
    // reference scans every symbol ever seen each second
    // (`ma_agg.py:52`); carrying that forward would make a long-running
    // job do O(all-keys-ever) timer work per interval.
    if (keep.isEmpty) {
      windowState.clear()
      return Iterator.empty
    }
    // re-arm: the 1-second cadence continues while the key is live
    getHandle.registerTimer(nowMs + timerIntervalMs)

    // gate (`ma_agg.py:57`) + aggregate recompute (`ma_agg.py:58-76`)
    if (keep.size == gateCount) {
      val vals = keep.sortBy(_._1).map(_._2)
      val nonZero = vals.filter(_.size_per_sec != 0)
      val sumV = nonZero.map(_.vwap_price_per_sec).sum
      val cntV = nonZero.size.toLong
      val real = vals.count(_.real_or_filled == "real").toLong
      val iso = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
      def fmt(micros: Long) = java.time.Instant.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L) * 1000L)
        .atOffset(java.time.ZoneOffset.UTC).format(iso)
      Iterator.single(AggregatedData(
        symbol = key,
        `type` = vals.head.`type`,
        MA_type = "5_MA_data",
        start = fmt(keep.map(_._1).min),
        end = fmt(keep.map(_._1).max),
        current_time = fmt(nowMs * 1000L),
        sma_value = if (cntV > 0) sumV / cntV else 0.0,
        sum_of_vwap = sumV,
        count_of_vwap = cntV,
        window_data_count = keep.size.toLong,
        real_data_count = real,
        filled_data_count = vals.size.toLong - real))
    } else Iterator.empty
  }
}

object V1StateProcessor {
  /** Wire the processor onto a parsed tick stream. */
  def apply(ticks: Dataset[StockTick], windowMs: Long = 5000L,
      timerIntervalMs: Long = 1000L, gateCount: Int = 5,
      firstTimerDelayMs: Long = -1L): Dataset[AggregatedData] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.symbol)
      .transformWithState(
        new V1StateProcessor(windowMs, timerIntervalMs, gateCount, firstTimerDelayMs),
        TimeMode.ProcessingTime(),
        OutputMode.Update())
  }
}
