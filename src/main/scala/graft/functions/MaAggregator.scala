package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input slice of one per-second record (the aggregation-relevant fields
  * of StockData, `ma_agg.py:6-20`). */
final case class MaIn(value: Double, size: Long, flag: String)

/** Running buffer — the mutable aggregation state of the reference's
  * windowed table record (`ma_agg.py:137-143`: the zero record;
  * `ma_agg.py:179-182`: the running sums). */
final case class MaBuf(
    sum_of_value: Double,
    count_of_value: Long,
    real_count: Long,
    filled_count: Long,
    n: Long)

/** Finished aggregate (AggregatedData's numeric slice, `ma_agg.py:22-34`). */
final case class MaOut(
    sum_of_value: Double,
    count_of_value: Long,
    sma_value: Double,
    real_count: Long,
    filled_count: Long,
    n: Long)

/** The reference's aggregation protocol as a typed Spark Aggregator —
  * usable from Dataset code, and registrable as a SQL UDAF via
  * `functions.udaf(new MaAggregator)`.
  *
  *  - zero    ≙ the windowed table's default record (`ma_agg.py:137-143`)
  *  - reduce  ≙ the incremental per-event fold (`ma_agg.py:158-199`):
  *              zero-volume rows excluded from sum/count
  *              (`ma_agg.py:158-159`), real/filled flag tallies
  *              (`ma_agg.py:175-176`)
  *  - merge   ≙ the field-wise additive partial→final combine
  *              (`ma_agg.py:284-300`) — Spark calls this between
  *              map-side partial buffers and the final reducer, which is
  *              exactly the two-phase protocol V3 hand-rolls
  *  - finish  ≙ SMA recomputed from merged sums with the safe division
  *              (`ma_agg.py:70,286`: 0.0, never NULL)
  */
class MaAggregator extends Aggregator[MaIn, MaBuf, MaOut] {
  override def zero: MaBuf = MaBuf(0.0, 0L, 0L, 0L, 0L)

  override def reduce(b: MaBuf, x: MaIn): MaBuf = MaBuf(
    sum_of_value = if (x.size != 0) b.sum_of_value + x.value else b.sum_of_value,
    count_of_value = if (x.size != 0) b.count_of_value + 1 else b.count_of_value,
    real_count = if (x.flag == "real") b.real_count + 1 else b.real_count,
    filled_count = if (x.flag != "real") b.filled_count + 1 else b.filled_count,
    n = b.n + 1)

  override def merge(a: MaBuf, b: MaBuf): MaBuf = MaBuf(
    a.sum_of_value + b.sum_of_value,
    a.count_of_value + b.count_of_value,
    a.real_count + b.real_count,
    a.filled_count + b.filled_count,
    a.n + b.n)

  override def finish(b: MaBuf): MaOut = MaOut(
    b.sum_of_value, b.count_of_value,
    if (b.count_of_value > 0) b.sum_of_value / b.count_of_value else 0.0,
    b.real_count, b.filled_count, b.n)

  override def bufferEncoder: Encoder[MaBuf] = Encoders.product[MaBuf]
  override def outputEncoder: Encoder[MaOut] = Encoders.product[MaOut]
}
