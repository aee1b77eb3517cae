package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** STREAM-STREAM join — the §2.3 join family's streaming leg, and the
  * one Structured Streaming capability the other suites don't drive: a
  * watermarked interval equi-join of two live streams (the
  * click-attribution shape: every view joined to the clicks that
  * follow it within an hour), running on the RocksDB state store like
  * everything else here. Both sides buffer keyed state bounded by
  * their watermark + the join interval — the planner derives the state
  * eviction bound from the time-range predicate, which is why the
  * interval condition matters at 100 TB: an un-constrained
  * stream-stream join would buffer both streams forever.
  *
  * Checked: (a) the streamed result equals the same interval join run
  * as a BATCH DataFrame join over the same rows — including pairs
  * whose two halves arrived in DIFFERENT micro-batches (the buffered-
  * state case a per-batch join could not produce); (b) rows older than
  * the watermark at arrival are dropped from the join state, pinning
  * the eviction story the scaladoc claims. */
class StreamingJoinSpec extends AnyFunSuite {
  import TestSpark._

  private val enc = Encoders.tuple(Encoders.scalaLong,
    Encoders.STRING, Encoders.scalaDouble)

  private def toDf(s: MemoryStream[(Long, String, Double)], side: String) = {
    val df = s.toDF()
      .withColumnRenamed("_1", s"${side}_user")
      .withColumnRenamed("_2", s"${side}_ts_s")
      .withColumnRenamed("_3", s"${side}_v")
    df.withColumn(s"${side}_ts", to_timestamp(col(s"${side}_ts_s")))
      .drop(s"${side}_ts_s")
  }

  test("stream-stream interval join equals the batch join, across micro-batches") {
    val views = MemoryStream[(Long, String, Double)](enc, spark)
    val clicks = MemoryStream[(Long, String, Double)](enc, spark)
    val v = toDf(views, "v").withWatermark("v_ts", "2 hours")
    val c = toDf(clicks, "c").withWatermark("c_ts", "2 hours")
    val joined = v.join(c,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("interval 1 hour"))
      .select(col("v_user"), col("v_ts"), col("c_ts"), col("v_v"), col("c_v"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      // batch 1: views for users 1,2 and a click for user 1 in-window
      views.addData(Seq((1L, "2024-01-01 10:00:00", 1.0),
        (2L, "2024-01-01 10:05:00", 2.0)))
      clicks.addData(Seq((1L, "2024-01-01 10:30:00", 10.0)))
      q.processAllAvailable()
      // batch 2: the CROSS-BATCH half — user 2's click arrives a batch
      // after its view (buffered view state must produce the pair), a
      // click outside the 1h window (no pair), a click for an unknown
      // user (no pair)
      clicks.addData(Seq((2L, "2024-01-01 10:50:00", 20.0),
        (1L, "2024-01-01 11:30:00", 30.0),
        (9L, "2024-01-01 10:10:00", 90.0)))
      q.processAllAvailable()
      val streamed = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getDouble(3), r.getDouble(4))).toSet
      // batch twin over the same rows
      val allViews = Seq((1L, "2024-01-01 10:00:00", 1.0),
        (2L, "2024-01-01 10:05:00", 2.0))
      val allClicks = Seq((1L, "2024-01-01 10:30:00", 10.0),
        (2L, "2024-01-01 10:50:00", 20.0),
        (1L, "2024-01-01 11:30:00", 30.0),
        (9L, "2024-01-01 10:10:00", 90.0))
      import spark.implicits._
      val bv = allViews.toDF("v_user", "v_ts_s", "v_v")
        .withColumn("v_ts", to_timestamp(col("v_ts_s"))).drop("v_ts_s")
      val bc = allClicks.toDF("c_user", "c_ts_s", "c_v")
        .withColumn("c_ts", to_timestamp(col("c_ts_s"))).drop("c_ts_s")
      val batch = bv.join(bc,
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("interval 1 hour"))
        .select(col("v_user"), col("v_ts"), col("c_ts"), col("v_v"), col("c_v"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getDouble(3), r.getDouble(4))).toSet
      assert(batch.size == 2, s"batch twin should pair both views once: $batch")
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
    } finally q.stop()
  }

  test("stream-stream join state is watermark-bounded: too-late rows join nothing") {
    val views = MemoryStream[(Long, String, Double)](enc, spark)
    val clicks = MemoryStream[(Long, String, Double)](enc, spark)
    val v = toDf(views, "v").withWatermark("v_ts", "10 minutes")
    val c = toDf(clicks, "c").withWatermark("c_ts", "10 minutes")
    val joined = v.join(c,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("interval 1 hour"))
      .select(col("v_user"))
    val q = joined.writeStream.format("memory").queryName("ss_late")
      .outputMode("append").start()
    try {
      // advance both watermarks far past 10:00
      views.addData(Seq((1L, "2024-01-01 10:00:00", 1.0),
        (1L, "2024-01-01 18:00:00", 1.0)))
      clicks.addData(Seq((1L, "2024-01-01 18:00:01", 1.0)))
      q.processAllAvailable()
      val before = spark.table("ss_late").count()
      // a click at 10:05 is hours behind the ~17:50 watermark: the
      // matching 10:00 view's buffered state is long evicted and the
      // row itself is too late — no new pair may appear
      clicks.addData(Seq((1L, "2024-01-01 10:05:00", 99.0)))
      q.processAllAvailable()
      val after = spark.table("ss_late").count()
      assert(after == before,
        s"late click must not join against evicted state ($before -> $after)")
    } finally q.stop()
  }
}
