package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SessionStream

/** Streaming session windows (SessionStream) — the live leg of batch
  * ws1, driven the only way Structured Streaming can be locally (no
  * broker): MemoryStream micro-batches.
  *
  * Checked: (a) CROSS-BATCH MERGE — a user's events arriving in
  * different micro-batches with < gap spacing land in ONE session row
  * identical to the batch twin run over the same rows (the shared
  * aggregation body makes drift impossible, but the merge itself is
  * pure streaming machinery); (b) APPEND-MODE CLOSE — a session is
  * emitted only once the watermark passes its end, and an event older
  * than the watermark is dropped instead of reopening it. */
class StreamingSessionSpec extends AnyFunSuite {
  import TestSpark._

  private val enc = Encoders.tuple(Encoders.scalaLong,
    Encoders.STRING, Encoders.scalaDouble)

  private def toEvents(s: MemoryStream[(Long, String, Double)]) =
    s.toDF()
      .withColumnRenamed("_1", "user_id")
      .withColumnRenamed("_3", "value")
      .withColumn("ts", to_timestamp(col("_2"))).drop("_2")

  private def rowSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getDouble(4))).toSet

  test("streaming sessions merge across micro-batches and equal the batch twin") {
    val src = MemoryStream[(Long, String, Double)](enc, spark)
    val q = SessionStream.sessions(toEvents(src))
      .writeStream.format("memory").queryName("sess_complete")
      .outputMode("complete").start()
    val b1 = Seq((1L, "2024-01-01 10:00:00", 1.5),
      (1L, "2024-01-01 10:30:00", 2.25),
      (2L, "2024-01-01 09:00:00", 4.0))
    // user 1's 11:45 bridges into the open session from ANOTHER batch
    // (1h15 < 2h gap); user 2's 13:00 is 4h out -> a second session
    val b2 = Seq((1L, "2024-01-01 11:45:00", 0.5),
      (2L, "2024-01-01 13:00:00", 8.0))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
      val streamed = rowSet(spark.table("sess_complete").collect())
      import spark.implicits._
      val batch = graft.ops.Extended.sessionAgg(
        (b1 ++ b2).toDF("user_id", "ts_s", "value")
          .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s"))
      assert(streamed == rowSet(batch.collect()))
      // the merge really happened: user 1 has ONE session spanning both
      // batches with all three events
      val u1 = streamed.filter(_._1 == 1L)
      assert(u1 == Set((1L, "2024-01-01 10:00:00.000000",
        "2024-01-01 11:45:00.000000", 3L, 4.25)))
    } finally q.stop()
  }

  test("append mode emits a session only at watermark close; late rows are dropped") {
    val src = MemoryStream[(Long, String, Double)](enc, spark)
    val q = SessionStream.sessionsWithWatermark(toEvents(src),
      gap = "2 hours", delay = "1 hour")
      .writeStream.format("memory").queryName("sess_append")
      .outputMode("append").start()
    try {
      // user 5's session: [10:00, 10:30], window end 12:30
      src.addData(Seq((5L, "2024-01-01 10:00:00", 1.0),
        (5L, "2024-01-01 10:30:00", 2.0)))
      q.processAllAvailable()
      assert(spark.table("sess_append").isEmpty,
        "no session may emit before the watermark passes its end")
      // 14:00 moves the watermark to 13:00 (> 12:30) for the NEXT
      // batch; 14:05 triggers that batch -> user 5's session closes
      src.addData(Seq((6L, "2024-01-01 14:00:00", 0.0)))
      q.processAllAvailable()
      src.addData(Seq((6L, "2024-01-01 14:05:00", 0.0)))
      q.processAllAvailable()
      val closed = rowSet(spark.table("sess_append").collect())
      assert(closed == Set((5L, "2024-01-01 10:00:00.000000",
        "2024-01-01 10:30:00.000000", 2L, 3.0)))
      // a row far behind the watermark is DROPPED, not a reopened or
      // new user-5 session (user 7 keeps the query progressing)
      src.addData(Seq((5L, "2024-01-01 09:00:00", 99.0),
        (7L, "2024-01-01 14:10:00", 0.0)))
      q.processAllAvailable()
      assert(rowSet(spark.table("sess_append").collect()) == closed,
        "late event must not add or change closed sessions")
    } finally q.stop()
  }
}
