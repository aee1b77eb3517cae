package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.EventRow

/** The streaming anomaly leg judges each event against its user's
  * stats-so-far. Verified three ways: an independent BigInt prefix
  * replay must match every verdict; the running state after the full
  * stream must equal batch an1's per-user population (n_so_far of the
  * last event = an1's n_events — the transitive tie to the DuckDB
  * oracle); and state must survive a checkpointed restart. */
class AnomalyStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val enc = Encoders.product[EventRow]

  private def corpus(): Seq[EventRow] =
    Tables.events(spark, sf)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => EventRow(r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_.event_id)

  /** Independent replay: per user in event_id order, running (n,S,Q)
    * in BigInt, the an1 square-out test. */
  private def replay(evs: Seq[EventRow]): Map[Long, (Long, Boolean)] = {
    val st = scala.collection.mutable.Map
      .empty[Long, (Long, BigInt, BigInt)].withDefaultValue((0L, BigInt(0), BigInt(0)))
    evs.sortBy(_.event_id).map { e =>
      val (n0, s0, q0) = st(e.user_id)
      val (n, s, q) = (n0 + 1, s0 + e.c, q0 + BigInt(e.c) * e.c)
      st(e.user_id) = (n, s, q)
      val d = BigInt(e.c) * n - s
      e.event_id -> ((n, d * d > 4 * (n * q - s * s)))
    }.toMap
  }

  test("streaming verdicts match the BigInt prefix replay; final n equals batch an1") {
    val evs = corpus()
    val expect = replay(evs)
    val input = MemoryStream[EventRow](enc, spark)
    val q = AnomalyStream.verdicts(input.toDF())
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val got = spark.table("anom_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      assert(got.size == evs.size)
      assert(got == expect, {
        val bad = got.collect { case (id, v) if expect(id) != v => (id, v, expect(id)) }
        s"first mismatches: ${bad.take(5)}"
      })
      assert(got.values.exists(_._2), "fixture should stream some anomalies")
      // transitive oracle tie: last-event n_so_far per user == batch n_events
      val lastN = spark.table("anom_stream")
        .groupBy(col("user_id")).agg(max(col("n_so_far")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchN = graft.ops.Extended.an1ZscoreAnomaly(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lastN == batchN, "running state diverged from batch an1's population")
    } finally q.stop()
  }

  test("running (n,S,Q) state survives a checkpointed restart") {
    val evs = corpus()
    val expect = replay(evs)
    val (first, second) = evs.splitAt(evs.length / 2)
    val base = java.nio.file.Files.createTempDirectory("anom_ckpt").toFile
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckptDir = new java.io.File(base, "ckpt").getAbsolutePath
    def jsonl(rows: Seq[EventRow]): String =
      rows.map(r => s"""{"event_id":${r.event_id},"user_id":${r.user_id},"c":${r.c}}""")
        .mkString("\n")
    def start() = {
      val src = spark.readStream
        .schema("event_id LONG, user_id LONG, c LONG")
        .json(srcDir.getAbsolutePath)
      AnomalyStream.verdicts(src)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }
    val q1 = start()
    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "a.json").toPath, jsonl(first))
    q1.processAllAvailable(); q1.stop()
    val q2 = start()
    java.nio.file.Files.writeString(
      new java.io.File(srcDir, "b.json").toPath, jsonl(second))
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("event_id"),
        (r.getAs[Long]("n_so_far"), r.getAs[Boolean]("anom")))).toMap
    assert(got.size == evs.size, s"lost rows across restart: ${got.size}/${evs.size}")
    assert(got == expect, "verdicts diverged across the restart")
  }
}
