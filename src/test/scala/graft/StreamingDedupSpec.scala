package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DedupStream

/** The incremental dedup index must agree EXACTLY with batch dd2: same
  * RkLsh arithmetic, same banding, same threshold — so feeding the
  * corpus through the stream (split across micro-batches, so pairs
  * form both within and across batches) and deduping the at-least-once
  * emissions yields the identical (da, db, est_jaccard) set. */
class StreamingDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("streaming near-dup index equals batch dd2 on the same corpus") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING), spark)
    val stream = DedupStream.nearDupPairs(
      input.toDF().withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text"))
    val q = stream.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // two micro-batches: cross-batch pairs exercise persisted state
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()

      val streamed = spark.table("dedup_stream")
        .select("da", "db", "est_jaccard").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.ops.Dedup.dd2MinHashLsh(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
      assert(streamed.nonEmpty, "corpus has planted near-dups")
    } finally q.stop()
  }

  test("index state survives a checkpointed restart (cross-restart pairs still found)") {
    // memory sinks don't support recovery; file source -> parquet sink
    // (both recoverable), the same shape as StreamingSpec's S4 test
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)
    val base = java.nio.file.Files.createTempDirectory("dedup_ckpt").toFile
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckptDir = new java.io.File(base, "ckpt").getAbsolutePath

    def jsonl(rows: Seq[(Long, String)]): String = rows.map { case (id, tx) =>
      s"""{"doc_id":$id,"text":"$tx"}""" // corpus text is [a-z ]: no escaping needed
    }.mkString("\n")
    def start() = {
      val src = spark.readStream
        .schema("doc_id LONG, text STRING")
        .json(srcDir.getAbsolutePath)
      DedupStream.nearDupPairs(src)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }

    java.nio.file.Files.write(new java.io.File(srcDir, "f1.json").toPath,
      jsonl(first).getBytes)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    // NEW query instance, same checkpoint: bucket members from run 1
    // must be restored so cross-restart near-dup pairs are still found
    java.nio.file.Files.write(new java.io.File(srcDir, "f2.json").toPath,
      jsonl(second).getBytes)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val streamed = spark.read.parquet(outDir)
      .select("da", "db", "est_jaccard").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.ops.Dedup.dd2MinHashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"post-restart stream diverged — stream-only: ${streamed -- batch}; " +
        s"batch-only: ${batch -- streamed}")
    val crossRestart = batch.exists { case (da, db, _) =>
      first.exists(_._1 == da) && second.exists(_._1 == db) ||
        first.exists(_._1 == db) && second.exists(_._1 == da)
    }
    assert(crossRestart, "corpus must contain at least one cross-restart pair " +
      "for this test to prove state recovery")
  }

  test("TTL evicts a cold bucket past the horizon; the bucket re-creates cleanly") {
    // ttlMs bounds index state on an unbounded stream: a bucket that
    // sees no arrivals for the TTL is dropped wholesale — near-dups
    // that STRADDLE the horizon are (by design) no longer reported,
    // and the bucket rebuilds from scratch on its next arrival.
    //
    // ProcessingTimeTimeout makes the engine re-run batches to fire
    // timers (shouldRunAnotherBatch), so a TTL'd query needs a REAL
    // trigger interval (an untriggered one busy-loops empty batches
    // and processAllAvailable never settles) — hence trigger + polling
    // here instead of processAllAvailable.
    val ttlMs = 8000L
    val textA = "the quick brown fox jumps over the lazy dog today"
    val textX = "completely unrelated words about spark shuffles and parquet row groups"
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING), spark)
    val stream = DedupStream.nearDupPairs(
      input.toDF().withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text"),
      ttlMs = ttlMs)
    val q = stream.writeStream.format("memory").queryName("dedup_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .outputMode("append").start()
    def pollUntil(what: String, deadlineMs: Long = 60000L)(cond: => Boolean): Unit = {
      val t0 = System.currentTimeMillis()
      while (!cond) {
        assert(System.currentTimeMillis() - t0 < deadlineMs, s"timed out waiting: $what")
        Thread.sleep(100)
      }
    }
    def rowsIn: Long = q.recentProgress.map(_.numInputRows).sum
    try {
      input.addData(Seq(1L -> textA)) // doc 1 populates its band buckets
      pollUntil("doc 1 ingested")(rowsIn >= 1)
      Thread.sleep(ttlMs + 2000) // doc 1's buckets go cold past the TTL
      // the continuously-running trigger has fired the timeout sweep by
      // now; an unrelated doc keeps the stream demonstrably live
      input.addData(Seq(50L -> textX))
      pollUntil("doc 50 ingested")(rowsIn >= 2)
      // doc 2 = same text as doc 1: if the bucket had survived, this
      // would emit (1,2); an evicted bucket re-creates with doc 2 alone
      input.addData(Seq(2L -> textA))
      pollUntil("doc 2 ingested")(rowsIn >= 3)
      // doc 3 arrives INSIDE doc 2's TTL: the re-created bucket works
      input.addData(Seq(3L -> textA))
      pollUntil("pair (2,3) emitted") {
        spark.table("dedup_ttl").filter("da = 2 AND db = 3").count() > 0
      }
      val pairs = spark.table("dedup_ttl").select("da", "db").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.exists(p => p._1 == 1L || p._2 == 1L),
        s"evicted doc 1 still pairing: $pairs")
      assert(pairs == Set(2L -> 3L),
        s"re-created bucket must pair docs 2 and 3: $pairs")
    } finally q.stop()
  }

  test("re-arrival of a known doc_id emits nothing new (idempotent index)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect().toSeq.take(20)

    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING), spark)
    val stream = DedupStream.nearDupPairs(
      input.toDF().withColumnRenamed("_1", "doc_id").withColumnRenamed("_2", "text"))
    val q = stream.writeStream.format("memory").queryName("dedup_replay")
      .outputMode("append").start()
    try {
      input.addData(docs)
      q.processAllAvailable()
      val before = spark.table("dedup_replay").count()
      input.addData(docs) // exact replay: every bucket already has these ids
      q.processAllAvailable()
      val after = spark.table("dedup_replay").count()
      assert(before == after, "replayed documents must not re-emit pairs")
    } finally q.stop()
  }
}
