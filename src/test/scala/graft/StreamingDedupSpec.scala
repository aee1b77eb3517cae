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
