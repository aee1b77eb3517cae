package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps
import graft.streaming.TokenizeStream

/** Streaming BPE encode (TokenizeStream) — tok4's live leg under the
  * offline-trained merge model, driven by MemoryStream micro-batches.
  *
  * Checked: (a) STREAMING ≡ BATCH — every sf0.001 document encoded on
  * ingest (split across two micro-batches) produces exactly batch
  * tok4's (doc_id, n_words, n_bpe_tokens, sub_fold) rows, proving the
  * per-word merge fold reproduces the vocab-join counts word for word;
  * (b) STATELESS PLAN — the streaming plan contains no shuffle
  * exchange and no stateful operator: encode-on-ingest must stay a
  * scan-bound narrow map, the whole point of shipping the merges in
  * the closure instead of joining a vocab table; (c) OOV TOTALITY —
  * words the training corpus never saw still encode (count = fold
  * result, not a dropped row), which the batch inner-join form cannot
  * do and a live stream needs. */
class StreamingTokenizeSpec extends AnyFunSuite {
  import TestSpark._

  private val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

  test("streaming encode equals batch tok4 on the training corpus") {
    val merges = TextOps.bpeMerges(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val src = MemoryStream[(Long, String)](enc, spark)
    val in = src.toDF().withColumnRenamed("_1", "doc_id")
      .withColumnRenamed("_2", "text")
    val q = TokenizeStream.encoded(in, merges)
      .writeStream.format("memory").queryName("tok_stream")
      .outputMode("append").start()
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
      val streamed = spark.table("tok_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = TextOps.tok4BpeEncode(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      graft.ops.Model.release()
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("the plan is stateless and shuffle-free") {
    val merges = TextOps.bpeMerges(spark, sf)
    // streaming side: a stateless narrow map registers no state
    // operators in the progress
    val src = MemoryStream[(Long, String)](enc, spark)
    val in = src.toDF().withColumnRenamed("_1", "doc_id")
      .withColumnRenamed("_2", "text")
    val q = TokenizeStream.encoded(in, merges)
      .writeStream.format("memory").queryName("tok_plan")
      .outputMode("append").start()
    try {
      src.addData(Seq((1L, "hello world"))); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected a stateless plan, got ${q.lastProgress.stateOperators.length} state operators")
    } finally q.stop()
    // operator-tree side: encoded() is the same projection on a batch
    // frame, whose executed plan must be scan -> project, no Exchange
    val batchPlan = TokenizeStream
      .encoded(graft.Tables.documents(spark, sf).select("doc_id", "text"), merges)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!batchPlan.contains("Exchange"), s"unexpected shuffle in:\n$batchPlan")
  }

  test("out-of-vocabulary words still encode") {
    val merges = TextOps.bpeMerges(spark, sf)
    import spark.implicits._
    val oov = Seq((99L, "zzzqqq xyzzy")).toDF("doc_id", "text")
    val out = TokenizeStream.encoded(oov, merges).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // two words
    assert(r.getLong(2) >= 2L) // every word yields >= 1 subtoken
  }
}
