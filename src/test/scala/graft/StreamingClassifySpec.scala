package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity
import graft.streaming.ClassifyStream

/** Streaming nearest-centroid labeling (ClassifyStream) — cls1's live
  * leg under the offline-trained centroid model, driven by MemoryStream
  * micro-batches.
  *
  * Checked: (a) STREAMING ≡ BATCH — every sf0.001 embedding classified
  * on ingest (split across two micro-batches) produces exactly batch
  * cls1's (vec_id, label, pred_label, max_cos, correct) rows, so the
  * leg is transitively DuckDB-verified through cls1's oracle;
  * (b) STATELESS PLAN — no state operators and no shuffle exchange:
  * classify-on-ingest must stay a scan-bound narrow map, the whole
  * point of shipping the centroids as plan literals instead of joining
  * a centroid table. */
class StreamingClassifySpec extends AnyFunSuite {
  import TestSpark._

  private def corpus() = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))

  test("streaming classify equals batch cls1 on the corpus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = Similarity.cls1Train(spark, sf)
    val rows = corpus().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Int, Seq[Double])]
    val in = src.toDF().select(col("_1").as("vec_id"), col("_2").as("label"),
      col("_3").as("v"))
    val q = ClassifyStream.classified(in, model)
      .writeStream.format("memory").queryName("cls_stream")
      .outputMode("append").start()
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
      val streamed = spark.table("cls_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
          r.getBoolean(4))).toSet
      val batch = Similarity.cls1CentroidClassify(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
          r.getBoolean(4))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("the plan is stateless and shuffle-free") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = Similarity.cls1Train(spark, sf)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Int, Seq[Double])]
    val in = src.toDF().select(col("_1").as("vec_id"), col("_2").as("label"),
      col("_3").as("v"))
    val q = ClassifyStream.classified(in, model)
      .writeStream.format("memory").queryName("cls_plan")
      .outputMode("append").start()
    try {
      src.addData(Seq((1L, 0, Seq.fill(64)(0.1)))); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected a stateless plan, got ${q.lastProgress.stateOperators.length} state operators")
    } finally q.stop()
    val batchPlan = ClassifyStream.classified(
      Tables.embeddings(spark, sf).select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")), model)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!batchPlan.contains("Exchange"), s"unexpected shuffle in:\n$batchPlan")
  }
}
