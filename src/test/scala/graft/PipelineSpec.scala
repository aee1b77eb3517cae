package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Pipeline

/** Properties of the corpus-curation operators that the DuckDB oracle
  * can't express: the content-stability contract of hash splits and
  * the broadcast shape of decontamination. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("smp1: split assignment is a pure function of content") {
    // identical text ⇒ identical bucket/split, whatever the doc_id —
    // the property that keeps held-out sets leak-free when a pipeline
    // re-ingests or re-shards a corpus
    val out = Pipeline.smp1HashSample(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .groupBy(col("text"))
      .agg(countDistinct(col("split")).as("n_splits"),
        countDistinct(col("bucket")).as("n_buckets"))
      .filter(col("n_splits") > 1 || col("n_buckets") > 1)
    assert(out.count() == 0, "same text must never land in two splits")
  }

  test("smp1: sampling decision survives repartitioning") {
    val a = Pipeline.smp1HashSample(spark, sf).collect().map(_.toString).sorted.toSeq
    val b = Pipeline.smp1HashSample(spark, sf.replace(sf, sf)) // same dir
      .repartition(7).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("dc1: benchmark side broadcasts — the corpus side never shuffles for the join") {
    val df = Pipeline.dc1Decontaminate(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), p)
    assert(df.count() > 0, "planted near-dups should trip the overlap flag")
  }

  test("pk1: bins respect the running token budget semantics") {
    val rows = Pipeline.pk1PackSequences(spark, sf)
      .orderBy(col("doc_id")).collect()
    var prev = 0L
    rows.foreach { r =>
      val (n, cum, bin) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cum == prev + n, s"prefix sum broken at ${r.getLong(0)}")
      assert(bin == (cum - 1) / 512, s"bin formula broken at ${r.getLong(0)}")
      prev = cum
    }
    assert(rows.nonEmpty)
  }
}
