package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Pipeline}

/** Properties of dd11 (content-defined chunking dedup) and dc4
  * (Bloom-filter decontamination) the DuckDB oracle can't state: the
  * SHIFT-RESILIENCE that motivates CDC over a fixed grid, Bloom's
  * no-false-negative guarantee vs dc1, and dc4's zero-shuffle scan
  * shape. */
class CdcBloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cdc_spec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // deterministic 200-word pseudo-text over a 101-word lexicon
  private val baseWords: Seq[String] =
    (0 until 200).map(i => s"w${(i * 37 + 11) % 101}")

  test("dd11: content-defined chunks survive a one-word insertion; a fixed grid does not") {
    val a = baseWords.mkString(" ")
    // B = A with one word inserted at position 3 — the edit that shifts
    // every later word one slot to the right
    val b = (baseWords.take(3) ++ Seq("INSERTED") ++ baseWords.drop(3)).mkString(" ")
    val c = (0 until 60).map(i => s"u$i").mkString(" ") // unique control
    val dir = writeDocs(Seq(1L -> a, 2L -> b, 3L -> c))
    val got = Dedup.dd11CdcChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // CDC: every chunk after the edit's enclosing chunk re-anchors at
    // the same words, so most of A's chunks reappear verbatim in B
    assert(got(1L)._3 >= 0.5, s"CDC dup_ratio for the original: ${got(1L)}")
    assert(got(2L)._3 >= 0.5, s"CDC dup_ratio for the shifted copy: ${got(2L)}")
    assert(got(3L)._3 == 0.0, s"unique control must share nothing: ${got(3L)}")
    // the fixed-grid contrast, computed directly: non-overlapping
    // 8-word chunks of A and B share (almost) nothing after the shift
    def grid(ws: Seq[String]) = ws.grouped(8).map(_.mkString(" ")).toSet
    val sharedGrid = (grid(baseWords) intersect
      grid(baseWords.take(3) ++ Seq("INSERTED") ++ baseWords.drop(3))).size
    val gridRatio = sharedGrid.toDouble / grid(baseWords).size
    assert(gridRatio <= 0.2, s"fixed grid unexpectedly survived the shift: $gridRatio")
    assert(got(1L)._3 > gridRatio + 0.3,
      s"CDC (${got(1L)._3}) must beat the fixed grid ($gridRatio) by a wide margin")
  }

  test("dd11: exact copies are fully covered — dup_ratio 1.0 on both") {
    val a = baseWords.mkString(" ")
    val dir = writeDocs(Seq(1L -> a, 2L -> a,
      3L -> (0 until 40).map(i => s"v$i").mkString(" ")))
    val got = Dedup.dd11CdcChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0, s"exact copies: $got")
    assert(got(3L) == 0.0)
  }

  test("dc4: no false negatives — every dc1-flagged document is dc4-flagged") {
    // Bloom's one guarantee: membership tests never miss. A document
    // dc1 flags shares >= OVERLAP shingles with ONE bench doc; those
    // shingles are all in the sketch, so dc4's union count is at least
    // as large and the doc must be flagged.
    val dc1Docs = Pipeline.dc1Decontaminate(spark, sf)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    val dc4Docs = Pipeline.dc4BloomDecontaminate(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(dc1Docs.nonEmpty, "fixture should trip dc1")
    assert(dc1Docs.subsetOf(dc4Docs),
      s"dc1 flagged ${dc1Docs -- dc4Docs} that dc4 missed — impossible for a Bloom filter")
  }

  test("dc4: n_hits ≥ true shared shingles everywhere; measured FP excess ≤ 1%") {
    // the scaladoc's FP-rate claim, measured: per doc, the bloom count
    // can only exceed the TRUE number of distinct shingles shared with
    // the bench union set (no false negatives), and the total excess
    // across the corpus stays under 1% of the true mass at the
    // documented geometry
    val sh = Tables.documents(spark, sf).select(col("doc_id"),
      explode(call_function("rk_shingle_hashes", split(col("text"), " "), lit(3))).as("s"))
    val benchSet = sh.filter(col("doc_id") < Pipeline.BENCH_DOCS).select(col("s")).distinct()
    val truth = sh.filter(col("doc_id") >= Pipeline.BENCH_DOCS)
      .join(benchSet, "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Pipeline.dc4BloomDecontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var excess = 0L; var trueMass = 0L
    got.foreach { case (id, hits) =>
      val t = truth.getOrElse(id, 0L)
      assert(hits >= t, s"doc $id: bloom $hits < true $t — impossible")
      excess += hits - t; trueMass += t
    }
    assert(trueMass > 0)
    assert(excess.toDouble / trueMass <= 0.01,
      s"FP excess $excess over true mass $trueMass breaks the 1% claim")
  }

  test("dc4: the corpus scan is join-free and shuffle-free") {
    val df = Pipeline.dc4BloomDecontaminate(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("Join"), s"dc4 corpus side must not join:\n$p")
    assert(!p.contains("Exchange"), s"dc4 corpus side must not shuffle:\n$p")
  }
}
