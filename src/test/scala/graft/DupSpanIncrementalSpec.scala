package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Semantics of dd8 (duplicated-span detection) and dd9 (incremental
  * new-batch-vs-corpus dedup) on hand-built corpora where the expected
  * answer is derivable by hand — the oracle proves engine agreement on
  * the driver tables; these pin the MEANING of the numbers.
  */
class DupSpanIncrementalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Write a minimal documents table (driver schema) to a temp dir. */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("dd_spec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd8: exact copies, within-doc repeats, and a shared 8-gram cover exactly the right tokens") {
    // SPAN_K = 8. Docs 1/2 are exact copies (every 8-gram occurs twice
    // across them -> fully covered). Doc 3 is unique. Doc 4 repeats its
    // first 8 words once (the single duplicated 8-gram covers ALL 16
    // positions). Doc 5 shares exactly one 8-gram with docs 1/2 at
    // position 2 (covers tokens 2..9 of its 12).
    val dir = writeDocs(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j",
      3L -> "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9",
      4L -> "m n o p q r s t m n o p q r s t",
      5L -> "x1 x2 a b c d e f g h y1 y2"))
    val got = Dedup.dd8DupSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Number](1).longValue, r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((10L, 10L, 1.0)))
    assert(got(2L) == ((10L, 10L, 1.0)))
    assert(got(3L) == ((10L, 0L, 0.0)))
    assert(got(4L) == ((16L, 16L, 1.0)))
    // floor(8e6/12)/1e6 — the Exact.intRatio truncation
    assert(got(5L) == ((12L, 8L, 0.666666)))
  }

  test("dd10: trims exactly dd8's covered tokens and reassembles the survivors in order") {
    val dir = writeDocs(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j",
      3L -> "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9",
      5L -> "x1 x2 a b c d e f g h y1 y2"))
    val trim = Dedup.dd10SpanTrim(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Number](1).longValue, r.getLong(2), r.getString(3)))).toMap
    // docs 1/2: fully covered -> everything cut
    assert(trim(1L) == ((10L, 0L, "")))
    assert(trim(2L) == ((10L, 0L, "")))
    // doc 3: unique -> untouched
    assert(trim(3L) == ((10L, 10L, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9")))
    // doc 5: tokens 2..9 (the shared 8-gram) cut; flanks survive in order
    assert(trim(5L) == ((12L, 4L, "x1 x2 y1 y2")))
    // complement law on the real corpus: kept = n_tokens - dd8.dup_tokens
    val sfDir = sf
    val dup = Dedup.dd8DupSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    Dedup.dd10SpanTrim(spark, sfDir).collect().foreach { r =>
      val (id, n, kept) = (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2))
      assert(kept == n - dup(id), s"doc $id: kept $kept != $n - ${dup(id)}")
    }
  }

  test("dd9: exact copy, near-dup, fresh doc, and new-vs-new dup classify correctly") {
    val base = ('a' to 'z').map(c => s"w$c").mkString(" ") // 26 distinct words
    val nearA = base.replace("wm", "XX") // one word changed: jaccard >> 0.5
    val other = (1 to 26).map(i => s"v$i").mkString(" ")
    val otherNear = other.replace("v13", "YY")
    val dir = writeDocs(Seq(
      2L -> base, // existing corpus (even ids)
      4L -> "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10",
      1L -> base, // new batch (odd ids): exact copy of doc 2
      3L -> nearA, // near-dup of doc 2
      5L -> other, // fresh content -> kept
      7L -> otherNear)) // near-dup of doc 5 — NEW vs NEW, not flagged
    val got = Dedup.dd9Incremental(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 3L, 5L, 7L), "output is the new batch only")
    assert(got(1L)._1 == 1L, "exact copy flagged dropped_exact")
    assert(got(1L)._3 == 0L, "exact copy not kept")
    assert(got(3L) == ((0L, 1L, 0L)), "near-dup flagged dropped_near only")
    assert(got(5L) == ((0L, 0L, 1L)), "fresh doc kept")
    assert(got(7L) == ((0L, 0L, 1L)),
      "new-vs-new near-dup is NOT dd9's job (the batch self-dedup is dd1/dd2)")
  }
}
