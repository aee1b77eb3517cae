package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Pipeline, Similarity}

/** The training-data mining trio added in round 13's second session:
  * cls1 (nearest-centroid weak labeling), hn1/hn2 (contrastive
  * hard-negative mining, exact + IVF-PQ tiers), dsir1 (hashed-ngram
  * importance selection). Value correctness is the DuckDB oracle's job;
  * THIS spec pins each operator against an INDEPENDENT plain-Scala
  * reimplementation (so a Spark-side and oracle-side twin bug cannot
  * hide), the tier relationship hn2≈hn1, and the plan shapes the
  * scaladocs promise (literal-matrix scoring = no Exchange; the dsir1
  * weight table broadcasts). */
class MiningSpec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  // ---- shared plain-Scala embedding machinery (DoubleDot's exact
  // left-to-right order throughout) ----
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def floorE6(x: Double): Double = math.floor(x * 1000000L) / 1e6

  private lazy val embs: Array[(Long, Int, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)

  test("cls1: predictions match an independent nearest-centroid recompute") {
    val quant = embs.map { case (id, lab, v) =>
      val nrm = math.sqrt(dot(v, v))
      (id, lab, v.map(x => math.floor(x / nrm * 512)))
    }
    val sums = quant.groupBy(_._2).map { case (lab, rows) =>
      val s = new Array[Double](64)
      rows.foreach { case (_, _, uq) =>
        var i = 0; while (i < 64) { s(i) += uq(i); i += 1 } }
      lab -> s
    }
    val labels = sums.keys.toArray.sorted
    val expected = quant.map { case (id, lab, uq) =>
      val unrm = math.sqrt(dot(uq, uq))
      val cs = labels.map { l =>
        val c = sums(l); floorE6(dot(uq, c) / (unrm * math.sqrt(dot(c, c))))
      }
      val best = cs.max
      (id, labels(cs.indexOf(best)), best) // first max = smallest label
    }.map(t => t._1 -> ((t._2, t._3))).toMap
    val got = Similarity.cls1CentroidClassify(spark, sf)
      .select("vec_id", "pred_label", "max_cos").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    assert(got == expected)
  }

  test("cls1: the scoring plan is one narrow pass - no Exchange, no join") {
    val p = finalPlan(Similarity.cls1CentroidClassify(spark, sf))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("hn1: top-5 different-label negatives match plain-Scala brute force") {
    val expected = embs.filter(_._1 < 10).flatMap { case (qid, qlab, qv) =>
      val qnrm = math.sqrt(dot(qv, qv))
      embs.filter { case (id, lab, _) => id != qid && lab != qlab }
        .map { case (id, lab, v) =>
          (qid, id, lab, floorE6(dot(qv, v) / (qnrm * math.sqrt(dot(v, v)))))
        }
        .sortBy { case (_, id, _, cos) => (-cos, id) }
        .take(5).zipWithIndex
        .map { case ((q, id, lab, cos), i) => (q, id, lab, cos, i + 1) }
    }.toSet
    val got = Similarity.hn1HardNegatives(spark, sf)
      .select("qid", "neg_id", "neg_label", "cos", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getInt(4).toLong.toInt)).toSet
    assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")
  }

  test("hn2: labels all differ from the anchor and overlap hn1 >= 80%") {
    val anchorLab = embs.filter(_._1 < 10).map(t => t._1 -> t._2).toMap
    val rows = Similarity.hn2HardNegativesIvfpq(spark, sf)
      .select("qid", "anchor_label", "neg_label", "neg_id").collect()
    assert(rows.length == 50) // 10 anchors x HN_K with headroom in the shortlist
    rows.foreach { r =>
      assert(r.getInt(1) == anchorLab(r.getLong(0)))
      assert(r.getInt(2) != r.getInt(1), s"same-label negative: $r")
    }
    val a = Similarity.hn1HardNegatives(spark, sf).select("qid", "neg_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = rows.map(r => (r.getLong(0), r.getLong(3))).toSet
    val overlap = (a & b).size.toDouble / a.size
    // deterministic constant of the fixed corpus (measured 0.98)
    assert(overlap >= 0.8, s"hn2/hn1 overlap = $overlap")
  }

  test("dsir1: scores match an independent hashed-bigram DSIR recompute") {
    val M40 = 1099511627776L
    def wordHash(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) { h = (h * 31 + s.charAt(i)) % M40; i += 1 }
      h
    }
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val feats = docs.map { case (id, src, text) =>
      val wh = text.split(" ", -1).map(wordHash)
      val m = math.max(wh.length - 1, 1)
      val distinct = scala.collection.mutable.LinkedHashSet.empty[Long]
      var i = 0
      while (i < m) { // window of 2, clamped at the end (RkShingleHashes)
        var h = 0L
        var j = i
        val e = math.min(i + 2, wh.length)
        while (j < e) { h = (h * 1000003 + wh(j)) % M40; j += 1 }
        distinct += h
        i += 1
      }
      (id, src, distinct.toArray.map(_ % 4096))
    }
    val isTgt = (src: String) => src == "src0"
    val ct = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cs = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    feats.foreach { case (_, src, bs) =>
      val m = if (isTgt(src)) ct else cs
      bs.foreach(b => m(b) += 1)
    }
    val nt = ct.values.sum; val ns = cs.values.sum
    def w(b: Long): Long = {
      val ft = ((ct(b) + 1) * 1000000000L) / (nt + 4096)
      val fs = math.max(((cs(b) + 1) * 1000000000L) / (ns + 4096), 1L)
      (ft * 1000000L) / fs
    }
    val expected = feats.filterNot(t => isTgt(t._2)).map { case (id, _, bs) =>
      val score = bs.map(w).sum
      (id, bs.length.toLong, score, score / bs.length)
    }.map(t => t._1 -> t).toMap
    val got = Pipeline.dsir1ImportanceWeights(spark, sf)
      .select("doc_id", "n_feat", "score_e6", "avg_w_e6").collect()
      .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    assert(got == expected)
  }

  test("dsir1: target docs never appear and keep <=> avg_w_e6 >= 1e6") {
    val rows = Pipeline.dsir1ImportanceWeights(spark, sf)
      .select("source", "avg_w_e6", "keep").collect()
    rows.foreach { r =>
      assert(r.getString(0) != "src0")
      assert(r.getBoolean(2) == (r.getLong(1) >= 1000000L))
    }
  }

  test("dsir1: the weight table broadcasts (no SortMergeJoin in the score plan)") {
    val p = finalPlan(Pipeline.dsir1ImportanceWeights(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
