package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Similarity, Multimodal, TextOps}

/** Pins down the operators whose hashes are engine-specific (no DuckDB
  * oracle): MinHash+LSH and SimHash against exact n-gram Jaccard, and
  * LSH-ANN recall against brute-force cosine. */
class DedupSimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("dd2 minhash-lsh finds every exact-jaccard>=0.8 near-dup pair") {
    val exact = Dedup.dd4NgramJaccard(spark, sf)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dd2MinHashLsh(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("dd3 simhash recalls every exact-jaccard>=0.9 near-dup pair") {
    // simhash is bag-of-words-based: it also (correctly) surfaces pairs
    // with similar vocabularies that order-sensitive 3-gram jaccard
    // misses, so the check is recall of the strongest exact pairs, not
    // precision against them.
    val exact = Dedup.dd4NgramJaccard(spark, sf)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.9)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.dd3SimHash(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && sim.nonEmpty)
    val missed = exact -- sim
    assert(missed.isEmpty, s"simhash missed strongest near-dups: $missed")
  }

  test("sim2 lsh-ann achieves >=60% recall@5 of sim1 brute force") {
    val brute = Similarity.sim1BruteTopK(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.sim2LshTopK(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("sim3 ivf-ann achieves >=50% recall@5 of sim1 brute force") {
    val brute = Similarity.sim1BruteTopK(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.sim3AnnIvf(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 = $recall")
  }

  test("mm2 decode stub is deterministic and partition-count-independent") {
    val a = Multimodal.mm2DecodeFeatures(spark, sf).collect().sortBy(_.getLong(0))
    val b = Multimodal.mm2DecodeFeatures(spark, sf).repartition(7).collect().sortBy(_.getLong(0))
    assert(a.length == b.length && a.length > 0)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("mm5 PGM parser is format-general: comments, odd whitespace, round-trip") {
    // a hand-built P5 file no corpus document produced: comment lines
    // interleaved in the header, tabs/multi-space separators, maxval 200
    val px = Array.tabulate(6)(i => (i * 40).toByte) // 3x2 image
    val file = ("P5 # trailing comment\n# full comment line\n 3\t2 \n# again\n200\n"
      .getBytes("US-ASCII")) ++ px
    val (w, h, maxval, pixels) = Multimodal.decodePgm(file)
    assert((w, h, maxval) == (3, 2, 200))
    assert(pixels.toSeq == px.toSeq)
    // encoder/decoder round-trip on arbitrary (incl. non-ascii) bytes
    val payload = Array.tabulate(40)(i => (i * 7 - 128).toByte)
    val (w2, h2, _, px2) = Multimodal.decodePgm(Multimodal.encodePgm(payload))
    assert(w2 == 16 && h2 == 2)
    assert(px2.toSeq == payload.take(32).toSeq)
    // malformed input fails loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.decodePgm("P2\n3 2\n255\n000000".getBytes("US-ASCII"))
    }
  }

  test("ta5 rolling hash collides exactly for identical texts") {
    val df = TextOps.ta5RollingHash(spark, sf)
    assert(df.count() > 0)
    // full_hash distinct-count == text distinct-count
    val texts = Tables.documents(spark, sf).select("text").distinct().count()
    val hashes = df.select("full_hash").distinct().count()
    assert(hashes == texts)
  }
}
