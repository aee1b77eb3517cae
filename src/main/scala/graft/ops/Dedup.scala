package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over the `documents` (and `embeddings`)
  * tables: exact hash-dedup, MinHash+LSH, SimHash, exact n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup = one shuffle on a 64-bit content hash (never on the
  *    full text — the shuffle carries 8 bytes + doc_id per row);
  *  - MinHash/LSH and SimHash banding turn the O(N²) pair problem into
  *    an equi-join on (band, signature) — the only shuffle key is a
  *    16-byte band key, and candidate verification happens only inside
  *    buckets. This is the path that survives 1000 executors; the exact
  *    Jaccard / exact cosine queries exist as correctness oracles at
  *    test SF (their self-joins are O(N²) and deliberately NOT the
  *    scale path).
  */
object Dedup {
  import Fmt._

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  private val words: Column = split(col("text"), " ")

  /** DD1 — exact dedup: group on a content hash, keep the smallest
    * doc_id per group. The oracle groups on raw text (hash-free) —
    * agreement proves the hash grouping loses nothing at this SF. */
  def dd1Exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_doc_id"), col("n_dups"))

  private val dd1Oracle =
    "SELECT min(doc_id) AS keep_doc_id, count(*) AS n_dups FROM documents GROUP BY text"

  /** Word-3-gram shingle set per doc (deduplicated) as an `array<long>`
    * of 8-byte hashes, computed in one codegen-friendly pass by the
    * [[graft.functions.ShingleHashes]] expression — joins and shuffles
    * move the hash, never the shingle text (a 2^-64-per-pair collision
    * risk buys a ~3× smaller shuffle; the DuckDB oracle still joins on
    * raw strings, so a collision would surface as a hash-mismatch). */
  private def shingleArr(spark: SparkSession): Column = {
    graft.functions.GraftFunctions.registerAll(spark)
    call_function("shingle_hashes", words, lit(3))
  }

  private def shingled(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(shingleArr(spark)).as("s"))

  /** Stop-shingle document-frequency cutoff: shingles appearing in more
    * than max(64, 1% of docs) documents are dropped before any pair
    * join. A shingle in D docs contributes O(D²) join rows, so without
    * a bound one stop-shingle detonates the self-join at scale; with it
    * the join output is ≤ |shingles|·F². At the test SFs the cutoff is
    * deliberately a no-op (max observed df is 25 < 64), so the oracle
    * semantics are unchanged where they are hash-compared; it exists to
    * keep the same query survivable at sf1+ (both sides of the oracle
    * mirror the identical HAVING prefilter). */
  private def dfCutoff(nDocs: Long): Long = math.max(64L, math.ceil(0.01 * nDocs).toLong)

  /** DD4 — exact n-gram Jaccard near-dup pairs (threshold 0.5): join on
    * common shingles, |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Shape notes (the round-1 version cost 19.4 s = 26% of the whole
    * bench at sf0.1; see SCALE.md):
    *  - per-doc set sizes are `size(arr)` of the one-pass shingle array —
    *    no aggregation, no sizes join at all; they ride the self-join as
    *    grouping keys instead of two post-join sort-merge passes over the
    *    million-row pair table;
    *  - the stop-shingle list is collected to the driver (bounded small
    *    by construction: df > max(64, 1%·N) admits at most
    *    avg_shingles_per_doc/1% entries regardless of corpus size — the
    *    same "model state, not data" pattern as sim3's centroids) and
    *    applied as a broadcast `array_except`, keeping the no-stop path
    *    literally identical to an unfiltered run. */
  def dd4NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).select(col("doc_id"), shingleArr(spark).as("arr"))
    val cutoff = dfCutoff(docs(spark, dir).count())
    val stop = base.select(explode(col("arr")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > cutoff)
      .collect().map(_.getLong(0))
    val kept = if (stop.isEmpty) col("arr")
      else array_except(col("arr"), typedLit(stop.toSeq))
    val shn = base.select(col("doc_id"), kept.as("arr"))
      .select(col("doc_id"), size(col("arr")).as("n"), explode(col("arr")).as("s"))
    val a = shn.as("a"); val b = shn.as("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("c"))
      // truncating integer ratio (graft.ops.Exact): c/(union) terminates
      // on round-half boundaries whenever the union size is 2^a·5^b
      .withColumn("jaccard", Exact.intRatio(col("c"), col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** the dd4 pair pipeline as reusable CTE text ending in
    * `sel(da, db, jaccard)` — shared with graft.ops.Graph's cc1 oracle
    * so the clustering oracle closes over the EXACT same pair set */
  private[ops] val dd4PairCtes =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 2)),
      |                 i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
      |shd AS (SELECT DISTINCT doc_id, s FROM sh0),
      |stop AS (SELECT s FROM shd GROUP BY s
      |         HAVING count(*) > (SELECT greatest(64, ceil(0.01 * count(*))) FROM documents)),
      |sh AS (SELECT * FROM shd WHERE s NOT IN (SELECT s FROM stop)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |sel AS (SELECT da, db,
      |          floor(c * 1000000 / (sa.n + sb.n - c)) / 1000000 AS jaccard
      |        FROM pairs JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |        WHERE floor(c * 1000000 / (sa.n + sb.n - c)) / 1000000 >= 0.5)""".stripMargin

  private val dd4Oracle = s"WITH $dd4PairCtes SELECT da, db, jaccard FROM sel"

  private val NUM_PERM = 32
  private val BANDS = 8 // 8 bands x 4 rows

  /** DD2 — MinHash + LSH candidate pairs. Per doc: 32 min-hashes (one
    * per seeded permutation), banded 8×4; docs sharing any band bucket
    * become candidates; candidates are kept when the signature-estimated
    * Jaccard ≥ 0.5. Engine-local shingle/permutation hashes ⇒ rows-only check; the
    * ScalaTest spec asserts it finds exactly the dd4 exact-Jaccard pairs
    * on this corpus. */
  def dd2MinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val sh = shingled(spark, dir)
    // signature via the MinHashSketch TypedImperativeAggregate: one
    // expression with a primitive-array buffer (vs 32 generated min()
    // columns whose codegen alone took ~10 s to JIT); partial buffers
    // merge element-wise through ObjectHashAggregate before the single
    // shuffle on doc_id
    val sigs = sh.groupBy(col("doc_id"))
      .agg(call_function("minhash_sketch", col("s")).as("sig"))
    // band keys: structural hash of each 4-slice of the signature
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(BANDS - 1)),
        b => xxhash64(slice(col("sig"), b * (NUM_PERM / BANDS) + 1, lit(NUM_PERM / BANDS)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val l = banded.as("l"); val r = banded.as("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"),
        col("l.sig").as("siga"), col("r.sig").as("sigb"))
      .dropDuplicates("da", "db")
    cand
      .withColumn("est_jaccard", round(
        aggregate(zip_with(col("siga"), col("sigb"), (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / NUM_PERM, 6))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("da"), col("db"), col("est_jaccard"))
  }

  /** DD3 — SimHash near-dup pairs: 64-bit simhash from word hashes
    * (bit j of each word hash votes ±1), banded into 8×8-bit chunks —
    * by pigeonhole, any pair within Hamming distance 7 shares at least
    * one intact chunk, so banding loses nothing up to the threshold.
    * Docs sharing a chunk are candidates; kept when Hamming ≤ 7 (short
    * docs flip several low-margin bits per edited word, so the radius
    * is wider than the classic 64-bit/3-bit setup).
    * Engine-specific hash ⇒ rows-only check + ScalaTest. */
  def dd3SimHash(spark: SparkSession, dir: String): DataFrame = {
    val whash = docs(spark, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    // collapse to (doc, word-hash, count) first — the vocabulary is far
    // smaller than the token stream — then fold the 64 weighted bit
    // votes in one SimHashSketch aggregate (primitive long[64] buffer;
    // replaces 64 generated sum(CASE…) columns and their JIT cost)
    graft.functions.GraftFunctions.registerAll(spark)
    val counted = whash.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("cnt"))
    val sim = counted
      .groupBy(col("doc_id"))
      .agg(call_function("simhash_sketch", col("h"), col("cnt")).as("simhash"))
    val chunked = sim.select(col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 7), i -> shiftright(simhash, i * 8) & 255)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    val l = chunked.as("l"); val r = chunked.as("r")
    // verify the Hamming threshold INSIDE the join condition: candidates
    // failing it die during the join probe, so only true near-dups (a
    // tiny set) ever reach the dedup shuffle — without this, a
    // low-entropy corpus can make nearly every pair a band candidate
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey") &&
        col("l.doc_id") < col("r.doc_id") &&
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))) <= 7)
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .dropDuplicates("da", "db")
  }

  /** DD5 — embedding-cosine near-dup pairs (exact, threshold 0.45):
    * the correctness oracle for the LSH-bucketed scale path (sim2). */
  def dd5EmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    // norms once per vector (2N sqrts), one codegen'd dot per pair —
    // same arithmetic order as the oracle's dot/(sqrt*sqrt)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))
    val a = e.as("a"); val b = e.as("b")
    // floor-scaled score (graft.ops.Exact): the raw cosines are
    // bit-identical across engines, and floor of identical doubles is
    // unambiguous where round() implementations can disagree
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", graft.ops.Exact.floorE6(
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))))
      .filter(col("cos") >= 0.45)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("cos"))
  }

  private val dd5Oracle =
    """SELECT a.vec_id AS va, b.vec_id AS vb,
      |       floor(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) * 1000000) / 1000000 AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE floor(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |            (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |             sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) * 1000000) / 1000000 >= 0.45""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("dd1_exact_dedup", dd1Exact, Some(dd1Oracle)),
    Q("dd2_minhash_lsh", dd2MinHashLsh, None),
    Q("dd3_simhash", dd3SimHash, None),
    Q("dd4_ngram_jaccard", dd4NgramJaccard, Some(dd4Oracle)),
    Q("dd5_embedding_cosine", dd5EmbeddingCosine, Some(dd5Oracle)))
}
