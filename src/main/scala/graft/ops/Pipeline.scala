package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingest and tokenization: deterministic sampling / split
  * assignment, benchmark decontamination, per-source quotas, and
  * sequence packing. All four are fully DuckDB-oracle-checked — the
  * sampling/split hash is the engine-neutral Rabin–Karp fold
  * (graft.functions.RollingHashFp), so even the "random" decisions are
  * bit-reproducible across engines.
  *
  * Scale notes: smp1/dq1/pk1 are one narrow map + at most one shuffle;
  * dc1 is a bounded equi-join on 8-byte shingle hashes against a
  * BROADCAST benchmark side (decontamination corpora — eval benchmarks
  * — are tiny next to training corpora by construction).
  */
object Pipeline {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  private val words: Column = split(col("text"), " ")

  private def fullHash(spark: SparkSession): Column = {
    graft.functions.GraftFunctions.registerAll(spark)
    element_at(call_function("rolling_hash", words, lit(4)), 2)
  }

  /** SMP1 — deterministic content-hash sampling + split assignment:
    * every document lands in a stable 0..99 bucket from its
    * engine-neutral content hash; bucket < 10 selects a reproducible
    * 10% sample, and the same bucketing assigns train/valid/test
    * (98/1/1) without any RNG state. The decision is a pure function of
    * content: re-runs, engine changes, and re-partitioning cannot move
    * a document across splits (the property training pipelines need for
    * decontaminated held-out sets). */
  def smp1HashSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("bucket", pmod(fullHash(spark), lit(100L)))
      .filter(col("bucket") < 10)
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") === 0, "valid")
          .when(col("bucket") === 1, "test")
          .otherwise("train").as("split"))

  private val rkWordSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |  list_transform(range(1, length(wd) + 1),
      |    j -> CAST(ascii(substr(wd, CAST(j AS INT), 1)) AS BIGINT))),
      |  (a, x) -> (a * 31 + x) % 1099511627776)""".stripMargin

  private val smp1Oracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |wh AS (SELECT doc_id, list_transform(w, wd -> $rkWordSql) AS hs FROM t),
       |fh AS (SELECT doc_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |           (a, x) -> (a * 1000003 + x) % 1099511627776) % 100 AS bucket
       |       FROM wh)
       |SELECT doc_id, bucket,
       |       CASE WHEN bucket = 0 THEN 'valid'
       |            WHEN bucket = 1 THEN 'test'
       |            ELSE 'train' END AS split
       |FROM fh WHERE bucket < 10""".stripMargin

  private val STRATUM_N = 25

  /** SMP2 — stratified balanced sampling: exactly min(N, |stratum|)
    * documents per language, chosen by content-hash order — the
    * rebalancing step a multilingual corpus pipeline runs so dominant
    * languages don't drown the rest. Deterministic like smp1 (the
    * "random" order is the engine-neutral content hash, so re-runs and
    * engine swaps pick identical samples).
    *
    * Shape: per-stratum TakeOrdered via the bounded
    * [[graft.functions.TopNByKey]] sketch — every map task keeps the N
    * smallest (hash, doc_id) pairs per language, partials merge through
    * ObjectHashAggregate, and the one shuffle carries ≤N pairs per
    * (task, language). The round-2 form (`row_number() OVER (PARTITION
    * BY lang ORDER BY h)`) funneled the WHOLE corpus through ~5 window
    * reducers — the verdict's one genuine scale-killer; PlanSpec now
    * pins that no Window exchange of the corpus remains. */
  def smp2Stratified(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    docs(spark, dir)
      .withColumn("h", fullHash(spark))
      .groupBy(col("lang"))
      .agg(call_function("topn_by_key", col("h"), col("doc_id"), lit(STRATUM_N)).as("ids"))
      .select(col("lang"), posexplode(col("ids")))
      .select(col("col").as("doc_id"), col("lang"),
        (col("pos") + 1).as("pos_in_stratum"))
  }

  private val smp2Oracle =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |wh AS (SELECT doc_id, lang, list_transform(w, wd -> $rkWordSql) AS hs FROM t),
       |fh AS (SELECT doc_id, lang,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |           (a, x) -> (a * 1000003 + x) % 1099511627776) AS h
       |       FROM wh),
       |r AS (SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS pos_in_stratum
       |      FROM fh)
       |SELECT doc_id, lang, pos_in_stratum FROM r
       |WHERE pos_in_stratum <= $STRATUM_N""".stripMargin

  private[graft] val BENCH_DOCS = 50 // stand-in "benchmark" set: doc_id < 50
  private[graft] val OVERLAP = 5 // shared 3-gram shingles to flag

  /** DC1 — benchmark decontamination: flag training documents sharing
    * ≥ OVERLAP word-3-gram shingles with any "benchmark" document (the
    * first BENCH_DOCS docs stand in for an eval set). The benchmark
    * side broadcasts (eval sets are tiny vs training corpora); the join
    * carries 8-byte shingle hashes via [[graft.functions.ShingleHashes]]
    * and the overlap count is hash-agnostic, so the DuckDB oracle joins
    * raw shingle strings and must agree exactly. */
  def dc1Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val sh = docs(spark, dir).select(col("doc_id"),
      explode(call_function("shingle_hashes", words, lit(3))).as("s"))
    val bench = sh.filter(col("doc_id") < BENCH_DOCS)
      .select(col("doc_id").as("bench_id"), col("s"))
    sh.filter(col("doc_id") >= BENCH_DOCS)
      .join(broadcast(bench), "s")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= OVERLAP)
  }

  private val dc1Oracle =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 2)),
       |                 i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
       |sh AS (SELECT DISTINCT doc_id, s FROM sh0)
       |SELECT t.doc_id, b.doc_id AS bench_id, count(*) AS n_common
       |FROM sh t JOIN sh b ON t.s = b.s
       |WHERE b.doc_id < $BENCH_DOCS AND t.doc_id >= $BENCH_DOCS
       |GROUP BY 1, 2 HAVING count(*) >= $OVERLAP""".stripMargin

  /** DC2 — FUZZY benchmark decontamination: flag training documents
    * that are MinHash-near-duplicates of any benchmark document —
    * catching paraphrased/reformatted contamination that dc1's exact
    * shingle-overlap count misses at scale (dc1 must join every shared
    * shingle; dc2 joins only band keys). Reuses dd2's engine-neutral
    * signature pipeline ([[Dedup.rkBanded]]) verbatim, so the whole
    * query is oracle-hash-checked; the benchmark side (≤ BENCH_DOCS
    * docs × 8 bands) BROADCASTS like dc1's, and the corpus side never
    * shuffles for the join. */
  def dc2FuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val banded = Dedup.rkBanded(spark, dir)
    val bench = banded.filter(col("doc_id") < BENCH_DOCS)
      .select(col("doc_id").as("bench_id"), col("sig").as("bsig"),
        col("band"), col("bkey"))
    val cand = banded.filter(col("doc_id") >= BENCH_DOCS)
      .join(broadcast(bench), Seq("band", "bkey"))
      .select(col("doc_id"), col("bench_id"), col("sig"), col("bsig"))
      .dropDuplicates("doc_id", "bench_id")
    cand.withColumn("est_jaccard", Dedup.estJaccard(col("sig"), col("bsig")))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id"), col("bench_id"), col("est_jaccard"))
  }

  private val dc2Oracle =
    s"""WITH ${Dedup.dd2SigCtes},
       |candd AS (SELECT DISTINCT r.doc_id AS doc_id, l.doc_id AS bench_id,
       |            r.sig AS sig, l.sig AS bsig
       |          FROM bnd2 l JOIN bnd2 r
       |            ON l.band = r.band AND l.bkey = r.bkey
       |           AND l.doc_id < $BENCH_DOCS AND r.doc_id >= $BENCH_DOCS)
       |SELECT doc_id, bench_id, est_jaccard FROM (
       |  SELECT doc_id, bench_id,
       |         ${Dedup.estJaccardSql("sig", "bsig")} AS est_jaccard
       |  FROM candd)
       |WHERE est_jaccard >= 0.5""".stripMargin

  /** Bloom geometry for dc4: 2^17 bits (2048 longs — 16 KB) × 4 probes.
    * At the FIXED bench-shingle load (BENCH_DOCS is an absolute id
    * cutoff, so n ≈ 6k distinct shingles at every SF) the false-positive
    * rate is (1−e^{−kn/m})^k ≈ 8e-4 — ≪ OVERLAP expected FP hits per
    * document, so the flag set matches dc1's up to a deterministic,
    * oracle-replayed FP residue. */
  private[graft] val BLOOM_BITS = 131072L
  private[graft] val BLOOM_WORDS = 2048
  private[graft] val BLOOM_K = 4

  /** Column mirror of [[graft.functions.RkLsh.mix2]] over Bloom chain i,
    * reduced to a bit position — the same two-round avalanche every
    * structured-input bucketing hash in the repo uses (see apx3's
    * scaladoc for why one affine round is not enough). */
  private def bloomProbe(i: Int, h: Column): Column = {
    import graft.functions.RkLsh
    val s1 = (lit(RkLsh.A(RkLsh.blA(i))) * h + lit(RkLsh.B(RkLsh.blA(i)))) % RkLsh.P
    val s1x = s1.bitwiseXOR(shiftright(s1, 20))
    val s2 = (lit(RkLsh.A(RkLsh.blB(i))) * s1x + lit(RkLsh.B(RkLsh.blB(i)))) % RkLsh.P
    pmod(s2.bitwiseXOR(shiftright(s2, 20)), lit(BLOOM_BITS))
  }

  /** DC4 — BLOOM-FILTER decontamination: dc1's contamination test with
    * the benchmark side compressed into a fixed 16 KB bit array instead
    * of a broadcast shingle set. Each bench 3-gram shingle hash sets
    * BLOOM_K bit positions (two-round avalanche over the engine-neutral
    * RK shingle hash, chains 48-55); a training document is flagged when
    * ≥ OVERLAP of its distinct shingles probe all-positive.
    *
    * Shape (100 TB): the scale limit of dc1/dc2 is the BENCHMARK side —
    * a production decontamination pass screens against MANY eval suites
    * at once, and a broadcast shingle set grows with them, while this
    * sketch stays 2048 longs no matter how many suites feed it (Bloom
    * 1970's guarantee: no false NEGATIVES at any load — supersets of the
    * true flag set, with the FP rate as the dial). The corpus side is
    * the real win: membership is pure arithmetic against the sketch via
    * the codegen'd [[graft.functions.BloomHits]] expression — one narrow
    * compiled map with NO join, NO shuffle, and no per-gram explode;
    * only flagged doc_ids leave the scan. (A first cut used
    * size(filter(shingles, λ)): Spark evaluates higher-order-function
    * lambdas interpreted per element — 51 s warm at sf10 vs 3.4 s
    * compiled.) The sketch itself is built by one bounded aggregate
    * (≤ BLOOM_WORDS rows by construction — the collect moves 16 KB of
    * model state, never corpus). Every probe replays in DuckDB, so
    * flags INCLUDING the deterministic false positives hash-match the
    * oracle. */
  def dc4BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val shingles = call_function("rk_shingle_hashes", words, lit(3))
    // build: bench shingles -> 4 probes each -> per-word bit_or; the
    // aggregate has <= BLOOM_WORDS distinct keys by construction
    val setBits = docs(spark, dir).filter(col("doc_id") < BENCH_DOCS)
      .select(explode(shingles).as("s")).distinct()
      .select(explode(array((0 until BLOOM_K).map(i => bloomProbe(i, col("s"))): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("idx"),
        col("p").bitwiseAND(lit(63L)).cast("int").as("bit"))
      .groupBy(col("idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L), col("bit"))).as("w"))
      .collect()
    val sketch = new Array[Long](BLOOM_WORDS)
    setBits.foreach(r => sketch(r.getInt(0)) = r.getLong(1))
    docs(spark, dir).filter(col("doc_id") >= BENCH_DOCS)
      .select(col("doc_id"),
        call_function("bloom_hits", shingles, typedlit(sketch.toSeq),
          lit(BLOOM_BITS)).as("n_hits"))
      .filter(col("n_hits") >= OVERLAP)
  }

  private val dc4Oracle: String = {
    import graft.functions.RkLsh
    val wordFold = RkLsh.wordSql.replace("\n", " ")
    def arms(src: String, cols: String): String = (0 until BLOOM_K).map { i =>
      s"""SELECT $cols,
         |  (${RkLsh.mix2Sql(RkLsh.blA(i), RkLsh.blB(i), "s")}) % $BLOOM_BITS AS p
         |FROM $src""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH tk4 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |wh4 AS (SELECT doc_id, list_transform(w, wd -> $wordFold) AS hs,
       |          len(w) AS nw FROM tk4),
       |sh4 AS (SELECT doc_id, unnest(list_transform(range(0, greatest(nw - 3, 0) + 1),
       |          i -> list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i + 1:i + 3]),
       |                 (a, x) -> (a * ${RkLsh.MUL} + x) % ${RkLsh.M40}))) AS s FROM wh4),
       |sd4 AS (SELECT DISTINCT doc_id, s FROM sh4),
       |bb4 AS (SELECT DISTINCT p FROM (
       |${arms(s"(SELECT s FROM sd4 WHERE doc_id < $BENCH_DOCS)", "1 AS one")})),
       |cp4 AS (${arms(s"(SELECT doc_id, s FROM sd4 WHERE doc_id >= $BENCH_DOCS)",
                      "doc_id, s")}),
       |pos4 AS (SELECT doc_id, s FROM cp4 c
       |         WHERE EXISTS (SELECT 1 FROM bb4 b WHERE b.p = c.p)
       |         GROUP BY doc_id, s HAVING count(*) = $BLOOM_K)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM pos4
       |GROUP BY doc_id HAVING count(*) >= $OVERLAP""".stripMargin
  }

  private val QUOTA = 2

  /** DQ1 — per-source quota: keep at most QUOTA documents per
    * fingerprint group (normalize-sort-dedupe key, the ta4 family),
    * deterministically by lowest doc_id. The canonical "cap documents
    * per domain/source" curation step; one window over one shuffle. */
  def dq1GroupQuota(spark: SparkSession, dir: String): DataFrame = {
    val fp = docs(spark, dir)
      .withColumn("fp", array_join(array_sort(array_distinct(words)), " "))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    fp.withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= QUOTA)
      .select(col("doc_id"), substring(col("fp"), 1, 32).as("fp_prefix"),
        col("rank_in_group"))
  }

  private val dq1Oracle =
    s"""WITH f AS (SELECT doc_id,
       |         array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS fp
       |  FROM documents),
       |r AS (SELECT doc_id, fp,
       |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rank_in_group
       |      FROM f)
       |SELECT doc_id, substr(fp, 1, 32) AS fp_prefix, rank_in_group
       |FROM r WHERE rank_in_group <= $QUOTA""".stripMargin

  private val PACK_BUDGET = 512L

  private val PACK_BUCKETS = 32

  /** PK1 — sequence packing: assign documents to fixed token-budget
    * bins by running token count in doc_id order (deterministic
    * first-come packing — the shuffle-free assignment pass of a packer;
    * the actual concatenation is a downstream groupBy(bin)). A document
    * larger than the budget gets its own bin, same as real packers
    * overflow.
    *
    * The prefix sum is DISTRIBUTED, two-phase — a naive
    * `Window.orderBy(doc_id)` funnels the whole corpus through one
    * partition:
    *  1. deterministic range buckets on doc_id (fixed arithmetic, NOT
    *     repartitionByRange — whose sampled boundaries can differ
    *     between the two passes); per-bucket token totals collect to
    *     the driver (≤ PACK_BUCKETS rows of model state) and prefix-sum
    *     into per-bucket offsets;
    *  2. a within-bucket window adds the broadcast offset — every
    *     bucket computes in parallel, and the result is identical to
    *     the global running sum. */
  def pk1PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir)
      .select(col("doc_id"), size(words).cast("long").as("n_tokens"))
    val maxId = t.agg(max(col("doc_id"))).head().getLong(0)
    val width = math.max(maxId / PACK_BUCKETS + 1, 1L)
    val bucketed = t.withColumn("bkt", (col("doc_id") / width).cast("long"))
    // phase 1: per-bucket totals -> cumulative offsets (model state)
    val totals = bucketed.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0L -> 0L) { case ((_, acc), (b, tot)) => b -> (acc + tot) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => b -> acc }.toMap
    val offCol = element_at(
      typedLit(offsets), col("bkt"))
    // phase 2: parallel within-bucket running sum + broadcast offset
    val w = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + coalesce(offCol, lit(0L)))
      .withColumn("bin", ((col("cum_tokens") - 1) / PACK_BUDGET).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("bin"))
  }

  private val pk1Oracle =
    s"""WITH t AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |         sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |      FROM t)
       |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |       CAST((cum_tokens - 1) // $PACK_BUDGET AS BIGINT) AS bin
       |FROM c""".stripMargin

  /** PK2 — the packed-bin manifest pk1's assignment feeds: one row per
    * bin with its ordered document list, token total, and fill ratio
    * against the budget — the "what got packed together" artifact a
    * training-data loader consumes. One groupBy(bin) over pk1's
    * output; bins hold ~budget/avg_doc documents, so per-group state is
    * bounded by construction (oversize singleton bins show fill > 1). */
  def pk2PackManifest(spark: SparkSession, dir: String): DataFrame =
    pk1PackSequences(spark, dir)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("doc_list"))
      .withColumn("fill_ratio", Exact.intRatio(col("bin_tokens"), lit(PACK_BUDGET)))
      .select(col("bin"), col("n_docs"), col("bin_tokens"), col("doc_list"),
        col("fill_ratio"))

  private val pk2Oracle =
    s"""WITH t AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |         sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |      FROM t),
       |a AS (SELECT doc_id, n_tokens,
       |         CAST((cum_tokens - 1) // $PACK_BUDGET AS BIGINT) AS bin FROM c)
       |SELECT bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_list,
       |       floor(sum(n_tokens) * 1000000 / $PACK_BUDGET) / 1000000 AS fill_ratio
       |FROM a GROUP BY bin""".stripMargin

  private val SHUF_BUCKETS = 64L
  private val HASH_SPACE = 1L << 40 // rolling_hash folds mod 2^40

  /** SHF1 — deterministic global corpus shuffle: every document gets a
    * dense position in the content-hash total order (h, then doc_id) —
    * the "shuffle the corpus before training" pass, reproducible across
    * engines and re-runs because the "randomness" is the engine-neutral
    * content hash rather than RNG state.
    *
    * The global rank is DISTRIBUTED, two-phase (the pk1 recipe): a
    * naive `Window.orderBy(h)` funnels the whole corpus through ONE
    * reducer. Instead:
    *  1. fixed-width range buckets over the 2^40 hash space (fixed
    *     arithmetic, so both phases agree on boundaries without a
    *     sampling pass); per-bucket COUNTS collect to the driver
    *     (≤ SHUF_BUCKETS rows of model state) and prefix-sum into
    *     per-bucket offsets;
    *  2. a within-bucket window ranks in parallel and adds the
    *     broadcast offset — identical to the global row_number.
    * On a real cluster SHUF_BUCKETS scales with executor count; the
    * hash is uniform so fixed-width buckets balance without sampling. */
  def shf1Shuffle(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir).select(col("doc_id"), fullHash(spark).as("h"))
    val width = HASH_SPACE / SHUF_BUCKETS
    val b = t.withColumn("bkt", (col("h") / width).cast("long"))
    val counts = b.groupBy(col("bkt")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L -> 0L) { case ((_, acc), (k, n)) => k -> (acc + n) }
      .sliding(2).collect { case Array((_, acc), (k, _)) => k -> acc }.toMap
    val w = Window.partitionBy(col("bkt")).orderBy(col("h"), col("doc_id"))
    b.withColumn("shuf_pos",
        row_number().over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col("bkt")), lit(0L)))
      .select(col("doc_id"), col("h"), col("shuf_pos"))
  }

  private val shf1Oracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |wh AS (SELECT doc_id, list_transform(w, wd -> $rkWordSql) AS hs FROM t),
       |fh AS (SELECT doc_id,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |           (a, x) -> (a * 1000003 + x) % 1099511627776) AS h
       |       FROM wh)
       |SELECT doc_id, h,
       |       row_number() OVER (ORDER BY h, doc_id) AS shuf_pos
       |FROM fh""".stripMargin

  private val MIX_SHARE_DEN = 4L // overall budget = corpus tokens / 4

  /** MIX1 — mixture-weighted sampling to a token budget: the
    * data-mixing pass that turns per-source mixture weights (the
    * "40% web / 30% books / …" recipe every training run publishes)
    * into a deterministic per-document keep decision. Source s with
    * weight w_s gets token budget B·w_s/Σw of the overall budget
    * B = corpus_tokens/MIX_SHARE_DEN; its acceptance rate is
    * budget_s/tokens_s capped at 1, e6-scaled in EXACT left-to-right
    * BIGINT arithmetic (every division is integer DIV, mirrored
    * operation-for-operation in the oracle), and acceptance is the
    * engine-neutral content hash mod 1e6 — re-runs, engine swaps, and
    * repartitions keep the sample byte-identical (smp1's property,
    * weighted). Weights derive from the source index (idx%4+1) so the
    * op exercises real mixture skew at every SF without a hardcoded
    * source list.
    *
    * Shape: one per-source token aggregate (source-cardinality rows —
    * genuinely model-sized, the src1 argument) broadcasts back onto a
    * narrow accept map; the corpus never shuffles. */
  def mix1MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir).select(col("doc_id"), col("source"),
      size(words).cast("long").as("n_tokens"), fullHash(spark).as("h"))
    val bySrc = t.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok_s"))
      // substr to END-OF-STRING (no length cap), exactly like the
      // oracle's substr(source, 4) — a fixed-width substring would
      // silently diverge if source names ever exceed 13 chars
      .withColumn("wnum", expr("substr(source, 4)").cast("long") % 4 + 1)
    val totals = bySrc.agg(sum(col("tok_s")).as("tok_total"),
      sum(col("wnum")).as("wden"))
    val rates = bySrc.crossJoin(broadcast(totals))
      .withColumn("rate_e6", least(lit(1000000L), expr(
        s"((((tok_total DIV $MIX_SHARE_DEN) * wnum) DIV wden) * 1000000) DIV tok_s")))
      .select(col("source"), col("rate_e6"))
    t.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("rate_e6"),
        (pmod(col("h"), lit(1000000L)) < col("rate_e6")).as("sampled"))
  }

  private val mix1Oracle =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |wh AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tokens,
       |         list_transform(w, wd -> $rkWordSql) AS hs FROM t),
       |fh AS (SELECT doc_id, source, n_tokens,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |           (a, x) -> (a * 1000003 + x) % 1099511627776) AS h FROM wh),
       |bs AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tok_s,
       |         CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS wnum
       |       FROM fh GROUP BY source),
       |tt AS (SELECT CAST(sum(tok_s) AS BIGINT) AS tok_total,
       |              CAST(sum(wnum) AS BIGINT) AS wden FROM bs),
       |rt AS (SELECT source, least(CAST(1000000 AS BIGINT),
       |         ((((tok_total // $MIX_SHARE_DEN) * wnum) // wden) * 1000000) // tok_s)
       |         AS rate_e6
       |       FROM bs CROSS JOIN tt)
       |SELECT f.doc_id, f.source, f.n_tokens, r.rate_e6,
       |       (f.h % 1000000) < r.rate_e6 AS sampled
       |FROM fh f JOIN rt r USING (source)""".stripMargin

  private val PII_RE = "\\b(customer|supplier|order)\\b"
  private val REDACTED = "[REDACTED]"

  /** SC1 — denylist scrubbing: redact every occurrence of a sensitive
    * term list (the PII-scrub pass of a corpus pipeline — emails, IDs,
    * names; here a word-boundary regex over a stand-in denylist drawn
    * from the corpus vocabulary so the operator has visible effect at
    * every SF). Pure narrow map — regexp_extract_all counts + one
    * regexp_replace per document, zero shuffle, whole-stage codegen'd;
    * both the hit count and the TRANSFORMED TEXT are oracle-compared
    * (prefix + exact length), so the rewrite itself is hash-checked,
    * not just the count. */
  def sc1PiiScrub(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("clean", regexp_replace(col("text"), PII_RE, REDACTED))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(PII_RE), lit(0))).cast("long").as("n_hits"),
        length(col("clean")).cast("long").as("clean_len"),
        substring(col("clean"), 1, 64).as("clean_prefix"))

  private val sc1Oracle =
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '\\b(customer|supplier|order)\\b')) AS BIGINT) AS n_hits,
       |       CAST(length(regexp_replace(text, '\\b(customer|supplier|order)\\b', '[REDACTED]', 'g')) AS BIGINT) AS clean_len,
       |       substr(regexp_replace(text, '\\b(customer|supplier|order)\\b', '[REDACTED]', 'g'), 1, 64) AS clean_prefix
       |FROM documents""".stripMargin

  private val SRC_MIN_E6 = 400000L // sources averaging below 0.4 are dropped wholesale

  /** SRC1 — source-level quality prior (domain filtering, the
    * C4-family move): aggregate per-document quality to its source,
    * then gate each document on BOTH the source prior (a source whose
    * average quality is below SRC_MIN drops wholesale — the "bad
    * domain" rule) and its own score relative to the source average
    * (q·2 ≥ avg, an integer-only compare so no division enters the
    * decision). Quality is ta2's score kept as an e6-scaled BIGINT so
    * the per-source mean is exact integer-sum arithmetic in both
    * engines.
    *
    * Shape: one narrow quality map, one source-keyed aggregate
    * (source cardinality ≪ corpus — the prior table is a model-sized
    * artifact), priors BROADCAST back onto a narrow decision map. The
    * corpus shuffles only to build the per-source sums (map-side
    * partial aggregation makes that shuffle source-cardinality-sized
    * per task). */
  def src1SourcePrior(spark: SparkSession, dir: String): DataFrame = {
    val q = docs(spark, dir)
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("stop_hits",
        size(filter(words, w => w.isin("the", "and", "of", "to", "in"))).cast("long"))
      .select(col("doc_id"), col("source"),
        floor(least(col("n_words"), lit(100L)) * (col("n_words") - col("stop_hits"))
          * lit(1000000L) / (lit(100L) * col("n_words"))).as("q_e6"))
    val pri = q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src_docs"),
        floor(sum(col("q_e6")) / count(lit(1))).as("src_avg_q_e6"))
    q.join(broadcast(pri), "source")
      .select(col("doc_id"), col("source"), col("q_e6"),
        col("n_src_docs"), col("src_avg_q_e6"),
        (col("src_avg_q_e6") >= SRC_MIN_E6 &&
          col("q_e6") * 2 >= col("src_avg_q_e6")).as("keep"))
  }

  private val src1Oracle =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |q0 AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_words,
       |         CAST(len(list_filter(w, x -> list_contains(['the','and','of','to','in'], x))) AS BIGINT) AS stop_hits
       |       FROM t),
       |q AS (SELECT doc_id, source,
       |        CAST(floor(least(n_words, 100) * (n_words - stop_hits) * 1000000
       |                   / (100 * n_words)) AS BIGINT) AS q_e6 FROM q0),
       |pri AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src_docs,
       |          CAST(floor(CAST(sum(q_e6) AS BIGINT) / count(*)) AS BIGINT) AS src_avg_q_e6
       |        FROM q GROUP BY source)
       |SELECT doc_id, q.source AS source, q_e6, n_src_docs, src_avg_q_e6,
       |       (src_avg_q_e6 >= $SRC_MIN_E6 AND q_e6 * 2 >= src_avg_q_e6) AS keep
       |FROM q JOIN pri ON q.source = pri.source""".stripMargin

  private val CUR_MIN_TOKENS = 30L

  /** CUR1 — the curation pipeline END TO END, the way cc2 is the dedup
    * pipeline end to end: language gate + length gate (one narrow map
    * fused into the scan) → exact-dedup keep-list (ONE shuffle on the
    * 8-byte content hash; the survivor's attributes ride the aggregate
    * as `min(struct(doc_id, …))`, so no join-back) → benchmark
    * decontamination (dc1's flagged set is contamination-sized and
    * BROADCASTS onto a left-anti hash join) → deterministic content-hash
    * train/valid/test split (smp1's rule). The corpus is scanned, gated,
    * shuffled once by hash, and never globally sorted or windowed.
    *
    * Every stage reuses the registry's verified building blocks (ta1's
    * language rule, dd1's keep-list shape, dc1's flags verbatim, smp1's
    * split), and the composed result is oracle-hash-checked end to end. */
  /** cur1's STATELESS prefix — benchmark exclusion, language + length
    * gate, content hash, and the doc's 3-gram shingles — factored out
    * so the streaming variant ([[graft.streaming.CurationStream]])
    * runs the IDENTICAL expressions and cannot drift from the batch
    * oracle. Works on batch and streaming DataFrames alike (every
    * expression is a narrow map). The `sh` column is only consumed by
    * the streaming contamination check; batch cur1 never references
    * it, so Catalyst prunes it out of the batch plan. */
  private[graft] def curGate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.registerAll(spark)
    // codegen'd count_in, not size(filter(isin)) — see TextOps.hits
    def hitsIn(m: Seq[String]): Column =
      call_function("count_in", words, typedLit(m))
    docs
      .filter(col("doc_id") >= BENCH_DOCS) // the bench stand-in set is never training data
      .withColumn("n_tokens", size(words).cast("long"))
      .withColumn("s_en", hitsIn(Seq("the", "and", "of", "to", "in")))
      .withColumn("s_es", hitsIn(Seq("el", "la", "de", "los", "que")))
      .withColumn("s_de", hitsIn(Seq("der", "und", "das", "ist", "nicht")))
      .withColumn("s_fr", hitsIn(Seq("le", "et", "les", "des", "est")))
      .filter(col("n_tokens") >= CUR_MIN_TOKENS && col("s_en") >= 1 &&
        col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")))
      .withColumn("h", fullHash(spark))
      .withColumn("sh", call_function("shingle_hashes", words, lit(3)))
      // rsh feeds the streaming NEAR-DUP leg (dd2's RK shingle family,
      // from which CurationStream derives MinHash signatures); like
      // `sh` it is pruned out of every batch plan that doesn't read it
      .withColumn("rsh", call_function("rk_shingle_hashes", words, lit(3)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("h"),
        col("sh"), col("rsh"))
  }

  def cur1CurationE2e(spark: SparkSession, dir: String): DataFrame = {
    val gated = curGate(docs(spark, dir))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("h"))
    val kept = gated.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("source"), col("n_tokens"))).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.source").as("source"),
        col("d.n_tokens").as("n_tokens"), col("h"))
    val flagged = dc1Decontaminate(spark, dir).select(col("doc_id")).distinct()
    kept.join(broadcast(flagged), Seq("doc_id"), "left_anti")
      .withColumn("bucket", pmod(col("h"), lit(100L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("bucket"),
        when(col("bucket") === 0, "valid").when(col("bucket") === 1, "test")
          .otherwise("train").as("split"))
  }

  /** CUR2 — the batch twin of the FULL streaming curation chain
    * ([[graft.streaming.CurationStream.curatedNearDup]]): cur1's gate →
    * exact dedup → decontamination, PLUS the near-dup leg — a winner
    * is `kept = false` when an EARLIER (smaller-id) winner shares a
    * dd2 band bucket with it at signature-estimated Jaccard ≥ 0.5.
    * Anchors include winners that are themselves dropped (dd7's rule) —
    * the identical semantics of the streaming band-index stage, so
    * StreamingCurationSpec asserts streaming ≡ THIS oracle-checked
    * query, closing the loop: the streaming near-dup path is now
    * transitively DuckDB-verified.
    *
    * Scale shape: cur1's single hash shuffle, then dd2's banded
    * equi-join restricted to winners by a semi-join — candidate
    * compares only, never all-pairs; kept/tombstone verdicts ride a
    * left join on doc_id. The ANCHOR side of each band bucket is
    * additionally capped to the bucket's BUCKET_CAP min-id members
    * (row_number over (band, bkey) ordered by doc_id): without the cap
    * a viral-boilerplate / mirror cluster putting 10⁴–10⁶ near-identical
    * documents in one bucket makes the bucket's pair count quadratic in
    * its size (measured 7.2× runtime for 10× data on a 100×-replica
    * corpus). Min-id members are exactly the anchors the min-id drop
    * rule keeps, and ANY earlier member at est ≥ 0.5 suffices to drop a
    * doc, so on non-adversarial corpora the cap is invisible (spec'd:
    * cap=2 ≡ uncapped on the test corpus); in the adversarial regime it
    * bounds the bucket to CAP·|bucket| compares. The oracle bakes the
    * same cap (arn ≤ cap), so the query stays hash-checkable at every
    * SF; overriding [[BucketCapConf]] forfeits only the oracle twin
    * (same contract as graft.ivf.*). */
  private[graft] val BucketCapConf = "graft.curation.bucketCap"
  private[graft] val DefaultBucketCap = 64
  def cur2CurationNearDup(spark: SparkSession, dir: String): DataFrame = {
    // pin both shared frames (optimization r13): winners is referenced
    // three times (semi-join filter, final left join, and transitively
    // under banded's both consumers) and banded twice (anchors window +
    // pair-join probe side). Unpinned, each reference re-plans the full
    // gate→dedup→decontaminate chain — 11 documents scans in one plan,
    // of which runtime exchange reuse recovered only the two whose
    // pruned columns happened to match. Pinned: one gate pass, one
    // signature pass, guaranteed by construction rather than by
    // canonicalization luck.
    val winners = Model.pin(cur1CurationE2e(spark, dir))
    val banded = Model.pin(Dedup.rkBanded(spark, dir)
      .join(winners.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    val cap = spark.conf.getOption(BucketCapConf).map(_.toInt)
      .getOrElse(DefaultBucketCap)
    val anchors = banded
      .withColumn("arn", row_number().over(
        Window.partitionBy(col("band"), col("bkey")).orderBy(col("doc_id"))))
      .filter(col("arn") <= cap).drop("arn")
    val dropped = anchors.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .filter(Dedup.estJaccard(col("l.sig"), col("r.sig")) >= 0.5)
      .select(col("r.doc_id").as("doc_id")).distinct()
    winners.join(dropped.withColumn("dn", lit(1L)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("bucket"),
        col("split"), col("dn").isNull.as("kept"))
  }

  private val cur1Ctes =
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
       |           FROM documents WHERE doc_id >= $BENCH_DOCS),
       |g0 AS (SELECT doc_id, source, w, CAST(len(w) AS BIGINT) AS n_tokens,
       |         len(list_filter(w, x -> list_contains(['the','and','of','to','in'], x))) AS s_en,
       |         len(list_filter(w, x -> list_contains(['el','la','de','los','que'], x))) AS s_es,
       |         len(list_filter(w, x -> list_contains(['der','und','das','ist','nicht'], x))) AS s_de,
       |         len(list_filter(w, x -> list_contains(['le','et','les','des','est'], x))) AS s_fr
       |       FROM t),
       |g AS (SELECT doc_id, source, w, n_tokens FROM g0
       |      WHERE n_tokens >= $CUR_MIN_TOKENS AND s_en >= 1
       |        AND s_en >= greatest(s_es, s_de, s_fr)),
       |wh AS (SELECT doc_id, source, n_tokens,
       |         list_transform(w, wd -> $rkWordSql) AS hs FROM g),
       |fh AS (SELECT doc_id, source, n_tokens,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
       |           (a, x) -> (a * 1000003 + x) % 1099511627776) AS h
       |       FROM wh),
       |dd AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM fh),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 1, 2)),
       |                 i -> array_to_string(w[i:i+2], ' '))) AS s FROM toks),
       |sh AS (SELECT DISTINCT doc_id, s FROM sh0),
       |flagp AS (SELECT t.doc_id AS doc_id, b.doc_id AS bench_id FROM sh t JOIN sh b ON t.s = b.s
       |          WHERE b.doc_id < $BENCH_DOCS AND t.doc_id >= $BENCH_DOCS
       |          GROUP BY 1, 2 HAVING count(*) >= $OVERLAP),
       |flag AS (SELECT DISTINCT doc_id FROM flagp)""".stripMargin

  private val cur1Sel =
    """SELECT doc_id, source, n_tokens, h % 100 AS bucket,
      |       CASE WHEN h % 100 = 0 THEN 'valid'
      |            WHEN h % 100 = 1 THEN 'test'
      |            ELSE 'train' END AS split
      |FROM dd WHERE rn = 1 AND doc_id NOT IN (SELECT doc_id FROM flag)""".stripMargin

  private val cur1Oracle = s"$cur1Ctes\n$cur1Sel"

  private val cur2Oracle =
    s"""$cur1Ctes,
       |win2 AS ($cur1Sel),
       |${Dedup.dd2SigCtes},
       |wb2 AS (SELECT b.* FROM bnd2 b JOIN win2 w ON b.doc_id = w.doc_id),
       |anc2 AS (SELECT * FROM (SELECT *, row_number() OVER
       |           (PARTITION BY band, bkey ORDER BY doc_id) AS arn FROM wb2)
       |         WHERE arn <= $DefaultBucketCap),
       |drop2 AS (SELECT DISTINCT r.doc_id
       |          FROM anc2 l JOIN wb2 r ON l.band = r.band AND l.bkey = r.bkey
       |            AND l.doc_id < r.doc_id
       |          WHERE ${Dedup.estJaccardSql("l.sig", "r.sig")} >= 0.5)
       |SELECT w.doc_id, w.source, w.n_tokens, w.bucket, w.split,
       |       d.doc_id IS NULL AS kept
       |FROM win2 w LEFT JOIN drop2 d ON w.doc_id = d.doc_id""".stripMargin

  private val DSIR_B = 4096 // hashed-feature buckets (fixed-size model by construction)
  private val DSIR_TARGET = "src0" // target-domain exemplar source

  /** DSIR1 — data selection via hashed n-gram importance weights (the
    * DSIR move, Xie et al. NeurIPS'23): score every raw-pool document
    * by how target-like its hashed-bigram feature distribution is,
    * where "target" is a curated exemplar domain (source `src0` stands
    * in; in production: Wikipedia/books next to a web crawl). Per
    * feature bucket b the weight is the Laplace-smoothed probability
    * RATIO p_target(b)/p_source(b); a document's score is the sum of
    * its features' weights, and it is kept when the per-feature
    * average favors the target model. The published method sums LOG
    * ratios and samples by Gumbel-top-k; logs are not engine-neutral
    * (no two libm's agree to the last ulp), so this variant keeps the
    * ratio itself in EXACT left-to-right BIGINT arithmetic — same
    * per-bucket evidence, threshold rule instead of a stochastic
    * sample, byte-reproducible across engines (the smp1/mix1 property).
    *
    * Features are DISTINCT word-bigram RK hashes per document
    * ([[graft.functions.RkShingleHashes]], the dd2 construction — so
    * the oracle replays the VALUES) folded onto DSIR_B buckets: the
    * binary-hashed-feature variant (within-doc repetition counts once),
    * which also bounds a single doc's score contribution by its length.
    *
    * Overflow envelope: counts enter as `(c+1)·1e9 DIV (n+B)` — exact
    * for per-bucket counts to ~9.2e9, i.e. ~4e13 total bigrams at
    * uniform occupancy (≫ this fixture's reach; past it, drop the e9
    * scale a decade — the conf-free choice here keeps the test-SF
    * arithmetic maximally precise).
    *
    * Scale shape (100 TB): two bucket-keyed aggregates (map-side
    * partials; ≤ DSIR_B rows out each — the weight table is FIXED-SIZE
    * model state by construction, tok2's class, so it broadcasts via
    * `guardedBroadcastKnown`), then one narrow explode→broadcast-join→
    * per-doc re-aggregate — the single doc-keyed shuffle carries one
    * partial row per (task, doc). The corpus is scanned twice (train
    * pass, score pass), never globally sorted or pair-joined. */
  def dsir1ImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    // pmod AFTER the explode: a per-element lambda inside transform()
    // evaluates interpreted (Spark higher-order functions — the dc4
    // lesson), while pmod over the exploded column stays inside
    // whole-stage codegen. Same values, same cardinality.
    val feats = docs(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(call_function("rk_shingle_hashes", words, lit(2))).as("sh"))
      .select(col("doc_id"), col("source"),
        pmod(col("sh"), lit(DSIR_B.toLong)).as("b"))
      .withColumn("tgt", col("source") === DSIR_TARGET)
    val cnt = feats.groupBy(col("b")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cs"))
    // cnt is ≤ DSIR_B rows BY CONSTRUCTION but derives from the full
    // feature scan, and two independent consumers materialize it (the
    // totals broadcast and the weight-table broadcast) — without a
    // cache that scan runs once per consumer plus once for the real
    // score join's build side. Model.fits persists it (and registers
    // it for the harness's release sweep), making its own count job
    // the ONE materialization; measured at sf10 (500k docs): warm
    // 26.4 s → 4.4 s. With broadcasting conf'd off (maxEntries=0)
    // fits declines without persisting and the plan degrades to
    // recomputation, never to a wrong answer.
    Model.fits(cnt)
    val tot = cnt.agg(sum(col("ct")).as("nt"), sum(col("cs")).as("ns"))
    val wts = cnt.crossJoin(broadcast(tot))
      .withColumn("w_e6", expr(
        s"""((((ct + 1) * 1000000000) DIV (nt + $DSIR_B)) * 1000000)
           | DIV greatest(((cs + 1) * 1000000000) DIV (ns + $DSIR_B), 1)""".stripMargin
          .replace("\n", " ")))
      .select(col("b"), col("w_e6"))
    feats.filter(!col("tgt"))
      .join(Model.guardedBroadcastKnown(wts, DSIR_B.toLong), "b")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_feat"), sum(col("w_e6")).as("score_e6"))
      .withColumn("avg_w_e6", expr("score_e6 DIV n_feat"))
      .withColumn("keep", col("avg_w_e6") >= 1000000L)
  }

  private val dsir1Oracle: String = {
    val wordFold = graft.functions.RkLsh.wordSql.replace("\n", " ")
    val mul = graft.functions.RkLsh.MUL
    val m40 = graft.functions.RkLsh.M40
    s"""WITH toksd AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |whd AS (SELECT doc_id, source, list_transform(w, wd -> $wordFold) AS hs,
       |          len(w) AS nw FROM toksd),
       |shd0 AS (SELECT doc_id, source, unnest(list_transform(range(0, greatest(nw - 2, 0) + 1),
       |           i -> list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i + 1:i + 2]),
       |                  (a, x) -> (a * $mul + x) % $m40))) AS s FROM whd),
       |shdd AS (SELECT DISTINCT doc_id, source, s FROM shd0),
       |f AS (SELECT doc_id, source, s % $DSIR_B AS b,
       |        source = '$DSIR_TARGET' AS tgt FROM shdd),
       |cnt AS (SELECT b, CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |               CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cs
       |        FROM f GROUP BY b),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cs) AS BIGINT) AS ns FROM cnt),
       |wt AS (SELECT b, ((((ct + 1) * 1000000000) // (nt + $DSIR_B)) * 1000000)
       |             // greatest(((cs + 1) * 1000000000) // (ns + $DSIR_B), 1) AS w_e6
       |       FROM cnt CROSS JOIN tot)
       |SELECT doc_id, source, n_feat, score_e6, avg_w_e6, avg_w_e6 >= 1000000 AS keep
       |FROM (SELECT f.doc_id, f.source AS source, CAST(count(*) AS BIGINT) AS n_feat,
       |        CAST(sum(w_e6) AS BIGINT) AS score_e6,
       |        CAST(sum(w_e6) AS BIGINT) // count(*) AS avg_w_e6
       |      FROM f JOIN wt USING (b) WHERE NOT tgt
       |      GROUP BY f.doc_id, f.source)""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("smp1_hash_sample", smp1HashSample, Some(smp1Oracle)),
    Q("smp2_stratified", smp2Stratified, Some(smp2Oracle)),
    Q("dc1_decontaminate", dc1Decontaminate, Some(dc1Oracle)),
    Q("dc2_fuzzy_decontaminate", dc2FuzzyDecontaminate, Some(dc2Oracle)),
    Q("dc4_bloom_decontaminate", dc4BloomDecontaminate, Some(dc4Oracle)),
    Q("dq1_group_quota", dq1GroupQuota, Some(dq1Oracle)),
    Q("pk1_pack_sequences", pk1PackSequences, Some(pk1Oracle)),
    Q("pk2_pack_manifest", pk2PackManifest, Some(pk2Oracle)),
    Q("shf1_corpus_shuffle", shf1Shuffle, Some(shf1Oracle)),
    Q("sc1_pii_scrub", sc1PiiScrub, Some(sc1Oracle)),
    Q("cur1_curation_e2e", cur1CurationE2e, Some(cur1Oracle)),
    Q("cur2_curation_neardup", cur2CurationNearDup, Some(cur2Oracle)),
    Q("src1_source_prior", src1SourcePrior, Some(src1Oracle)),
    Q("mix1_mixture_sample", mix1MixtureSample, Some(mix1Oracle)),
    Q("dsir1_importance_weights", dsir1ImportanceWeights, Some(dsir1Oracle)))
}
