package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Durable storage for the engine's learned models — the piece that
  * turns the in-process registries ([[TextOps]]' BPE model,
  * [[Similarity]]'s IVF/PQ quantizers) into the real deployment cycle
  * at 100 TB: a TRAINING job runs the expensive loops once over a
  * corpus snapshot and persists the artifacts; every SERVING job —
  * batch encode/search sweeps, the streaming tokenize/semantic-dedup
  * legs, a 1000-session cluster — loads them in seconds and pays only
  * its own assignment/probe scans, never the training.
  *
  * Artifacts are plain parquet (no custom serialization — readable by
  * any engine, survivable across Spark versions, diffable):
  *   bpe_merges/    (step, lft, rgt, merged, freq)   — the tok3 table
  *   bpe_subs/      (wd, n_sub)                      — vocabulary-sized
  *   ivf_meta/      one row: training confs + corpus fingerprint + regime
  *   ivf_centroids/ (cell, c: array<bigint>)         — flat: K×64 grid longs
  *   ivf_coarse/    (cell1, c: array<bigint>)        — two-level: K1 coarse
  *   ivf_fine/      (cell1, mat: array<array<double>>) — two-level fine
  *                  matrix, a DISTRIBUTED table written distributed
  *                  (the `bpe_subs` pattern — never collected)
  *   pq_books/      (s, p, c: array<bigint>)         — 8×16 codebooks
  * Everything driver-held is model-sized by the registries' own
  * arguments; `bpe_subs` and `ivf_fine` are the distributed tables.
  * Both IVF regimes persist — at 100 TB two-level is the ONLY regime,
  * so the fine model exports as parquet rather than refusing.
  *
  * A model is only valid for the exact training conditions, so
  * `ivf_meta` records the sizing confs ([[Similarity.TargetCellConf]],
  * [[Similarity.MaxKConf]], [[Similarity.FlatMaxKConf]]) and a corpus
  * fingerprint (the embedding
  * count) at SAVE time, and [[loadIvfPq]] fails loudly when the
  * serving session's confs or corpus differ — a model trained under
  * forced sizing confs cannot be silently served under defaults (or
  * against a different corpus) where sim3/sim6/dd7 would return
  * results that differ from in-process training. Training determinism
  * then makes save→load→serve bit-identical to train-in-process —
  * ModelStoreSpec pins round-trip equality for tok4 and sim6 (both
  * regimes) with the training jobs gone. */
object ModelStore {

  /** Train (or reuse) the BPE tokenizer for `corpusDir` and persist it
    * under `modelDir`. */
  def saveBpe(spark: SparkSession, corpusDir: String, modelDir: String): Unit = {
    val (merges, subs) = TextOps.exportBpeModel(spark, corpusDir)
    import spark.implicits._
    merges.toDF("step", "lft", "rgt", "merged", "freq")
      .coalesce(1) // BPE_MERGES rows — one file
      .write.mode("overwrite").parquet(s"$modelDir/bpe_merges")
    subs.write.mode("overwrite").parquet(s"$modelDir/bpe_subs")
  }

  /** Load a stored BPE tokenizer and register it for `corpusDir`. */
  def loadBpe(spark: SparkSession, corpusDir: String, modelDir: String): Unit = {
    val merges = spark.read.parquet(s"$modelDir/bpe_merges")
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val subs = spark.read.parquet(s"$modelDir/bpe_subs")
      .select(col("wd"), col("n_sub"))
    TextOps.installBpeModel(corpusDir, merges, subs)
  }

  private def confOr(spark: SparkSession, key: String): String =
    spark.conf.getOption(key).getOrElse("")

  /** Train (or reuse) the IVF quantizer (either regime) + unit-grid PQ
    * codebooks for `corpusDir` under the current confs and persist
    * them with their training metadata. */
  def saveIvfPq(spark: SparkSession, corpusDir: String, modelDir: String): Unit = {
    import spark.implicits._
    val (regime, k1, k2) = Similarity.exportIvf(spark, corpusDir) match {
      case Similarity.FlatIvfExport(centroids) =>
        centroids.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }.toSeq
          .toDF("cell", "c").coalesce(1)
          .write.mode("overwrite").parquet(s"$modelDir/ivf_centroids")
        ("flat", centroids.length, 0)
      case Similarity.TwoLevelIvfExport(k1, k2, coarse, mat) =>
        coarse.zipWithIndex
          .map { case (c, i) => (i.toLong, c) }.toSeq
          .toDF("cell1", "c").coalesce(1)
          .write.mode("overwrite").parquet(s"$modelDir/ivf_coarse")
        // the fine model writes DISTRIBUTED — K1 rows of K2×64
        // matrices, partitionable like any table
        mat.write.mode("overwrite").parquet(s"$modelDir/ivf_fine")
        ("two_level", k1, k2)
    }
    val books = Similarity.exportUnitPqBooks(spark, corpusDir)
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, p) => (s, p, c.toSeq) }
    }.toSeq.toDF("s", "p", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$modelDir/pq_books")
    // training metadata: the sizing confs the trainer read and the
    // corpus fingerprint. Row count alone is too weak — a regenerated
    // corpus with the same cardinality would serve silently against a
    // stale quantizer — so the fingerprint also records the vec_id
    // range and an order-free xxhash64 over a deterministic 1-in-997
    // sample of (vec_id, embedding). One aggregate scan at save AND at
    // load: at 100 TB that load-time scan is the price of refusing to
    // serve a model against a corpus it was never trained on (and it
    // is a projection of two columns, a fraction of any serve sweep).
    val fp = corpusFingerprint(spark, corpusDir)
    Seq((confOr(spark, Similarity.TargetCellConf),
        confOr(spark, Similarity.MaxKConf),
        confOr(spark, Similarity.FlatMaxKConf),
        fp.n, regime, k1, k2, fp.minId, fp.maxId, fp.sampleHash))
      .toDF("target_cell", "max_k", "flat_max_k", "n_vecs", "regime",
        "k1", "k2", "min_id", "max_id", "sample_hash")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelDir/ivf_meta")
  }

  private case class Fingerprint(n: Long, minId: Long, maxId: Long,
      sampleHash: Long)

  /** One-pass corpus fingerprint: count + vec_id range + bit_xor of
    * xxhash64(vec_id, embedding) over the deterministic 1-in-997
    * sample. bit_xor makes the hash partitioning- and order-free, so
    * save and load agree however the scan parallelizes. */
  private def corpusFingerprint(spark: SparkSession,
      corpusDir: String): Fingerprint = {
    val r = Tables.embeddings(spark, corpusDir)
      .agg(count(lit(1)).as("n"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"),
        coalesce(bit_xor(when(pmod(col("vec_id"), lit(997)) === 0,
          xxhash64(col("vec_id"), col("embedding")))), lit(0L)).as("h"))
      .collect().head
    // an empty corpus leaves min/max NULL — getLong would NPE with no
    // hint at the cause; refuse with the actual problem named
    if (r.getLong(0) == 0L || r.isNullAt(1) || r.isNullAt(2))
      throw new IllegalStateException(
        s"corpusFingerprint: embeddings corpus at '$corpusDir' is empty — " +
          "nothing to fingerprint (save/load needs a non-empty corpus)")
    Fingerprint(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** The allowed corpus-growth fraction for [[loadIvfPqDelta]] before
    * a full retrain is forced — the staleness bound: centroids and
    * codebooks trained on N vectors keep serving appended vectors well
    * while the append is a small fraction of N (the quantizer's cell
    * geometry is a property of the distribution, not the rows), but an
    * index serving 2× its training corpus is a different index. */
  val MaxStaleGrowthConf = "graft.ivf.maxStaleGrowth"
  private val DefaultMaxStaleGrowth = 0.25

  /** Load stored IVF/PQ models and register them for `corpusDir` under
    * the current confs. Fails loudly when the serving session's sizing
    * confs or the corpus fingerprint differ from training — serving a
    * model outside its training conditions would silently change
    * sim3/sim6/dd7 results vs in-process training. */
  def loadIvfPq(spark: SparkSession, corpusDir: String, modelDir: String): Unit = {
    val meta = spark.read.parquet(s"$modelDir/ivf_meta").collect().head
    checkConfs(spark, modelDir, meta, "loadIvfPq")
    val nVecs = meta.getAs[Long]("n_vecs")
    val cur = corpusFingerprint(spark, corpusDir)
    if (nVecs != cur.n) throw new IllegalStateException(
      s"loadIvfPq: model at $modelDir was trained over a corpus of " +
        s"$nVecs embeddings but $corpusDir has ${cur.n} — this is a " +
        "different corpus; point at the training snapshot, use " +
        "loadIvfPqDelta for a bounded append, or retrain")
    // the stronger fingerprint legs (vec_id range + sampled content
    // hash): equal cardinality is NOT equal corpus — a regenerated
    // corpus must refuse, not serve sim3/sim6/dd7 off a stale quantizer
    if (meta.schema.fieldNames.contains("sample_hash")) {
      val (mn, mx, h) = (meta.getAs[Long]("min_id"),
        meta.getAs[Long]("max_id"), meta.getAs[Long]("sample_hash"))
      if (mn != cur.minId || mx != cur.maxId || h != cur.sampleHash)
        throw new IllegalStateException(
          s"loadIvfPq: corpus at $corpusDir has the trained cardinality " +
            s"but a different fingerprint (ids [$mn,$mx]→[${cur.minId}," +
            s"${cur.maxId}], sample hash $h→${cur.sampleHash}) — the " +
            "content changed; point at the training snapshot, or retrain")
    }
    installIvfPq(spark, corpusDir, modelDir, meta)
  }

  /** DELTA load: serve a GROWN corpus off the stored model — the
    * continuous-append reality at 100 TB, where the strict gate's
    * "retrain" answer is the most expensive job in the system. The
    * appended vectors need no new machinery: cell assignment and PQ
    * coding already run over the full corpus at serve time, so new
    * vectors simply land in existing cells/codes. What delta load adds
    * is the SAFETY the strict gate provided, rebuilt for appends:
    *
    *  - PREFIX CHECK: the current corpus restricted to the trained
    *    vec_id range must reproduce the training fingerprint exactly
    *    (count + id range + sampled content hash, one aggregate scan)
    *    — "grown" means appended-to, never edited-in-place; a mutated
    *    prefix still refuses.
    *  - STALENESS BOUND: the append fraction must stay under
    *    [[MaxStaleGrowthConf]] (default 25%) — past it the stored
    *    centroids describe a different distribution and the caller is
    *    told to retrain. The bound is the re-train trigger: a serving
    *    fleet calls delta load until it trips, then schedules one
    *    training job.
    *
    * Serving off a stale-but-bounded quantizer is APPROXIMATE relative
    * to a full retrain on the grown corpus — that is the explicit
    * trade (AnnDeltaSpec pins top-k recall against the retrained index
    * at a 10% append). Requires a model saved with the fingerprint
    * legs (legacy metas cannot prove the prefix — refuse). */
  def loadIvfPqDelta(spark: SparkSession, corpusDir: String,
      modelDir: String): Unit = {
    val meta = spark.read.parquet(s"$modelDir/ivf_meta").collect().head
    checkConfs(spark, modelDir, meta, "loadIvfPqDelta")
    if (!meta.schema.fieldNames.contains("sample_hash"))
      throw new IllegalStateException(
        s"loadIvfPqDelta: model at $modelDir predates the prefix " +
          "fingerprint — an append cannot be verified; retrain (and " +
          "re-save) on a current snapshot")
    val (nVecs, mn, mx, h) = (meta.getAs[Long]("n_vecs"),
      meta.getAs[Long]("min_id"), meta.getAs[Long]("max_id"),
      meta.getAs[Long]("sample_hash"))
    val (prefix, total) = prefixFingerprint(spark, corpusDir, mx)
    if (prefix.n != nVecs || prefix.minId != mn || prefix.maxId != mx ||
        prefix.sampleHash != h)
      throw new IllegalStateException(
        s"loadIvfPqDelta: corpus at $corpusDir is not an append of the " +
          s"training snapshot — within trained ids [$mn,$mx] it has " +
          s"${prefix.n} rows (trained $nVecs), ids [${prefix.minId}," +
          s"${prefix.maxId}], sample hash ${prefix.sampleHash} (trained " +
          s"$h); the trained prefix was edited — retrain")
    val growth = (total - nVecs).toDouble / nVecs
    val maxGrowth = spark.conf.getOption(MaxStaleGrowthConf)
      .map(_.toDouble).getOrElse(DefaultMaxStaleGrowth)
    if (growth > maxGrowth) throw new IllegalStateException(
      f"loadIvfPqDelta: corpus grew ${growth * 100}%.1f%% past the " +
        f"staleness bound (${maxGrowth * 100}%.1f%%, $MaxStaleGrowthConf)" +
        s" — $total vs $nVecs trained; the stored quantizer no longer " +
        "describes this distribution: retrain")
    installIvfPq(spark, corpusDir, modelDir, meta)
  }

  private def checkConfs(spark: SparkSession, modelDir: String,
      meta: org.apache.spark.sql.Row, who: String): Unit = {
    val (tc, mk) = (meta.getAs[String]("target_cell"), meta.getAs[String]("max_k"))
    // models saved before the flat-cost threshold existed dispatched on
    // maxK alone — their effective flat cap IS the recorded max_k
    val fmk = if (meta.schema.fieldNames.contains("flat_max_k"))
      meta.getAs[String]("flat_max_k") else mk
    val (curTc, curMk, curFmk) = (confOr(spark, Similarity.TargetCellConf),
      confOr(spark, Similarity.MaxKConf),
      confOr(spark, Similarity.FlatMaxKConf))
    if (tc != curTc || mk != curMk || fmk != curFmk)
      throw new IllegalStateException(
        s"$who: model at $modelDir was trained under sizing confs " +
          s"(targetCell='$tc', maxK='$mk', flatMaxK='$fmk') but the " +
          s"serving session has ('$curTc', '$curMk', '$curFmk') — " +
          "serving would differ from in-process training; set the " +
          "confs to match, or retrain")
  }

  /** one-scan append check: the fingerprint of the corpus restricted
    * to the trained id range, plus the total row count */
  private def prefixFingerprint(spark: SparkSession, corpusDir: String,
      trainedMax: Long): (Fingerprint, Long) = {
    val in = col("vec_id") <= trainedMax
    val r = Tables.embeddings(spark, corpusDir)
      .agg(count(when(in, lit(1))).as("n"),
        min(when(in, col("vec_id"))).as("min_id"),
        max(when(in, col("vec_id"))).as("max_id"),
        coalesce(bit_xor(when(in && pmod(col("vec_id"), lit(997)) === 0,
          xxhash64(col("vec_id"), col("embedding")))), lit(0L)).as("h"),
        count(lit(1)).as("total"))
      .collect().head
    // an empty trained-id prefix (every vec_id > trainedMax, or an
    // empty corpus) leaves min/max NULL — name the refusal instead of
    // an opaque NPE from getLong
    if (r.getLong(0) == 0L || r.isNullAt(1) || r.isNullAt(2))
      throw new IllegalStateException(
        s"prefixFingerprint: no vectors with vec_id <= $trainedMax in " +
          s"'$corpusDir' — the trained prefix is absent from this corpus")
    (Fingerprint(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
      r.getLong(4))
  }

  /** the shared install tail: register whichever IVF regime the meta
    * records, then the PQ codebooks, all keyed to `corpusDir` */
  private def installIvfPq(spark: SparkSession, corpusDir: String,
      modelDir: String, meta: org.apache.spark.sql.Row): Unit = {
    meta.getAs[String]("regime") match {
      case "flat" =>
        val centroids = spark.read.parquet(s"$modelDir/ivf_centroids")
          .orderBy(col("cell")).collect()
          .map(_.getSeq[Long](1))
        Similarity.installFlatIvf(spark, corpusDir, centroids)
      case "two_level" =>
        val coarse = spark.read.parquet(s"$modelDir/ivf_coarse")
          .orderBy(col("cell1")).collect()
          .map(_.getSeq[Long](1))
        val mat = spark.read.parquet(s"$modelDir/ivf_fine")
        Similarity.installTwoLevelIvf(spark, corpusDir,
          meta.getAs[Int]("k1"), meta.getAs[Int]("k2"), coarse, mat)
      case other => throw new IllegalStateException(
        s"loadIvfPq: unknown regime '$other' in $modelDir/ivf_meta")
    }
    val rows = spark.read.parquet(s"$modelDir/pq_books").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Long](2).toArray)).toMap
    val nS = rows.keys.map(_._1).max + 1
    val nP = rows.keys.map(_._2).max + 1
    val books = Array.tabulate(nS, nP)((s, p) => rows((s, p)))
    Similarity.installUnitPqBooks(corpusDir, books)
  }
}
