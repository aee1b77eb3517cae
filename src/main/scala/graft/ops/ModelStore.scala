package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
  *   ivf_centroids/ (cell, c: array<bigint>)         — K×64 grid longs
  *   pq_books/      (s, p, c: array<bigint>)         — 8×16 codebooks
  * Everything driver-held is model-sized by the registries' own
  * arguments; `bpe_subs` is the one vocabulary-sized table and writes
  * distributed. The flat-IVF export refuses the two-level regime (its
  * fine model is a distributed training artifact — at that scale
  * snapshot the assigned corpus, which is a write-time bucketing
  * column anyway).
  *
  * Loading installs into the registries under the CURRENT session
  * confs, so a model trained under forced sizing confs cannot be
  * served under defaults ([[Similarity]]'s conf-keyed cache). Training
  * determinism makes save→load→serve bit-identical to
  * train-in-process — ModelStoreSpec pins round-trip equality for
  * tok4 and sim6 with the training jobs gone. */
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

  /** Train (or reuse) the flat IVF quantizer + unit-grid PQ codebooks
    * for `corpusDir` under the current confs and persist them. */
  def saveIvfPq(spark: SparkSession, corpusDir: String, modelDir: String): Unit = {
    val centroids = Similarity.exportFlatIvf(spark, corpusDir)
    val books = Similarity.exportUnitPqBooks(spark, corpusDir)
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq
      .toDF("cell", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$modelDir/ivf_centroids")
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, p) => (s, p, c.toSeq) }
    }.toSeq.toDF("s", "p", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$modelDir/pq_books")
  }

  /** Load stored IVF/PQ models and register them for `corpusDir` under
    * the current confs. */
  def loadIvfPq(spark: SparkSession, corpusDir: String, modelDir: String): Unit = {
    val centroids = spark.read.parquet(s"$modelDir/ivf_centroids")
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Long](1))
    Similarity.installFlatIvf(spark, corpusDir, centroids)
    val rows = spark.read.parquet(s"$modelDir/pq_books").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Long](2).toArray)).toMap
    val nS = rows.keys.map(_._1).max + 1
    val nP = rows.keys.map(_._2).max + 1
    val books = Array.tabulate(nS, nP)((s, p) => rows((s, p)))
    Similarity.installUnitPqBooks(corpusDir, books)
  }
}
