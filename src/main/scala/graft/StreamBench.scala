package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.{ModelStore, Similarity}
import graft.streaming.{AnnServeStream, DedupStream, SemanticDedupStream}

/** Measures the streaming legs at scale on the RocksDB state store —
  * the three numbers the MemoryStream specs cannot give: sustained
  * ROWS/S over a replayed corpus, STATE SIZE (rows + bytes, RocksDB
  * SST footprint) after the corpus has streamed through, and
  * RECOVERY TIME across a checkpointed mid-stream restart (a fresh
  * query instance re-opening the same checkpoint, i.e. the
  * executor-loss / redeploy path).
  *
  * Protocol per leg: the input table is written as 16 parquet files
  * into a staging dir; 8 move into the watched source dir and stream
  * through (throughput + state measured there); the query STOPS
  * mid-stream; one more file moves in and a NEW query instance on the
  * same checkpoint times its first batch (recovery = state reload +
  * one steady-state batch — reported next to the pre-stop mean batch
  * for comparison); the remaining 7 then stream through the restarted
  * query (post-restart throughput, loss/duplication visible in row
  * counts). Output: one `[streambench]` line per measurement and a
  * final JSON artifact line.
  *
  * Legs:
  *  - `dedup`     [[DedupStream.nearDupPairs]] over documents —
  *                MinHash-banded keyed state (bucket member lists)
  *  - `semdedup`  [[SemanticDedupStream.verdicts]] over embeddings —
  *                per-cell member state under the offline flat model
  *  - `annserve`  [[AnnServeStream]] over query vectors vs the
  *                ModelStore-loaded IVF-PQ index — stateless
  *                foreachBatch (state = the index, in the registry),
  *                so its "state" numbers are ~0 by design and recovery
  *                is checkpoint batch-id replay only
  *
  * Usage: runMain graft.StreamBench <sfDir> <leg|all> [workDir]
  * (workDir holds staging/source/checkpoint dirs and the trained
  * models; reusing one skips the model training setup). */
object StreamBench {

  private final case class LegResult(
      leg: String, rows: Long, outRows: Long, wallS: Double,
      rowsPerS: Double, meanBatchS: Double, recoveryS: Double,
      stateRows: Long, stateMemBytes: Long, rocksdbSstBytes: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val leg = args(1)
    val work = if (args.length > 2) args(2)
      else Files.createTempDirectory("graft_streambench_").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "256k")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val legs = if (leg == "all") Seq("dedup", "semdedup", "annserve") else Seq(leg)
    val results = legs.map {
      case "dedup" => runDedup(spark, sfDir, s"$work/dedup")
      case "semdedup" => runSemDedup(spark, sfDir, s"$work/semdedup")
      case "annserve" => runAnnServe(spark, sfDir, s"$work/annserve")
      case other => sys.error(s"unknown leg '$other' (dedup|semdedup|annserve|all)")
    }
    val js = results.map(r =>
      s"""{"leg":"${r.leg}","rows":${r.rows},"out_rows":${r.outRows},""" +
        s""""wall_s":${f"${r.wallS}%.2f"},"rows_per_s":${f"${r.rowsPerS}%.0f"},""" +
        s""""mean_batch_s":${f"${r.meanBatchS}%.3f"},"recovery_s":${f"${r.recoveryS}%.2f"},""" +
        s""""state_rows":${r.stateRows},"state_mem_bytes":${r.stateMemBytes},""" +
        s""""rocksdb_sst_bytes":${r.rocksdbSstBytes}}""").mkString("[", ",", "]")
    println(s"""{"streambench":"$sfDir","legs":$js}""")
    spark.stop()
  }

  // ---- shared replay machinery -------------------------------------

  /** write `df` as exactly 16 parquet files under staging/ and return
    * (staging file list, watched source dir) */
  private def stage(df: DataFrame, work: String): (Seq[Path], String) = {
    val staging = s"$work/staging"
    val src = s"$work/src"
    df.repartition(16).write.mode("overwrite").parquet(staging)
    Files.createDirectories(Paths.get(src))
    val files = java.nio.file.Files.list(Paths.get(staging)).toArray
      .map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.endsWith(".parquet")).sorted.toSeq
    (files, src)
  }

  private def moveIn(files: Seq[Path], src: String): Unit =
    files.foreach { f =>
      Files.move(f, Paths.get(src, f.getFileName.toString),
        StandardCopyOption.ATOMIC_MOVE)
      ()
    }

  /** drain everything currently in the source, returning (wall s,
    * input rows, mean batch s) from the engine's own progress log */
  private def drain(q: StreamingQuery): (Double, Long, Double) = {
    val before = q.recentProgress.map(_.batchId).toSet
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val newP = q.recentProgress.filterNot(p => before(p.batchId))
      .filter(_.numInputRows > 0)
    val rows = newP.map(_.numInputRows).sum
    val batchS =
      if (newP.isEmpty) 0.0
      else newP.map(_.durationMs.get("triggerExecution").toDouble).sum /
        newP.length / 1000.0
    (wall, rows, batchS)
  }

  /** final state-operator totals from the last progress that has any */
  private def stateOf(q: StreamingQuery): (Long, Long, Long) = {
    val ops = q.recentProgress.reverse.map(_.stateOperators)
      .find(_.nonEmpty).getOrElse(Array.empty)
    val rows = ops.map(_.numRowsTotal).sum
    val mem = ops.map(_.memoryUsedBytes).sum
    val sst = ops.map { op =>
      Option(op.customMetrics.get("rocksdbSstFileSize"))
        .map(_.longValue).getOrElse(0L)
    }.sum
    (rows, mem, sst)
  }

  /** the shared protocol: 8 files → measure → stop → +1 file under a
    * NEW query (recovery) → +7 files → totals */
  private def protocol(leg: String, files: Seq[Path], src: String,
      start: () => StreamingQuery, outRows: () => Long): LegResult = {
    moveIn(files.take(8), src)
    val q1 = start()
    val (wall1, rows1, batch1) = try drain(q1) finally ()
    val (sRows1, sMem1, sSst1) = stateOf(q1)
    q1.stop()
    println(f"[streambench] $leg first-half: $rows1 rows in $wall1%.2f s " +
      f"(${rows1 / math.max(wall1, 1e-9)}%.0f rows/s, mean batch $batch1%.3f s); " +
      s"state rows=$sRows1 mem=$sMem1 sst=$sSst1")

    moveIn(files.slice(8, 9), src)
    val q2 = start()
    val t0 = System.nanoTime()
    q2.processAllAvailable()
    val recovery = (System.nanoTime() - t0) / 1e9
    println(f"[streambench] $leg recovery (restart + 1-file batch): $recovery%.2f s " +
      f"vs pre-stop mean batch $batch1%.3f s")

    moveIn(files.drop(9), src)
    val (wall2, rows2, batch2) = drain(q2)
    val (sRows, sMem, sSst) = stateOf(q2)
    q2.stop()
    // rows accounting: q2's progress log covers the recovery batch AND
    // the second half — q1's covers the first half
    val total = rows1 + q2.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).sum
    val wall = wall1 + recovery + wall2
    val res = LegResult(leg, total, outRows(), wall,
      total / math.max(wall, 1e-9), (batch1 + batch2) / 2, recovery,
      sRows, sMem, sSst)
    println(f"[streambench] $leg TOTAL: ${res.rows} rows → ${res.outRows} out " +
      f"in ${res.wallS}%.2f s = ${res.rowsPerS}%.0f rows/s; " +
      s"final state rows=${res.stateRows} mem=${res.stateMemBytes} " +
      s"sst=${res.rocksdbSstBytes}")
    res
  }

  // ---- legs ---------------------------------------------------------

  private def runDedup(spark: SparkSession, sfDir: String, work: String): LegResult = {
    val (files, src) = stage(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), work)
    val out = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = DedupStream.nearDupPairs(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(src))
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[DedupStream.DupPair], _: Long) =>
        out.addAndGet(b.count()); ()
      }
      .start()
    protocol("dedup", files, src, () => start(), () => out.get())
  }

  private def runSemDedup(spark: SparkSession, sfDir: String, work: String): LegResult = {
    // offline model (untimed setup — the deployment trains this once)
    val centroids = Similarity.flatCentroids(spark, sfDir)
    val (files, src) = stage(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")), work)
    val out = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = SemanticDedupStream.verdicts(
      spark.readStream.schema("vec_id LONG, v ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(src),
      centroids)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SemanticDedupStream.SemVerdict], _: Long) =>
        out.addAndGet(b.count()); ()
      }
      .start()
    protocol("semdedup", files, src, () => start(), () => out.get())
  }

  private def runAnnServe(spark: SparkSession, sfDir: String, work: String): LegResult = {
    // offline: train + persist once per workDir, load into the registry
    val modelDir = s"$work/models"
    if (!Files.exists(Paths.get(modelDir, "ivf_meta"))) {
      Similarity.resetModelRegistry()
      ModelStore.saveIvfPq(spark, sfDir, modelDir)
    }
    Similarity.resetModelRegistry()
    ModelStore.loadIvfPq(spark, sfDir, modelDir)
    // query stream: 2000 corpus vectors as external (qid, v) requests
    val (files, src) = stage(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 2000)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("v")), work)
    val out = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = AnnServeStream.serve(
      spark.readStream.schema("qid LONG, v ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(src),
      sfDir, 10, s"$work/ckpt") { (_, hits) =>
      out.addAndGet(hits.count()); ()
    }
    protocol("annserve", files, src, () => start(), () => out.get())
  }
}
