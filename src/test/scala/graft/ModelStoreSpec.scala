package graft

import java.nio.file.Files
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ModelStore, Similarity, TextOps}

/** ModelStore round-trips: save a trained model, wipe the in-process
  * registries (a new serving session), load, and serve — results must
  * be bit-identical to training in-process (training is deterministic,
  * the artifacts are exact integers/strings in parquet), and the
  * serving queries must run WITHOUT the training jobs (the entire
  * point of the store). */
class ModelStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def jobsDuring(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1; var cur = n.get(); var spins = 0
      while (cur != prev && spins < 50) {
        Thread.sleep(200); prev = cur; cur = n.get(); spins += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("BPE model round-trips: load serves tok4 identically, no retraining") {
    val store = Files.createTempDirectory("graft_models_").toString
    TextOps.resetModelRegistry()
    val trained = rows(TextOps.tok4BpeEncode(spark, sf))
    graft.ops.Model.release()
    ModelStore.saveBpe(spark, sf, store)

    TextOps.resetModelRegistry() // a fresh serving session
    ModelStore.loadBpe(spark, sf, store)
    var served: Seq[String] = null
    val serveJobs = jobsDuring { served = rows(TextOps.tok4BpeEncode(spark, sf)) }
    graft.ops.Model.release()
    assert(served === trained)
    // a cold tok4 runs 1 (word count) + 8x2-ish training jobs before
    // the encode; served-from-store must be encode-only
    assert(serveJobs <= 4,
      s"expected a stored model to serve without training jobs, ran $serveJobs")
  }

  test("IVF/PQ models round-trip: load serves sim6 identically, no retraining") {
    val store = Files.createTempDirectory("graft_models_").toString
    Similarity.resetModelRegistry()
    val trained = rows(Similarity.sim6IvfPqTopK(spark, sf))
    ModelStore.saveIvfPq(spark, sf, store)

    Similarity.resetModelRegistry() // a fresh serving session
    ModelStore.loadIvfPq(spark, sf, store)
    var served: Seq[String] = null
    val serveJobs = jobsDuring { served = rows(Similarity.sim6IvfPqTopK(spark, sf)) }
    Similarity.resetModelRegistry()
    assert(served === trained)
    // in-process cold sim6 ran ~10+ training jobs (Lloyd + PQ iters +
    // sample counts) before the search's own handful
    assert(serveJobs <= 6,
      s"expected stored models to serve without training jobs, ran $serveJobs")
  }
}
