package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
import graft.ops.ModelStore

/** Measures the offline-train / online-serve split the model
  * lifecycle ([[graft.ops.ModelStore]]) exists for: `train` mode runs
  * the expensive loops once and persists the artifacts; `serve` mode —
  * a FRESH JVM, the point — loads them and runs the model-consuming
  * queries paying only their own scans. The delta against the same
  * queries' train-in-query sweep numbers is the amortization a
  * 1000-session serving fleet banks per session at 100 TB.
  *
  * Usage:
  *   runMain graft.ServeBench <sfDir> <modelDir> train
  *   runMain graft.ServeBench <sfDir> <modelDir> serve [q1,q2,...]
  * Output: one `[servebench]` line per step/query with seconds, plus a
  * final JSON line for the artifact. */
object ServeBench {

  private def consume(df: org.apache.spark.sql.DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(bit_xor(col("h"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val (dir, modelDir, mode) = (args(0), args(1), args(2))
    val names =
      if (args.length > 3) args(3).split(",").toSeq
      else Seq("sim6_ivfpq", "knn2_label_knn_ivfpq", "ir3_hybrid_rrf_ivfpq",
        "tok4_bpe_encode", "dd7_semantic_dedup")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "256k") // match Bench
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val timed = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time[A](label: String)(body: => A): A = {
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      timed(label) = dt
      println(f"[servebench] $label ${dt}%.2f s")
      r
    }

    mode match {
      case "train" =>
        time("train_bpe") { ModelStore.saveBpe(spark, dir, modelDir) }
        time("train_ivfpq") { ModelStore.saveIvfPq(spark, dir, modelDir) }
      case "serve" =>
        // a fresh JVM's registries are empty — everything below serves
        // from the store or fails loudly (loadIvfPq's metadata gate)
        time("load_bpe") { ModelStore.loadBpe(spark, dir, modelDir) }
        time("load_ivfpq") { ModelStore.loadIvfPq(spark, dir, modelDir) }
        for (n <- names) {
          time(n) { consume(SparkEntry.queries(n)(spark, dir)) }
          graft.ops.Model.release()
        }
      case other => sys.error(s"unknown mode '$other' (train|serve)")
    }
    val qs = timed.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"servebench":"$mode","sf":"$dir","times":$qs}""")
    spark.stop()
  }
}
