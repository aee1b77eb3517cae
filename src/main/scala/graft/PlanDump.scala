package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tool: dump the formatted (pre-execution) plan of
  * every registry query to one file per query, for plan-diff evidence
  * (plans/r13/<query>_before.txt / _after.txt). Analysis only — nothing
  * executes except model training that plan CONSTRUCTION itself
  * requires (BPE/IVF registries train at first consumer, as in Bench).
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "256k") // match Bench
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(out.resolve(s"$name.txt"), plan)
        graft.ops.Model.release()
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
