package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
object Bench {

  /** Consume a query result in a way that forces EVERY output column to
    * be computed: hash the full row struct and sum the hashes. A bare
    * `count()` lets Catalyst prune unreferenced columns, so
    * projection-only queries (p1, f11, f12, ta3, …) would be timed with
    * the very expressions they exercise optimized away. bit_xor (not
    * sum) folds the hashes: ANSI mode makes a sum of 64-bit hashes
    * overflow. */
  private def consume(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(bit_xor(col("h"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/parquet-footer caches so the first timed
    // query doesn't absorb session startup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("p1_project").foreach(fn => consume(fn(spark, sfDir)))
    } catch { case _: Throwable => () }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { consume(fn(spark, sfDir)); true }
        catch {
          case e: Throwable =>
            // record the failure loudly — a swallowed exception would read
            // as a near-zero (i.e. improved) time in the bench line
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed ::= name
            false
        }
      // failed queries report -1 and are excluded from the total, so the
      // aggregate never mixes real runtimes with time-to-failure
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
