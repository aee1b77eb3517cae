package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev-only probe. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    // hamming distance between simhashes of the strongest near-dup pairs
    val docs = Tables.documents(spark, sf)
    val words = split(col("text"), " ")
    val whash = docs.select(col("doc_id"), explode(words).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val sim = whash
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 63), b -> CAST(shiftright(h, b) & 1 AS INT) * 2 - 1)")))
      .withColumnRenamed("pos", "bit").withColumnRenamed("col", "vote")
      .groupBy(col("doc_id"), col("bit")).agg(sum(col("vote")).as("v"))
      .withColumn("bitval", expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END"))
      .groupBy(col("doc_id")).agg(sum(col("bitval")).as("simhash"))
    val pairs = Seq((0L,50L),(5L,450L),(50L,82L),(328L,428L),(12L,120L),(89L,114L),(306L,387L))
    val m = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a,b) =>
      println(s"pair ($a,$b) hamming = ${java.lang.Long.bitCount(m(a) ^ m(b))}")
    }
    spark.stop()
  }
}
