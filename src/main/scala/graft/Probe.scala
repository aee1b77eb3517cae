package graft
import org.apache.spark.sql.SparkSession
/** Dev-only probe: schema + timestamp handling sanity checks. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.printSchema()
    val ev = raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    ev.show(3, false)
    ev.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s")).show(3, false)
    ev.groupBy(window(col("ts"), "4 hours", "1 hour"), col("user_id"))
      .count().filter(col("count") === 5).show(3, false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    spark.stop()
  }
}
