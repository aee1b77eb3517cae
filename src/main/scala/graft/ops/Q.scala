package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query plus (when SQL-expressible) a
  * DuckDB oracle over the same tables. Conventions that keep the driver's
  * column-sorted value-hash compare stable across engines:
  *   - every computed double is `round(x, 6)` on BOTH sides;
  *   - every timestamp output column is formatted to a string on BOTH
  *     sides (`Fmt.SEC`/`Fmt.MICRO` vs strftime `%Y-%m-%d %H:%M:%S[.%f]`);
  *   - DuckDB integer SUMs are cast to BIGINT (DuckDB widens to HUGEINT);
  *   - identical output column names on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Fmt {
  val SEC = "yyyy-MM-dd HH:mm:ss"
  val MICRO = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  val DUCK_SEC = "%Y-%m-%d %H:%M:%S"
  val DUCK_MICRO = "%Y-%m-%d %H:%M:%S.%f"
}
