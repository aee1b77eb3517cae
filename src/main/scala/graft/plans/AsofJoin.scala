package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of (temporal backward) join — the whole-operator custom
  * plan node of this library (design-preference rung (c): a semantics
  * Spark's built-ins can only approximate by expansion).
  *
  * Semantics: for every left row, the single right row with equal keys
  * and the greatest `rightTime <= leftTime`, ties broken by the
  * greatest `rightTieBreak`; unmatched left rows drop (or null-pad
  * with `leftOuter`). Null keys/times never match, consistent with SQL
  * equi-joins. This is the reference aj1 semantics (latest order
  * at-or-before each event) as ONE operator: the compositional form
  * joins every event to its ENTIRE order history and ranks it away
  * (`row_number`/`max_by` over an O(orders-per-key) expansion);
  * [[AsofJoinExec]] never materializes the expansion at all.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    leftOuter: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** Column-name builder: resolves against the inputs' analyzed plans,
    * so the node enters the analyzer fully resolved. Key and time
    * columns must be pairwise type-identical (cast beforehand) — the
    * merge compares them with one natural ordering per pair. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String] = Nil,
      leftOuter: Boolean = false): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def res(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val (lk, rk) = (res(lp, leftKey), res(rp, rightKey))
    val (lt, rt) = (res(lp, leftTime), res(rp, rightTime))
    require(lk.dataType == rk.dataType,
      s"asof join: key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"asof join: time types differ: ${lt.dataType} vs ${rt.dataType}")
    val spark = SparkSession.active
    GraftExtensions.install(spark)
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsofJoin(lp, rp, Seq(lk), Seq(rk), lt, rt,
        rightTieBreak.map(res(rp, _)), leftOuter))
  }
}
