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

  /** dispatch mode: `auto` (default — sampled skew probe picks the
    * plan), `merge` (force [[AsofJoinExec]]), `expand` (force the
    * compositional splittable form) */
  val DispatchConf = "graft.asof.dispatch"
  /** auto mode's sample fraction for the key-frequency probe; `0`
    * disables the probe (auto then behaves like `merge`) */
  val SampleFractionConf = "graft.asof.skew.sampleFraction"
  /** auto mode's routing threshold: a single key holding at least this
    * fraction of EITHER side's sampled rows routes to the splittable
    * form */
  val MaxKeyFractionConf = "graft.asof.skew.maxKeyFraction"
  /** a side whose sample is smaller than this is treated as not skewed
    * — a few dozen sampled rows make max/sum pure noise, and an input
    * that small cannot produce a straggler worth re-planning for */
  val MinSampleRowsConf = "graft.asof.skew.minSampleRows"

  /** Column-name builder: resolves against the inputs' analyzed plans,
    * so the node enters the analyzer fully resolved. Key and time
    * columns must be pairwise type-identical (cast beforehand) — the
    * merge compares them with one natural ordering per pair.
    *
    * SKEW DISPATCH (the round-11 finding made a mechanism): the
    * sort-merge [[AsofJoinExec]] is the O(1)-memory fast path, but a
    * custom exec is INVISIBLE to AQE's OptimizeSkewedJoin — it matches
    * only the built-in join nodes — so a hot key bounds the exec's
    * wall time at that key's row fraction (measured at sf10: 2.0× under
    * a 20% hot key, unchanged when skew thresholds drop, while the
    * compositional form splits to 1.27×). Routing by documentation is
    * not a mechanism, so `join()` now probes BOTH sides' sampled key
    * frequency (one narrow union-scan at [[SampleFractionConf]],
    * seeded, ~one key column read) and plans the compositional
    * splittable form ([[expanded]]) when any key's sampled share
    * reaches [[MaxKeyFractionConf]]. Both forms share one oracle and
    * emit identical columns, so dispatch can never change results —
    * only which straggler profile the plan has. Deployments that know
    * their key distribution skip the probe with
    * [[DispatchConf]]=merge|expand. */
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
    val mode = spark.conf.getOption(DispatchConf).getOrElse("auto")
    val useExpanded = mode match {
      case "expand" => true
      case "merge" => false
      case "auto" =>
        maxSampledKeyFraction(spark, left, leftKey, right, rightKey) >=
          spark.conf.getOption(MaxKeyFractionConf).map(_.toDouble).getOrElse(0.1)
      case other => throw new IllegalArgumentException(
        s"$DispatchConf must be auto|merge|expand, got '$other'")
    }
    if (useExpanded)
      expanded(left, right, leftKey, rightKey, leftTime, rightTime,
        rightTieBreak, leftOuter)
    else {
      GraftExtensions.install(spark)
      org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
        AsofJoin(lp, rp, Seq(lk), Seq(rk), lt, rt,
          rightTieBreak.map(res(rp, _)), leftOuter))
    }
  }

  /** auto-dispatch probe: the largest single-key share of either
    * side's sampled key column. One job — a union of the two key
    * columns (side-tagged), fixed-seed sample, map-side-combined
    * count, per-side max/sum. The scan reads ONE column per side with
    * pushdown; at 100 TB that cost is real but bounded and paid once
    * per plan build — callers that already know the answer set
    * [[DispatchConf]] and never probe. Sampled 0 rows → 0.0 (merge). */
  private def maxSampledKeyFraction(spark: SparkSession,
      lhs: DataFrame, leftKey: String,
      rhs: DataFrame, rightKey: String): Double = {
    val f = spark.conf.getOption(SampleFractionConf)
      .map(_.toDouble).getOrElse(0.05)
    if (f <= 0) return 0.0
    val minRows = spark.conf.getOption(MinSampleRowsConf)
      .map(_.toLong).getOrElse(1000L)
    import org.apache.spark.sql.functions._
    lhs.select(col(leftKey).as("k"), lit(0).as("side"))
      .unionAll(rhs.select(col(rightKey).as("k"), lit(1).as("side")))
      .sample(withReplacement = false, f, seed = 421)
      .groupBy(col("side"), col("k")).count()
      .groupBy(col("side"))
      .agg(when(sum(col("count")) >= minRows,
        max(col("count")) / sum(col("count"))).otherwise(0.0).as("frac"))
      .agg(max(col("frac")).as("mf"))
      .collect().headOption.flatMap(r => Option(r.get(0)))
      .fold(0.0)(_.asInstanceOf[Double])
  }

  /** The compositional as-of form — equi-join expansion ranked away by
    * a per-left-row max_by — with EXACTLY [[AsofJoinExec]]'s semantics
    * and output columns (left ++ right, null-padded under `leftOuter`,
    * greatest (rightTime, tieBreak) wins, null keys/times never
    * match). Slower on uniform keys (it materializes the per-key
    * history expansion through a shuffle), but the aggregation keys on
    * a synthetic per-left-row id, NOT the join key, so the join output
    * partitioning is unpinned and AQE's OptimizeSkewedJoin splits a
    * hot key's partition — the mechanism the custom exec can never
    * reach (it is not a built-in join node). Mirrors the aj1 plan
    * shape (ops/Extended.scala) generalized to arbitrary schemas. */
  private def expanded(lhs: DataFrame, rhs: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String], leftOuter: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    val rowId = "__graft_asof_rowid"
    // uniquify right-side names so the join/agg below never hit an
    // ambiguous reference, then restore them on the agg aliases
    val rNames = rhs.columns.toSeq
    val rTmp = rNames.map(n => s"__graft_asof_r_$n")
    def rc(n: String) = col(s"__graft_asof_r_$n")
    val l2 = lhs.withColumn(rowId, monotonically_increasing_id())
    val joined = l2.join(rhs.toDF(rTmp: _*),
      l2(leftKey) === rc(rightKey) && rc(rightTime) <= l2(leftTime),
      if (leftOuter) "left" else "inner")
    // greatest-(time, tie-break) via one struct ordering: null fields
    // sort first (lose), matching the exec's ascending merge order
    val ord = struct((rightTime +: rightTieBreak).map(rc): _*)
    // left columns are constant per rowId group — first() just carries
    // them (any datatype) without a second join back
    val aggs = lhs.columns.toSeq.map(n => first(col(n)).as(n)) ++
      rNames.zip(rTmp).map { case (n, t) => max_by(col(t), ord).as(n) }
    joined.groupBy(col(rowId))
      .agg(aggs.head, aggs.tail: _*)
      .drop(rowId)
  }
}
