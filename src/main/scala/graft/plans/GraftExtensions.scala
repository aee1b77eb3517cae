package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DoubleDot

/** Catalyst optimizer rule: rewrite the higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) }}}
  *
  * into the codegen'd [[graft.functions.DoubleDot]] expression. The HOF
  * formulation is the natural way to WRITE a dot product in SQL/Column
  * code, but Catalyst evaluates its lambdas interpreted, one closure
  * call per element — this rule lets users keep the declarative form
  * and still get the tight primitive loop (measured on the sim1/dd5
  * pairwise-cosine workloads: the interpreted lambdas dominated
  * runtime).
  *
  * The match is exact-semantics-or-nothing: both sides must already be
  * `array<double>` (so no hidden cast changes arithmetic), the zero
  * must be literal 0.0, merge/finish must be pure `acc + x` / identity,
  * and the lambda bodies must reference exactly their own bound
  * variables. DoubleDot agrees with the HOF form on every input —
  * including null arrays, null elements, empty arrays, and ragged
  * lengths (both yield null via zip_with's null padding) — so the
  * rewrite is observationally invisible everywhere it fires.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** commutative two-variable body check: `f(p, q)` with {p,q} = {a,b} */
  private def usesBoth(p: Expression, q: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(p, a) && isVar(q, b)) || (isVar(p, b) && isVar(q, a))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r, LambdaFunction(Multiply(mx, my, _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(aa, ab, _),
          Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
      if isDoubleArray(l) && isDoubleArray(r) &&
        usesBoth(mx, my, x, y) && usesBoth(aa, ab, acc, el) && isVar(fin, fv) =>
      DoubleDot(l, r)
  }
}

/** Session extension entry point: on a cluster, activate with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — every
  * session then gets the optimizer rewrite and the [[AsofJoin]]
  * planner strategy with no code change. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}

object GraftExtensions {
  /** Idempotently installs the rewrite + strategy into an EXISTING
    * session (`spark.sql.extensions` only applies at session-build
    * time; `experimental.extraOptimizations`/`extraStrategies` are the
    * public seams for a live session — extra optimizations run as a
    * final optimizer batch, after constant folding has normalized the
    * zero literal the rule matches on; extra strategies are tried
    * before the built-ins). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }
}
