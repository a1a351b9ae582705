package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.sql.Geo

/** `spark.sql.extensions`-style integration: registers every engine function
  * and the cast-elision optimizer rule at session build — the idiomatic
  * deployment path (`--conf spark.sql.extensions=graft.plans.GraftExtensions`).
  * `Geo.register(spark)` remains the runtime path for externally-built
  * sessions (the driver's Verify/Bench mains use it). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Geo.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (args: Seq[Expression]) => builder(args)))
    }
    ext.injectOptimizerRule(_ => ElideRedundantGeoCasts)
    ext.injectOptimizerRule(_ => ContainsJoinRewrite)
  }
}

/** The reference elides identity casts at the stream level — parsed-type
  * equality short-circuits to a zero-copy pass-through
  * (`/root/reference/R/array.R:52-56,121-124`, SURVEY.md §4). The Catalyst
  * analog: collapse idempotent geometry-cast chains so only the outermost
  * survives. (Runtime identity casts already return their input unchanged —
  * `GeoOps.castType/castDims`; this removes the call entirely when the plan
  * makes the no-op visible statically.) */
object ElideRedundantGeoCasts extends Rule[LogicalPlan] {

  private val idempotentCasts = Set("castType", "castDims", "snapToGrid", "setSrid")

  private def isGeoCast(e: Expression, name: String): Boolean = e match {
    case si: StaticInvoke =>
      si.staticObject == graft.sql.GeoOps.getClass && si.functionName == name
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // cast(cast(g, t), t) -> cast(g, t) when the target argument is the
    // same literal (same for dims casts, grid snaps, srid sets)
    case outer: StaticInvoke
        if outer.staticObject == graft.sql.GeoOps.getClass &&
          idempotentCasts.contains(outer.functionName) &&
          outer.arguments.nonEmpty &&
          isGeoCast(outer.arguments.head, outer.functionName) &&
          outer.arguments.tail ==
            outer.arguments.head.asInstanceOf[StaticInvoke].arguments.tail =>
      val inner = outer.arguments.head.asInstanceOf[StaticInvoke]
      outer.copy(arguments = inner.arguments.head +: outer.arguments.tail)
  }
}
