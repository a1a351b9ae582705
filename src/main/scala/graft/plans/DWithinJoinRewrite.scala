package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

import graft.sql.GeoOps

/** Auto-indexes naive within-distance joins, the range-join sibling of
  * [[ContainsJoinRewrite]]: a Join whose only cross-side predicate is
  * `st_dwithinxy(x1, y1, x2, y2, r)` (r literal) would plan as a
  * nested-loop join — O(|A|·|B|) distance tests. Rewritten to the grid
  * equi-join `SpatialJoins.withinDistanceJoin` builds by hand: cells at
  * res = r make the Chebyshev 3×3 neighborhood a complete candidate set,
  * so one side computes its cell in-line, the other explodes its 9-cell
  * ring, and the dwithin predicate becomes the exact refine on top of a
  * hash-joinable equality. No false negatives possible (any point within
  * r of another lies within one cell step); Catalyst picks broadcast or
  * sort-merge from stats and AQE skew-splitting applies to the cell key.
  *
  * Fires only when the join has no existing cross-side equality (anything
  * hash-joinable is left alone), which also makes the rewrite
  * fixpoint-safe. The ring explodes on the RIGHT side — put the smaller
  * relation on the right, as with a broadcast hint. */
object DWithinJoinRewrite extends Rule[LogicalPlan] {

  private def isDwithin(e: Expression): Option[StaticInvoke] = e match {
    case si: StaticInvoke
        if si.staticObject == GeoOps.getClass &&
          si.functionName == "dwithinXY" => Some(si)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def hasCrossSideEquality(conjuncts: Seq[Expression],
                                   left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      if (hasCrossSideEquality(conjuncts, left, right)) j
      else {
        val rewritten = conjuncts.iterator.flatMap { c =>
          tryRewrite(c, j, left, right, cond, hint)
        }.take(1).toSeq
        rewritten.headOption.getOrElse(j)
      }
  }

  private def gridCellOf(x: Expression, y: Expression, r: Double): Expression =
    StaticInvoke(GeoOps.getClass, LongType, "gridCell",
      Seq(x, y, Literal(r)), inputTypes = Seq.fill(3)(DoubleType),
      propagateNull = true, returnNullable = false)

  private def tryRewrite(c: Expression, j: Join, left: LogicalPlan,
                         right: LogicalPlan, cond: Expression,
                         hint: JoinHint): Option[LogicalPlan] = {
    val si = isDwithin(c).getOrElse(return None)
    val Seq(x1, y1, x2, y2, rExpr) = si.arguments.take(5)
    val r = rExpr match {
      case Literal(v: Double, DoubleType) if v > 0 => v
      case _ => return None
    }
    // identify sides: (x1,y1) from one, (x2,y2) from the other
    val aRefs = x1.references ++ y1.references
    val bRefs = x2.references ++ y2.references
    val (aPt, bPt) =
      if (aRefs.subsetOf(left.outputSet) && bRefs.subsetOf(right.outputSet))
        ((x1, y1), (x2, y2))
      else if (aRefs.subsetOf(right.outputSet) && bRefs.subsetOf(left.outputSet))
        ((x2, y2), (x1, y1))
      else return None

    // left side: its own cell, in-line (no blow-up on the big side)
    val cellAlias = Alias(gridCellOf(aPt._1, aPt._2, r), "__dw_cell")()
    val leftProj = Project(left.output :+ cellAlias, left)
    // right side: explode the 3x3 ring around its cell
    val ringExpr = StaticInvoke(GeoOps.getClass,
      ArrayType(LongType, containsNull = false), "gridRing",
      Seq(gridCellOf(bPt._1, bPt._2, r), Literal(1)),
      inputTypes = Seq(LongType, IntegerType),
      propagateNull = true, returnNullable = false)
    val ringAttr = AttributeReference("__dw_ring", LongType, nullable = false)()
    val gen = Generate(Explode(ringExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ringAttr),
      child = right)

    val equi = EqualTo(cellAlias.toAttribute, ringAttr)
    val newJoin = Join(leftProj, gen, Inner, Some(And(equi, cond)), hint)
    Some(Project(j.output, newJoin))
  }
}
