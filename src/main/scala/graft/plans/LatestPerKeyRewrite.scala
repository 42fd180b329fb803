package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the "latest-per-key" window idiom
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o DESC) rn FROM t) WHERE rn = 1
  *
  * into an aggregation
  *
  *   SELECT max_by(struct(*), o) ... GROUP BY k
  *
  * The window form sorts EVERY partition row; the aggregate form reduces
  * map-side before the shuffle (partial max_by), so the exchange carries one
  * row per key per input partition instead of all rows. This is the
  * §4 "candidate stretch" from SURVEY.md — the reference's latest-per-key
  * views (architecture.md:53) are the motivating shape.
  *
  * Conservative preconditions (rewrite only when provably equivalent):
  *   - single row_number window function, all DESC sort keys, rn filtered = 1,
  *     rn dropped by the parent projection (or absent from output);
  *   - deterministic child output.
  * Ties: row_number picks ONE arbitrary row among order-key ties; max_by
  * also picks one arbitrary max row — both are "some row with maximal
  * order key", so any query whose result is well-defined (deterministic
  * total order, as all of ours are) is unaffected.
  */
object LatestPerKeyRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(winExpr), partSpec, orderSpec, child, _)))
        if isRowNumberEqOne(cond, winExpr)
          && orderSpec.nonEmpty && orderSpec.forall(_.direction == Descending)
          && partSpec.nonEmpty
          && !projectList.exists(refsAttr(_, winExpr.toAttribute))
          && projectList.forall(_.deterministic)
          && child.outputSet.size == child.output.size =>
      rewrite(p, partSpec, orderSpec, child)
  }

  private def isRowNumberEqOne(cond: Expression, winExpr: NamedExpression): Boolean =
    cond match {
      case EqualTo(a: Attribute, Literal(1, _)) =>
        a.exprId == winExpr.exprId && isRowNumber(winExpr)
      case EqualTo(Literal(1, _), a: Attribute) =>
        a.exprId == winExpr.exprId && isRowNumber(winExpr)
      case _ => false
    }

  private def isRowNumber(e: Expression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => true
    case _ => false
  }

  private def refsAttr(e: Expression, attr: Attribute): Boolean =
    e.references.contains(attr)

  private def rewrite(p: Project, partSpec: Seq[Expression],
                      orderSpec: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    // max_by(struct(child.output), struct(orderKeys)) per partition key.
    val payload = CreateStruct(child.output)
    val ordKey = CreateStruct(orderSpec.map(_.child))
    val maxByAgg = AggregateExpression(
      MaxBy(payload, ordKey), Complete, isDistinct = false)
    val rowAlias = Alias(maxByAgg, "__latest")()

    val groupExprs = partSpec.map {
      case ne: NamedExpression => ne
      case e => Alias(e, "__gk")()
    }
    val agg = Aggregate(groupExprs, groupExprs :+ rowAlias, child)

    // Re-expose the child's columns from the struct, preserving exprIds so
    // the parent Project's references still resolve.
    val latestRef = rowAlias.toAttribute
    val restored = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(latestRef, i, Some(a.name)), a.name)(exprId = a.exprId)
    }
    Project(p.projectList, Project(restored, agg))
  }
}

/** Session extension installing the rewrite:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => LatestPerKeyRewrite)
}
