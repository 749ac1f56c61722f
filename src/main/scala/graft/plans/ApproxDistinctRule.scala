package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.expr.HllCountDistinctAgg

/** Opt-in approximate-distinct mode, the SURVEY §7.3 tier-(c)
  * `Rule[LogicalPlan]` of the library: with
  * `spark.graft.approxCountDistinct=true`, every `count(DISTINCT c)`
  * over a STRING column is rewritten to [[HllCountDistinctAgg]] —
  * type-preserving (LONG → LONG), so downstream expressions and
  * aliases are untouched.
  *
  * Why an optimizer rule and not a function: at 100 TB the difference
  * between exact distinct (Expand + full-width reshuffle of every
  * distinct value) and a 256-int mergeable register file is the
  * difference between a report running and not running — and the
  * queries that need the switch are usually BI SQL nobody can edit.
  * One session conf flips the whole workload, the way production
  * engines ship approx modes. Off (the default), plans are untouched —
  * every declared oracle query runs exact.
  *
  * Scope guards: only single-argument DISTINCT counts of STRING
  * columns (the register hash is defined on strings), only when no
  * filter clause is attached, and never grouping expressions.
  */
case class ApproxDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxCountDistinct").exists(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.copy(aggregateExpressions = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case AggregateExpression(Count(Seq(c)), _, true, None, _)
                if c.dataType == StringType =>
              AggregateExpression(HllCountDistinctAgg(c), Complete,
                isDistinct = false, filter = None)
          }.asInstanceOf[NamedExpression]
        })
    }
}
