package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec

/** Physical-plan shape audits. The r05 scale gate let a quadratic plan
  * (q37's full-table-broadcast cross BNLJ) slide under the factor-10
  * timing threshold; timing gates scale the DATA, this audits the
  * PLAN — a full-table broadcast feeding a nested-loop join is wrong
  * at 100 TB no matter what the stopwatch says at sf1.
  */
object PlanShape {

  /** Walk including AQE/stage/reuse wrappers (their subplans are not
    * `children`). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** A node that bounds the rows flowing out of its subtree: under one
    * of these, a broadcast side is a deliberate small set (a filtered
    * probe batch, an aggregated stats row, a top-k), not the table.
    *
    * A FilterExec counts ONLY if it carries a selective predicate —
    * the optimizer inserts trivial IsNotNull filters on join keys, and
    * counting those would whitewash a full-table broadcast (ADVICE
    * r06: the exact r05 q37 shape this audit exists to catch). */
  private def bounds(p: SparkPlan): Boolean = p match {
    case f: FilterExec => selective(f.condition)
    case _: GlobalLimitExec | _: LocalLimitExec |
        _: TakeOrderedAndProjectExec | _: BaseAggregateExec |
        _: WindowGroupLimitExec => true
    case l: LocalTableScanExec => l.rows.size <= 10000
    case _ => false
  }

  /** True iff some conjunct is more than a null check — IsNotNull
    * passes every row of a non-nullable column, so a filter made only
    * of those bounds nothing. Null checks are recognized in every
    * spelling (IsNotNull, Not(IsNull)), and an Or is selective only if
    * BOTH branches are — Or(IsNotNull(a), IsNotNull(b)) passes nearly
    * everything, so it must not count as bounding (ADVICE r07). Unknown
    * predicates stay default-true. */
  private def selective(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull, IsNull, Not, Or}
    e match {
      case And(l, r) => selective(l) || selective(r)
      case Or(l, r) => selective(l) && selective(r)
      case _: IsNotNull => false
      case Not(_: IsNull) => false
      case _ => true
    }
  }

  /** Every BroadcastNestedLoopJoin whose build side has NO bounding
    * operator anywhere in its subtree — i.e. it broadcasts a full
    * table into a nested loop, the one plan shape that cannot survive
    * a scale-up. Returns one description per offending join; empty =
    * clean. Run over the PLANNED query (no execution needed). */
  def unboundedBroadcastNlj(df: DataFrame): Seq[String] = {
    val joins = flatten(df.queryExecution.executedPlan).collect {
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
            j.right
          case _ => j.left
        }
        (j, flatten(build))
    }
    joins.collect {
      case (j, subtree) if !subtree.exists(p => bounds(p)) =>
        s"BroadcastNestedLoopJoin(${j.joinType}) broadcasts an " +
          s"unbounded subtree: ${subtree.map(_.nodeName).mkString(" <- ")}"
    }
  }
}
