package graft.etl

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared executed-plan traversal that descends through AQE wrappers (the
  * adaptive root and materialized query stages hide their final plans from
  * plain `foreach`). Used by Metrics and Layout plan assertions. */
object PlanWalk {
  def visit(node: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(node)
    node match {
      case a: AdaptiveSparkPlanExec => visit(a.executedPlan)(f)
      case q: QueryStageExec => visit(q.plan)(f)
      case _ =>
    }
    node.children.foreach(visit(_)(f))
  }
}
