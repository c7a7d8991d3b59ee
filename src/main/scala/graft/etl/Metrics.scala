package graft.etl

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** C7/T6 — metrics collection (SURVEY.md §2.4).
  *
  * The reference's contract §10 declares: strategy used, rows processed,
  * rows skipped, bytes read/written, batches written, per-stage timings
  * (HighVolumeExcelConverter-Contract-v2.0.1.md:195-211). Its implementation
  * only logs rows/sec (core/ExcelRowListener.java:148-163).
  *
  * Spark-native version: a QueryExecutionListener harvests the executed
  * plan's SQL metrics after each action — no per-row driver work, fully
  * compatible with distributed execution (metrics are SparkPlan accumulators
  * aggregated by the scheduler).
  */
object Metrics {

  final case class QueryMetrics(
      name: String,
      durationNs: Long,
      rowsProcessed: Long,
      bytesRead: Long,
      filesRead: Long)

  private val collected = new ConcurrentHashMap[String, QueryMetrics]()

  def get(name: String): Option[QueryMetrics] = Option(collected.get(name))
  def all: Map[String, QueryMetrics] = {
    import scala.jdk.CollectionConverters._
    collected.asScala.toMap
  }
  def clear(): Unit = collected.clear()

  /** Sum a named SQL metric (e.g. "numOutputRows" on scans) over the plan. */
  private def sumMetric(qe: QueryExecution, metricName: String,
      nodeFilter: String => Boolean): Long = {
    var total = 0L
    PlanWalk.visit(qe.executedPlan) { node =>
      if (nodeFilter(node.nodeName))
        node.metrics.get(metricName).foreach(m => total += m.value)
    }
    total
  }

  private val installed =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Install once per session (idempotent); every subsequent action records
    * metrics under the query-execution's funcName (collect/count/save/...). */
  def installOnce(spark: SparkSession): Unit =
    if (installed.add(String.valueOf(System.identityHashCode(spark)))) install(spark)

  def install(spark: SparkSession): QueryExecutionListener = {
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val scanRows = sumMetric(qe, "numOutputRows", n => n.toLowerCase.contains("scan"))
        val bytes = sumMetric(qe, "filesSize", _ => true)
        val files = sumMetric(qe, "numFiles", _ => true)
        collected.put(funcName,
          QueryMetrics(funcName, durationNs, scanRows, bytes, files))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    listener
  }
}
