package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for scale (SURVEY.md §7 / build brief): bucketing
  * for co-located joins and partitioned directories for partition pruning.
  *
  * At 100 TB these two knobs carry most of the shuffle/scan savings:
  *  - bucketing pre-shuffles both join sides ONCE at write time; every
  *    subsequent equi-join on the bucket key plans with no Exchange;
  *  - directory partitioning turns selective filters into partition pruning
  *    (the scan never lists, opens, or reads non-matching directories).
  */
object Layout {

  /** Write a bucketed + sorted table registered in the session catalog.
    * Joins between tables bucketed on the same key with the same bucket
    * count need no shuffle (verified by plan assertion in LayoutSpec). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Write a directory-partitioned dataset; filters on the partition
    * columns prune at planning time. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Final executed plan node names (descends AQE wrappers) for plan tests. */
  def finalPlanString(df: DataFrame): String = {
    val sb = new StringBuilder
    PlanWalk.visit(df.queryExecution.executedPlan)(p => sb.append(p.nodeName).append('\n'))
    sb.toString
  }
}
