package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * count need no shuffle (verified by plan assertion in LayoutSpec).
    *
    * Idempotent across JVMs: a FRESH session doesn't know about a previous
    * run's table, so `mode(overwrite)` alone dies on the orphaned warehouse
    * directory (LOCATION_ALREADY_EXISTS) — drop the catalog entry AND clear
    * the leftover location first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 8): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    // Orphan-location cleanup is a LOCAL-filesystem remedy only: on an
    // hdfs://host/path (or s3a://…) warehouse, new URI(wh).getPath strips
    // the scheme+authority and the recursive delete would hit an unrelated
    // local directory — parse via Hadoop Path (which also tolerates
    // unencoded characters new URI() rejects) and skip unless the resolved
    // scheme is file/null. Distributed warehouses overwrite through the
    // catalog's own location handling instead.
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val whPath = new org.apache.hadoop.fs.Path(wh)
    val scheme = whPath.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val loc = new java.io.File(whPath.toUri.getPath, table)
      if (loc.exists()) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc.toPath).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Write a directory-partitioned dataset; filters on the partition
    * columns prune at planning time. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Z-order key over two long columns: each column range-bucketized into
    * `1 << bits` equal-width buckets from a global min/max (one tiny agg,
    * broadcast back onto the stream — same shape as Analytics.minmaxScale),
    * then Morton-interleaved (functions/MortonInterleave, codegen'd). All
    * bucket arithmetic is exact BIGINT ((v-min)*nb / (range+1)), so an
    * engine recomputing it (the DuckDB oracle) lands on identical keys.
    * Output: the input columns plus `zkey`. */
  def zOrderKey(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val nb = 1L << bits
    val stats = df.agg(
      min(col(xCol)).as("_xmin"), max(col(xCol)).as("_xmax"),
      min(col(yCol)).as("_ymin"), max(col(yCol)).as("_ymax"))
    // BIGINT `div`, not `/` (Divide is floating-point — (v-min)*nb can pass
    // 2^53 on a µs-timestamp range and a double round would shift buckets)
    def idiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
      toColumn(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        toExpression(a), toExpression(b)))
    }
    def bucket(v: Column, lo: Column, hi: Column): Column =
      idiv((v - lo) * nb, hi - lo + lit(1L))
    df.crossJoin(broadcast(stats))
      .withColumn("zkey", graft.functions.MortonInterleave(
        bucket(col(xCol), col("_xmin"), col("_xmax")),
        bucket(col(yCol), col("_ymin"), col("_ymax"))))
      .drop("_xmin", "_xmax", "_ymin", "_ymax")
  }

  /** Write `df` globally sorted by the z-order key of (xCol, yCol): rows
    * close in BOTH dimensions land in the same files, so per-file min/max
    * statistics prune scans filtered on EITHER column — the multi-dim
    * clustering a single-column sort can't give (it makes the second
    * column's per-file ranges span everything). The sort is one range
    * exchange; the key is dropped before write. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int = 10, numFiles: Int = 0): Unit = {
    val keyed = zOrderKey(df, xCol, yCol, bits)
    val sorted =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("zkey"))
        .sortWithinPartitions("zkey")
      else keyed.orderBy("zkey")
    sorted.drop("zkey").write.mode("overwrite").parquet(path)
  }

  /** Final executed plan node names (descends AQE wrappers) for plan tests. */
  def finalPlanString(df: DataFrame): String = {
    val sb = new StringBuilder
    PlanWalk.visit(df.queryExecution.executedPlan)(p => sb.append(p.nodeName).append('\n'))
    sb.toString
  }
}
