package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class LayoutSpec extends AnyFunSuite {

  test("bucketed co-located join plans without a shuffle") {
    Layout.writeBucketed(IngestOps.table(spark, sf0001, "lineitem"),
      "li_bucketed", "l_orderkey")
    Layout.writeBucketed(
      IngestOps.table(spark, sf0001, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed", "l_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed").join(spark.table("o_bucketed"), "l_orderkey")
      assert(j.count() == 6000)
      val plan = Layout.finalPlanString(j)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("parted").toString + "/events"
    Layout.writePartitioned(
      IngestOps.table(spark, sf0001, "events"), dir, "event_type")
    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    val n = clicks.count()
    val batchCount = IngestOps.table(spark, sf0001, "events")
      .filter(col("event_type") === "click").count()
    assert(n == batchCount && n > 0)
    // partition pruning shows up as a partition filter on the file scan
    val scan = clicks.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"no partition pruning in scan:\n$scan")
  }
}
