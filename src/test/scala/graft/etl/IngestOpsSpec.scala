package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class IngestOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("S3: sheet resolution is case-insensitive") {
    assert(IngestOps.resolveSheetName("ORDERS") == "orders")
    assert(IngestOps.resolveSheetName("LineItem") == "lineitem")
  }

  test("S3: unknown sheet errors with available-sheets message") {
    val e = intercept[IllegalArgumentException](IngestOps.resolveSheetName("nope"))
    assert(e.getMessage.contains("Available sheets"))
    assert(e.getMessage.contains("lineitem"))
  }

  test("S4/T4: applyHeader uses index fallback for overflow and empty names") {
    val df = Seq(("a", "b", "c")).toDF("_c0", "_c1", "_c2")
    val out = IngestOps.applyHeader(df, Seq("first", ""))
    assert(out.columns.toSeq == Seq("first", "1", "2"))
  }

  test("T2: blanksForNulls coerces nulls to empty string on string cols only") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")))
      .toDF("n", "s")
    val out = IngestOps.blanksForNulls(df).collect()
    assert(out.map(_.getAs[String]("s")).toSeq == Seq("", "x"))
    assert(out(1).isNullAt(0)) // non-string nulls untouched
  }

  test("T2: dropEmptyRows removes rows where every cell is null/blank") {
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", IntegerType)))
    val rows = Seq(Row("  ", null), Row(null, null), Row("x", null), Row(null, 3))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val kept = IngestOps.dropEmptyRows(df).collect()
    assert(kept.length == 2)
  }

  test("T5: all-string rendering — decimals, timestamps, ints") {
    val df = Seq((1L, 2.5, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .toDF("i", "d", "ts")
    val r = IngestOps.allString(df).collect().head
    assert(r.getString(0) == "1")
    assert(r.getString(1) == "2.50")
    assert(r.getString(2) == "2024-01-02 03:04:05")
  }

  test("T3: skipRows drops the first n rows in key order") {
    val df = (1 to 10).toDF("k")
    val out = IngestOps.skipRows(df, 7, col("k")).as[Int].collect().sorted
    assert(out.toSeq == Seq(8, 9, 10))
  }

  test("withGlobalPos equals the naive global row_number, with no single-partition window") {
    import org.apache.spark.sql.expressions.Window
    val ev = IngestOps.table(spark, sf0001, "events").select("event_id")
    val naive = ev.withColumn("_pos", row_number().over(Window.orderBy("event_id")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val scalable = IngestOps.withGlobalPos(ev, col("event_id"), numParts = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scalable == naive)
    // plan audit: the data-pass Window is partitioned by the literal bucket
    // expression (never an empty partitionBy = single-partition window), and
    // bucket membership is a pure function of the key — no range exchange
    // whose sampled boundaries could differ between evaluations
    val plan = IngestOps.withGlobalPos(ev, col("event_id"), numParts = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(_bkt"))
    assert(!plan.contains("rangepartitioning"))
    assert(!plan.contains("windowspecdefinition()")) // no empty partition spec
  }

  test("withGlobalPos handles empty and null-key inputs") {
    val empty = spark.emptyDataFrame.withColumn("k", lit(1))
    assert(IngestOps.withGlobalPos(empty, col("k")).count() == 0)
    val withNulls = Seq(Some(5), None, Some(3), Some(9), None).toDF("k")
    val out = IngestOps.withGlobalPos(withNulls, col("k"), numParts = 3)
      .collect().map(r => (Option(r.get(0)), r.getLong(1)))
    // nulls order first (asc_nulls_first, matching a range sort), then keys
    assert(out.sortBy(_._2).map(_._1).toSeq ==
      Seq(None, None, Some(3), Some(5), Some(9)))
    assert(out.map(_._2).sorted.toSeq == (1L to 5L))
  }

  test("S1: row-order capture via _rid reproduces scan order") {
    val li = IngestOps.withRowId(IngestOps.table(spark, sf0001, "region"))
    val rids = li.select("_rid").as[Long].collect()
    assert(rids.sorted.toSeq == rids.toSeq) // single-file scan: ids ascend
  }
}
