package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class MetricsAndScaleSpec extends AnyFunSuite {

  test("C7: QueryExecutionListener harvests scan rows and bytes after actions") {
    Metrics.clear()
    Metrics.install(spark)
    IngestOps.table(spark, sf0001, "lineitem").count()
    // listener fires asynchronously; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (Metrics.all.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    val m = Metrics.all.values
    assert(m.nonEmpty)
    assert(m.exists(_.rowsProcessed == 6000L), s"got: $m")
  }

  test("scalable per-file row position covers 0..n-1 exactly once") {
    val df = IngestOps.withFileRowPos(spark, s"$sf0001/lineitem.parquet")
    val n = df.count()
    assert(n == 6000)
    val stats = df.agg(
      org.apache.spark.sql.functions.min("_pos"),
      org.apache.spark.sql.functions.max("_pos"),
      org.apache.spark.sql.functions.countDistinct("_pos")).head()
    assert(stats.getLong(0) == 0L && stats.getLong(1) == n - 1 && stats.getLong(2) == n)
  }

  test("scalable row position agrees with skipRows semantics on ordered keys") {
    import spark.implicits._
    val skipped = IngestOps.withFileRowPos(spark, s"$sf0001/region.parquet")
      .filter($"_pos" >= 2).select("r_regionkey").as[Int].collect().sorted
    assert(skipped.length == 3)
  }
}
