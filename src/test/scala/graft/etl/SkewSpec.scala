package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class SkewSpec extends AnyFunSuite {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    val li = IngestOps.table(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    val o = IngestOps.table(spark, sf0001, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(o, Seq("l_orderkey")).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(li, o, "l_orderkey", factor = 7).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("salted left join preserves unmatched big-side rows") {
    val big = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val small = Seq((1, "X")).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, "k", factor = 4, joinType = "left")
      .collect().map(r => (r.getInt(0), Option(r.getString(2)))).toSet
    assert(out == Set((1, Some("X")), (2, None), (3, None)))
  }

  test("heavyHitters surfaces the hot keys") {
    val df = (Seq.fill(90)(1) ++ Seq.fill(9)(2) ++ Seq(3)).toDF("k")
    val top = Skew.heavyHitters(df, org.apache.spark.sql.functions.col("k"), 2)
      .as[(Int, Long)].collect()
    assert(top.head == ((1, 90L)) && top(1) == ((2, 9L)))
  }
}
