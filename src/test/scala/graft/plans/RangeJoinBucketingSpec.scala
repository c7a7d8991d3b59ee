package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

class RangeJoinBucketingSpec extends AnyFunSuite {
  import spark.implicits._

  // (4) is an empty interval: must not throw in the rewritten sequence()
  // and must match nothing
  private val iv = Seq((1L, 100L, 200L), (2L, 150L, 160L), (3L, 190L, 410L),
    (4L, 500L, 500L)).toDF("iv_id", "s", "e")
  private val pt = Seq((10L, 99L), (11L, 100L), (12L, 155L), (13L, 199L),
    (14L, 200L), (15L, 409L), (16L, 410L)).toDF("pt_id", "p")

  private def thetaJoin = pt.join(iv, $"p" >= $"s" && $"p" < $"e")
    .select("iv_id", "pt_id")

  private def withRule[A](bucketUs: Long)(body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinBucketing()
    spark.conf.set("spark.graft.rangejoin.bucketUs", bucketUs.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.rangejoin.bucketUs")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinBucketing])
    }
  }

  test("rule rewrites a pure range theta join to a bucketed equi-join") {
    val expect = thetaJoin.as[(Long, Long)].collect().toSet // no rule: naive plan
    val (got, plan) = withRule(100L) {
      val df = thetaJoin
      (df.as[(Long, Long)].collect(), df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule did not rewrite:\n$plan")
    assert(got.length == got.toSet.size, "rewrite duplicated pairs")
    assert(got.toSet == expect)
  }

  test("rule also fires when the interval side is on the left") {
    val expect = iv.join(pt, $"p" >= $"s" && $"p" < $"e")
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val (got, plan) = withRule(64L) {
      val df = iv.join(pt, $"p" >= $"s" && $"p" < $"e").select("iv_id", "pt_id")
      (df.as[(Long, Long)].collect(), df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(got.toSet == expect)
  }

  test("rule is inert without the conf, and SQL-surface joins are rewritten with it") {
    val naive = thetaJoin.queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"))

    pt.createOrReplaceTempView("rjb_pt")
    iv.createOrReplaceTempView("rjb_iv")
    try {
      val sql = "SELECT iv_id, pt_id FROM rjb_pt JOIN rjb_iv ON p >= s AND p < e"
      val expect = spark.sql(sql).as[(Long, Long)].collect().toSet
      val (got, plan) = withRule(100L) {
        val df = spark.sql(sql)
        (df.as[(Long, Long)].collect().toSet, df.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      assert(got == expect)
    } finally {
      spark.catalog.dropTempView("rjb_pt")
      spark.catalog.dropTempView("rjb_iv")
    }
  }

  test("mixed-side bounds are left untouched") {
    // lower bound reads the POINT side (pt_id), upper bound the interval
    // side: no single-side decomposition exists, the rule must not fire
    val mixed = pt.join(iv.select("e"), $"p" >= $"pt_id" && $"p" < $"e")
    val expect = mixed.select("pt_id", "e").collect()
    val (got, plan) = withRule(100L) {
      val df = pt.join(iv.select("e"), $"p" >= $"pt_id" && $"p" < $"e")
      (df.select("pt_id", "e").collect(), df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
    assert(got.sortBy(r => (r.getLong(0), r.getLong(1))).sameElements(
      expect.sortBy(r => (r.getLong(0), r.getLong(1)))))
  }
}
