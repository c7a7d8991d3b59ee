package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

class RangesSpec extends AnyFunSuite {
  import spark.implicits._

  private val intervals = Seq(
    // (iv_id, s, e) — varied lengths, incl. bucket-straddling and empty
    (1L, 100L, 200L), (2L, 150L, 160L), (3L, 190L, 410L), (4L, 500L, 500L))
    .toDF("iv_id", "s", "e")
  private val points = Seq(
    (10L, 99L), (11L, 100L), (12L, 155L), (13L, 199L), (14L, 200L),
    (15L, 400L), (16L, 409L), (17L, 410L), (18L, 500L))
    .toDF("pt_id", "p")

  private def naive: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .where($"p" >= $"s" && $"p" < $"e")
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet

  test("bucketed range join matches the naive theta join for varied bucket widths") {
    val expect = naive
    assert(expect.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 100L, 1000L)) {
      val got = Ranges.bucketedRangeJoin(points, "p", intervals, "s", "e", w)
        .select("iv_id", "pt_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at bucket width $w")
      assert(got.toSet == expect, s"mismatch at bucket width $w")
    }
  }

  test("bounds are half-open: start inclusive, end exclusive") {
    val got = Ranges.bucketedRangeJoin(points, "p", intervals, "s", "e", 50L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 11L)))  // p=100 == start of [100,200)
    assert(!got.contains((1L, 14L))) // p=200 == end, excluded
    assert(!got.exists(_._1 == 4L))  // empty interval [500,500) matches nothing
  }

  test("plan is an equi-join on the bucket, not a nested-loop") {
    val plan = Ranges.bucketedRangeJoin(points, "p", intervals, "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned as a product:\n$plan")
  }

  test("property: random intervals/points/widths always equal the naive theta join") {
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 4) {
      val ivs = (1 to 30).map { i =>
        val s = rnd.nextInt(1000).toLong
        (i.toLong, s, s + rnd.nextInt(120).toLong) // incl. empty intervals
      }.toDF("iv_id", "s", "e")
      val pts = (1 to 80).map(i => (i.toLong, rnd.nextInt(1100).toLong))
        .toDF("pt_id", "p")
      val expect = pts.crossJoin(ivs).where($"p" >= $"s" && $"p" < $"e")
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
      val w = rnd.nextInt(200).toLong + 1
      val got = Ranges.bucketedRangeJoin(pts, "p", ivs, "s", "e", w)
        .select("iv_id", "pt_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"round=$round w=$w: duplicates")
      assert(got.toSet == expect, s"round=$round w=$w")
    }
  }

  test("column collisions and non-positive widths are rejected") {
    intercept[IllegalArgumentException] {
      Ranges.bucketedRangeJoin(points, "p", points, "p", "p", 10L)
    }
    intercept[IllegalArgumentException] {
      Ranges.bucketedRangeJoin(points, "p", intervals, "s", "e", 0L)
    }
  }
}
