package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

class GraphSpec extends AnyFunSuite {
  import spark.implicits._

  test("pageRank: hand-computed integer iteration on a path graph") {
    // 1 - 2 - 3 (path): deg(1)=deg(3)=1, deg(2)=2
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val scale = 3000L // n divides scale: r0 = 1000 each
    val got = Graph.pageRank(nodes, pairs, iters = 2, dampPct = 85L, scale = scale)
      .select("doc_id", "pr_scaled").as[(Long, Long)].collect().toMap

    // mirror the exact integer recurrence
    val base = ((100L - 85L) * scale / 100L) / 3L // (15*3000/100)/3 = 150
    def round(r: Map[Long, Long]): Map[Long, Long] = {
      val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
      val in = Map(
        1L -> r(2L) / deg(2L),
        2L -> (r(1L) / deg(1L) + r(3L) / deg(3L)),
        3L -> r(2L) / deg(2L))
      in.map { case (k, m) => k -> (base + (85L * m) / 100L) }
    }
    val expect = round(round(Map(1L -> 1000L, 2L -> 1000L, 3L -> 1000L)))
    assert(got == expect)
    // the center of the path must outrank the endpoints
    assert(got(2L) > got(1L) && got(1L) == got(3L))
  }

  test("pageRank: isolated nodes hold base; partition invariance bit-for-bit") {
    val rnd = new scala.util.Random(3)
    val nodes = (1L to 40L).toDF("doc_id")
    val pairs = Seq.fill(60)((rnd.nextInt(30) + 1L, rnd.nextInt(30) + 1L))
      .filter { case (a, b) => a < b }.distinct.toDF("doc_a", "doc_b")
    val a = Graph.pageRank(nodes, pairs)
      .select("doc_id", "pr_scaled").as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(nodes.repartition(7), pairs.repartition(5))
      .select("doc_id", "pr_scaled").as[(Long, Long)].collect().toMap
    assert(a == b)
    // nodes 31-40 have no edges: rank is exactly the teleport base
    val base = ((100L - 85L) * 1000000000000L / 100L) / 40L
    (31L to 40L).foreach(i => assert(a(i) == base))
    // total mass is conserved up to truncation (never exceeds scale)
    assert(a.values.sum <= 1000000000000L)
  }
}
