package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

/** Property-style invariants (SURVEY.md §5): chunking and header-fallback
  * hold for arbitrary batch sizes / header shapes, not just the fixtures.
  * (Seeded random sampling — the offline dependency cache carries scalacheck
  * but not the scalatest bridge artifact, so properties are driven by a
  * deterministic PRNG loop.) */
class PropertySpec extends AnyFunSuite {
  import spark.implicits._

  private val df100 = (1 to 100).toDF("k").cache()

  test("chunkStats: ∀ batchSize — every chunk ≤ batchSize, contiguous, complete") {
    val rnd = new scala.util.Random(7)
    val sizes = Seq(1, 2, 99, 100, 101) ++ Seq.fill(8)(rnd.nextInt(120) + 1)
    sizes.foreach { batchSize =>
      val stats = Sinks.chunkStats(df100, batchSize, col("k")).collect()
      assert(stats.map(_.getAs[Long]("n_rows")).sum == 100, s"batchSize=$batchSize")
      stats.foreach { r =>
        assert(r.getAs[Long]("n_rows") <= batchSize)
        assert(r.getAs[Long]("max_rn") - r.getAs[Long]("min_rn") + 1 == r.getAs[Long]("n_rows"))
      }
      val full = stats.sortBy(_.getAs[Long]("chunk_id")).dropRight(1)
      assert(full.forall(_.getAs[Long]("n_rows") == batchSize), s"batchSize=$batchSize")
    }
  }

  test("applyHeader: ∀ header shape — name count preserved, fallback = index") {
    val base = Seq(("a", "b", "c", "d")).toDF("_c0", "_c1", "_c2", "_c3")
    val rnd = new scala.util.Random(11)
    val headers = Seq(
      Seq(), Seq("x"), Seq("", "y"), Seq("a", "b", "c", "d", "e")) ++
      Seq.fill(8)(Seq.fill(rnd.nextInt(5))(if (rnd.nextBoolean()) "" else s"h${rnd.nextInt(100)}"))
    headers.foreach { header =>
      val out = IngestOps.applyHeader(base, header)
      assert(out.columns.length == 4)
      out.columns.zipWithIndex.foreach { case (name, i) =>
        val expected =
          if (i < header.length && header(i).nonEmpty) header(i) else i.toString
        assert(name == expected, s"header=$header pos=$i")
      }
    }
  }

  test("allString: ∀ numeric input — row count and key order preserved") {
    val rnd = new scala.util.Random(13)
    (Seq(1, 2) ++ Seq.fill(4)(rnd.nextInt(50) + 1)).foreach { n =>
      val df = (1 to n).map(i => (i.toLong, i * 1.5)).toDF("k", "v")
      val out = IngestOps.allString(df.orderBy("k"))
      val ks = out.select("k").as[String].collect()
      assert(ks.length == n)
      assert(ks.toSeq == (1 to n).map(_.toString), s"n=$n")
    }
  }
}
