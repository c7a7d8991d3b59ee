package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

/** Differential properties for the session-2 text/dedup operators: the
  * distributed formulations must agree with naive sequential
  * reimplementations on seeded-random inputs (the PropertySpec pattern —
  * deterministic PRNG loop, no scalacheck bridge in the offline cache). */
class TextPropertySpec extends AnyFunSuite {
  import spark.implicits._

  /** Reference BPE (Sennrich get_stats/merge semantics): overlap-counted
    * pair frequencies weighted by word freq; winner = (count DESC, pair
    * lexicographic ASC); merge = leftmost non-overlapping left-to-right. */
  private def naiveBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Long, String, String, Long)] = {
    var w: Map[Vector[String], Long] =
      words.map { case (s, f) => s.map(_.toString).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- w; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r.toLong, a, b, c))
        w = w.toSeq.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        r += 1
      }
    }
    out.toSeq
  }

  test("bpeMerges ≡ naive reference BPE: ∀ seeded random corpora") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 6) {
      val alphabet = "abc"
      val nDocs = rnd.nextInt(5) + 2
      val docs = (1 to nDocs).map { id =>
        val nWords = rnd.nextInt(6) + 1
        val words = Seq.fill(nWords)(
          Seq.fill(rnd.nextInt(4) + 1)(alphabet(rnd.nextInt(3))).mkString)
        (id.toLong, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val wordFreq = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val expected = naiveBpe(wordFreq, rounds = 4)
      val got = TextOps.bpeMerges(df, rounds = 4).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == expected, s"trial $trial corpus=$docs")
    }
  }

  test("keepBestInCluster ≡ per-cluster argmax of the cluster labels it builds on") {
    val fx = graft.etl.IngestOps.table(spark, graft.SparkTestSession.sf0001,
      "documents")
    val labels = Dedup.clusterByBuckets(fx,
        Dedup.bandBuckets(Dedup.minhashSignatures(fx)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = TextOps.quality(fx).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_alpha"), r.getAs[Long]("n_chars")))).toMap
    val expected = labels.groupBy(_._2).map { case (cid, members) =>
      val best = members.keys.maxBy { id =>
        val (na, nc) = quality(id); (na, nc, -id)
      }
      cid -> (best, members.size.toLong)
    }
    val got = Dedup.keepBestInCluster(fx).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_size")))).toMap
    assert(got == expected)
  }
}
