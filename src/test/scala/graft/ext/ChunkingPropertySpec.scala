package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

/** Differential properties for the chunk/pack operators: the distributed
  * formulation must agree with a naive sequential reimplementation on
  * seeded-random inputs (the PropertySpec pattern — deterministic PRNG loop,
  * no scalacheck bridge in the offline cache). */
class ChunkingPropertySpec extends AnyFunSuite {
  import spark.implicits._

  private def naiveChunks(tokens: Seq[String], c: Int, s: Int): Seq[(Long, Seq[String])] =
    if (tokens.isEmpty) Seq.empty
    else {
      // last start clamped below n: when stride > chunk the ceil formula
      // alone can place a start past the end (n=5, c=2, s=5 → starts 0, 5),
      // which would emit a degenerate empty chunk
      val nChunks = 1 + math.min(
        (math.max(tokens.length - c, 0) + s - 1) / s,
        (tokens.length - 1) / s)
      (0 until nChunks).map(i => (i.toLong, tokens.slice(i * s, i * s + c)))
    }

  test("chunkDocs ≡ naive sliding window: ∀ (n, chunk, stride)") {
    val rnd = new scala.util.Random(17)
    val cases = Seq((0, 3, 2), (1, 3, 2), (3, 3, 3), (4, 3, 3), (7, 5, 5),
      (5, 2, 5), (6, 2, 5), (11, 2, 5)) ++ // stride > chunk: start-clamp cases
      Seq.fill(10)((rnd.nextInt(40), rnd.nextInt(6) + 1, rnd.nextInt(6) + 1))
    cases.foreach { case (n, c, s) =>
      val tokens = (0 until n).map(i => s"w$i")
      val df = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
      val got = Chunking.chunkDocs(df, chunkTokens = c, stride = s)
        .orderBy("chunk_id")
        .collect().map(r => (r.getAs[Long]("chunk_id"), r.getAs[String]("chunk_text")))
      val want = naiveChunks(tokens, c, s).map { case (i, t) => (i, t.mkString(" ")) }
      assert(got.toSeq == want, s"n=$n chunk=$c stride=$s")
      assert(got.forall(_._2.nonEmpty), s"empty chunk emitted: n=$n chunk=$c stride=$s")
      // coverage: with stride <= chunk every token index falls inside some
      // window (stride > chunk is deliberate subsampling — gaps expected)
      if (n > 0 && s <= c) {
        val covered = naiveChunks(tokens, c, s)
          .flatMap { case (i, t) => (i * s).toInt until (i * s).toInt + t.length }.toSet
        assert(covered == (0 until n).toSet, s"n=$n chunk=$c stride=$s")
      }
    }
  }

  test("dedupSegments ≡ naive keep-first segmentation: ∀ (n, w), tiny vocab forces repeats") {
    val rnd = new scala.util.Random(31)
    def naive(tokens: Seq[String], w: Int): (Long, Long, String) = {
      val segs = tokens.grouped(w).map(_.mkString(" ")).toList
      val kept = segs.zipWithIndex.filter { case (s, i) => segs.indexOf(s) == i }.map(_._1)
      (segs.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    val cases = Seq((1, 1), (4, 2), (7, 3), (8, 8), (9, 8)) ++
      Seq.fill(10)((rnd.nextInt(60) + 1, rnd.nextInt(5) + 1))
    cases.foreach { case (n, w) =>
      // vocab of 2 tokens => w-token segments collide constantly
      val tokens = (0 until n).map(_ => if (rnd.nextBoolean()) "aa" else "bb")
      val df = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
      val got = TextOps.dedupSegments(df, w = w).collect().head
      val want = naive(tokens, w)
      assert((got.getLong(1), got.getLong(2), got.getString(3)) == want, s"n=$n w=$w")
    }
  }

  private def naivePack(nToks: Seq[(Long, Long)], budget: Int): Map[Long, (Long, Long)] = {
    // sequential cumulative-offset binning over a doc_id-ordered stream →
    // seq_id -> (n_docs, seq_tokens)
    var cum = 0L
    val out = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    nToks.sortBy(_._1).foreach { case (_, n) =>
      val bin = cum / budget
      val (d, t) = out.getOrElse(bin, (0L, 0L))
      out(bin) = (d + 1, t + n)
      cum += n
    }
    out.toMap
  }

  test("packSequences ≡ naive sequential binning: ∀ (docs, budget)") {
    val rnd = new scala.util.Random(23)
    (Seq(1, 7, 64) ++ Seq.fill(4)(rnd.nextInt(100) + 1)).foreach { budget =>
      val docs = (0L until 50L).map { i =>
        (i, "en", Seq.fill(rnd.nextInt(12) + 1)("t").mkString(" "))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      // shards=1 → a single stream: directly comparable to the fold
      val got = Chunking.packSequences(df, budget = budget, shards = 1)
        .collect()
        .map(r => r.getAs[Long]("seq_id") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("seq_tokens"))).toMap
      val want = naivePack(docs.map(d => (d._1, d._3.split(" ").length.toLong)), budget)
      assert(got == want, s"budget=$budget")
    }
  }

  test("packSequences: sharded totals equal unsharded totals (token conservation)") {
    val rnd = new scala.util.Random(29)
    val docs = (0L until 80L).map(i =>
      (i, if (i % 3 == 0) "de" else "en", Seq.fill(rnd.nextInt(9) + 1)("t").mkString(" ")))
    val df = docs.toDF("doc_id", "lang", "text")
    val total = docs.map(_._3.split(" ").length.toLong).sum
    Seq(1, 3, 8).foreach { shards =>
      val sum = Chunking.packSequences(df, budget = 32, shards = shards)
        .agg(org.apache.spark.sql.functions.sum("seq_tokens")).as[Long].head()
      assert(sum == total, s"shards=$shards")
    }
  }
}
