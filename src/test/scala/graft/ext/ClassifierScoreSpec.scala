package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{spark, sf0001}

/** The real-weights seam of [[TextOps.classifierScore]] (VERDICT r13 #2):
  * the scaladoc claim "a trained probe's weights drop in unchanged" is a
  * tested contract — supplying the stub weights explicitly produces the
  * IDENTICAL physical plan and scores as the default, and supplying a
  * different trained vector reweights the same features exactly. */
class ClassifierScoreSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs = graft.etl.IngestOps.table(spark, sf0001, "documents")

  test("explicit stub weights == default: identical plan and scores") {
    val dflt = TextOps.classifierScore(docs)
    val expl = TextOps.classifierScore(docs,
      weights = TextOps.ProbeWeights.Stub)
    assert(dflt.queryExecution.executedPlan.canonicalized.toString ==
      expl.queryExecution.executedPlan.canonicalized.toString)
    val a = dflt.orderBy("doc_id").collect().map(_.toSeq)
    val b = expl.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("a trained weight vector drops in: same features, reweighted score") {
    val trained = TextOps.ProbeWeights(
      bias = -123000000L, wLen = 910L, wStop = 440L, wAlpha = 512L, wUniq = 77L)
    val base = TextOps.classifierScore(docs).orderBy("doc_id").collect()
    val out = TextOps.classifierScore(docs, thresholdMicro = 1000000L,
        weights = trained).orderBy("doc_id").collect()
    assert(out.length == base.length)
    base.zip(out).foreach { case (b, o) =>
      // features are weight-independent
      Seq("doc_id", "n_tok", "f_len", "f_stop_ppm", "f_alpha_ppm", "f_uniq_ppm")
        .foreach(c => assert(b.getAs[Long](c) == o.getAs[Long](c), c))
      // score recomputed by hand from the features under the new weights
      val expect = trained.bias +
        trained.wLen * b.getAs[Long]("f_len") +
        trained.wStop * b.getAs[Long]("f_stop_ppm") +
        trained.wAlpha * b.getAs[Long]("f_alpha_ppm") +
        trained.wUniq * b.getAs[Long]("f_uniq_ppm")
      assert(o.getAs[Long]("score_micro") == expect)
      assert(o.getAs[Int]("keep") == (if (expect >= 1000000L) 1 else 0))
    }
  }

  test("zero-token doc scores bias-only under any weights") {
    val d = Seq((1L, ""), (2L, "real words here")).toDF("doc_id", "text")
    val w = TextOps.ProbeWeights(5L, 100L, 100L, 100L, 100L)
    val r = TextOps.classifierScore(d, weights = w)
      .orderBy("doc_id").collect()
    assert(r.head.getAs[Long]("score_micro") == 5L)
  }
}
