package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession.spark

class CurationSpec extends AnyFunSuite {
  import spark.implicits._

  // ---- PII redaction ----------------------------------------------------

  test("piiRedact counts and redacts emails, phones, and IPs as given") {
    val docs = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.org today"),
      (2L, "server at 192.168.10.254 and fallback 10.0.0.1"),
      (3L, "call 800-555-0199 x12"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val rows = TextOps.piiRedact(docs).orderBy("doc_id")
      .select("n_email", "n_phone", "n_ip", "redacted")
      .as[(Long, Long, Long, String)].collect()
    assert(rows(0) == ((1L, 0L, 0L, "mail me at [EMAIL] today")))
    assert(rows(1) == ((0L, 0L, 2L, "server at [IP] and fallback [IP]")))
    assert(rows(2) == ((0L, 1L, 0L, "call [PHONE] x12")))
    assert(rows(3) == ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("piiSeeded tail is fully redacted (the driver-query composition)") {
    val docs = Seq((3L, "hello world")).toDF("doc_id", "text")
    val r = PiiRow(TextOps.piiRedact(
      docs.select(col("doc_id"), TextOps.piiSeeded("text").as("text"))))
    assert(r.nEmail == 1 && r.nPhone == 1 && r.nIp == 1)
    assert(r.redacted.contains("[EMAIL]") && r.redacted.contains("[PHONE]")
      && r.redacted.contains("[IP]"))
    assert(!r.redacted.contains("@") && !r.redacted.contains("415-555"))
    assert(r.redacted.startsWith("hello world"))
  }

  private case class PiiRow(nEmail: Long, nPhone: Long, nIp: Long, redacted: String)
  private object PiiRow {
    def apply(df: org.apache.spark.sql.DataFrame): PiiRow = {
      val r = df.select("n_email", "n_phone", "n_ip", "redacted").head()
      PiiRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    }
  }

  // ---- BM25 ---------------------------------------------------------------

  private val corpus = Seq(
    (1L, "spark spark join fast"),
    (2L, "spark slow"),
    (3L, "stream only here"),
    (4L, "nothing relevant at all")).toDF("doc_id", "text")

  test("bm25 matches the formula computed by hand") {
    // corpus stats: N=4, sum_dl=13; df(spark)=2, df(join)=1, df(stream)=1
    val out = TextOps.bm25(corpus).orderBy("doc_id")
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    def score(tf: Long, df: Long, dl: Long, n: Long = 4L, s: Long = 13L): Double =
      tf.toDouble * 2.2 / (tf.toDouble + 1.2 * (0.25 + 0.75 *
        ((dl * n).toDouble / s.toDouble))) *
        (((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
    val d1 = score(2, 2, 4) + score(1, 1, 4) + score(0, 1, 4)
    val d2 = score(1, 2, 2)
    assert(out(1L) == d1 && out(2L) == d2 && out(4L) == 0.0)
  }

  test("bm25 term-frequency saturation: more hits score higher, sublinearly") {
    val out = TextOps.bm25(corpus).orderBy("doc_id")
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L)) // two 'spark' + a 'join' beats one 'spark'
    assert(out(3L) > 0.0 && out(4L) == 0.0)
  }

  // ---- Posting lists ------------------------------------------------------

  test("postings ranks docs by tf with doc_id tie-break, capped at k") {
    val docs = Seq(
      (1L, "apple apple apple banana"),
      (2L, "apple apple banana banana"),
      (3L, "apple banana banana banana"),
      (4L, "apple cherry")).toDF("doc_id", "text")
    val out = TextOps.postings(docs, k = 2, minDf = 2)
      .select("term", "rank", "doc_id", "tf", "df")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("apple", 1L, 1L, 3L, 4L), ("apple", 2L, 2L, 2L, 4L),
      ("banana", 1L, 3L, 3L, 3L), ("banana", 2L, 2L, 2L, 3L)))
    // cherry: df=1 < minDf — excluded entirely
  }

  test("postings plans the rank cap as a WindowGroupLimit (bounded map state)") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val plan = TextOps.postings(docs, k = 3, minDf = 1).queryExecution.executedPlan
    var hasLimit = false
    graft.etl.PlanWalk.visit(plan) { p =>
      if (p.getClass.getSimpleName.contains("WindowGroupLimit")) hasLimit = true
    }
    assert(hasLimit, s"expected WindowGroupLimit in:\n$plan")
  }

  // ---- Novelty ------------------------------------------------------------

  test("novelty is 1.0 for first-of-its-content and drops for repeats") {
    val docs = Seq(
      (1L, "one two three four five six"), // 2 distinct 5-shingles, both first here
      (2L, "one two three four five six"), // exact repeat: novelty 0
      (3L, "one two three four five seven")) // shares shingle 1 of 2 with doc 1
      .toDF("doc_id", "text")
    val out = TextOps.novelty(docs)
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)))
  }

  test("novelty skips docs shorter than the shingle width") {
    val docs = Seq((1L, "too short"), (2L, "just five tokens right here")).toDF("doc_id", "text")
    assert(TextOps.novelty(docs, w = 5).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  // ---- Bloom-prefiltered decontamination ---------------------------------

  test("decontaminateBloom is output-identical to exact decontaminate") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // contaminated (shares 5-shingle)
      (2L, "totally unrelated text about other things entirely"),
      (3L, "alpha beta gamma delta other words here")) // 4-overlap only: clean at w=5
      .toDF("doc_id", "text")
    val exact = TextOps.decontaminate(cands, bench).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val bloom = TextOps.decontaminateBloom(cands, bench).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(bloom == exact && exact == Seq(2L, 3L))
  }

  test("decontaminateBloom with an aggressive fpp still confirms exactly") {
    // fpp=0.5 forces heavy false-positive traffic through the prefilter;
    // the exact confirm join must still produce the identical survivor set
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val cands = (1L to 40L).map(i =>
      (i, s"doc $i unique words w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text")
    val exact = TextOps.decontaminate(cands, bench).count()
    val bloom = TextOps.decontaminateBloom(cands, bench, fpp = 0.5).count()
    assert(bloom == exact && exact == 40L)
  }
}
