package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession.spark

/** Randomized differentials: the distributed operators must equal a naive
  * sequential reimplementation on arbitrary inputs (seeded — reproducible). */
class AnalyticsPropertySpec extends AnyFunSuite {
  import spark.implicits._

  test("funnel equals a naive per-user simulation on random event streams") {
    val rnd = new scala.util.Random(83)
    val types = Seq("view", "click", "purchase", "error")
    val events = Seq.fill(600)((rnd.nextInt(40).toLong,
      types(rnd.nextInt(types.length)), rnd.nextInt(500).toLong))
    // naive: global min view; min click strictly after; min purchase after
    def naive(evs: Seq[(String, Long)]): (Option[Long], Option[Long], Option[Long]) = {
      val t1 = evs.collect { case ("view", us) => us }.minOption
      val t2 = t1.flatMap(a => evs.collect { case ("click", us) if us > a => us }.minOption)
      val t3 = t2.flatMap(a => evs.collect { case ("purchase", us) if us > a => us }.minOption)
      (t1, t2, t3)
    }
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val (t1, t2, t3) = naive(evs.map(e => (e._2, e._3)))
      (u, t1, t2, t3, t3.map(_ => 3L).orElse(t2.map(_ => 2L))
        .orElse(t1.map(_ => 1L)).getOrElse(0L))
    }.toSet
    val got = Analytics.funnel(events.toDF("user_id", "event_type", "us")
        .withColumn("ts", timestamp_micros(col("us"))))
      .select("user_id", "ts1_us", "ts2_us", "ts3_us", "step_reached")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSet
    assert(got == expected)
  }

  test("bm25 equals the naive formula on random corpora") {
    val rnd = new scala.util.Random(19)
    val vocab = Seq("spark", "join", "stream", "alpha", "beta", "gamma")
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val toks = docs.map { case (id, text) =>
      id -> text.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val terms = Seq("spark", "join", "stream")
    val n = docs.size.toLong
    val s = toks.values.map(_.size.toLong).sum
    def score(id: Long): Double = {
      val dl = toks(id).size.toLong
      terms.map { t =>
        val tf = toks(id).count(_ == t).toLong
        val df = docs.count { case (i, _) => toks(i).contains(t) }.toLong
        tf.toDouble * 2.2 / (tf.toDouble + 1.2 * (0.25 + 0.75 *
          ((dl * n).toDouble / s.toDouble))) *
          (((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
      }.reduce(_ + _)
    }
    val got = TextOps.bm25(docs.toDF("doc_id", "text"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    docs.foreach { case (id, _) => assert(got(id) == score(id), s"doc $id") }
  }

  test("novelty equals a naive first-occurrence scan on random near-dup corpora") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 12).map(i => s"w$i")
    val docs = (1L to 40L).map { i =>
      // random windows over a tiny vocab → heavy shingle sharing
      val words = Seq.fill(5 + rnd.nextInt(8))(base(rnd.nextInt(base.length)))
      (i, words.mkString(" "))
    }
    val w = 3
    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < w) Set.empty
      else (0 to t.length - w).map(j => t.slice(j, j + w).mkString(" ")).toSet
    }
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, text) =>
      shingleSet(text).foreach(sh =>
        firstDoc.get(sh) match {
          case Some(prev) if prev <= id => ()
          case _ => firstDoc(sh) = id
        })
    }
    val expected = docs.flatMap { case (id, text) =>
      val ss = shingleSet(text)
      if (ss.isEmpty) None
      else {
        val novel = ss.count(sh => firstDoc(sh) == id).toLong
        Some((id, ss.size.toLong, novel, novel.toDouble / ss.size.toDouble))
      }
    }.toSet
    val got = TextOps.novelty(docs.toDF("doc_id", "text"), w)
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("attribution equals a naive per-conversion scan on random streams") {
    val rnd = new scala.util.Random(67)
    val types = Seq("view", "click", "email", "purchase")
    val W = 3600000000L * 3
    // unique (user, us) by construction: us = index-derived
    val rows = (0 until 500).map { i =>
      (i.toLong, (i % 9).toLong, i.toLong * 977000000L + (i % 9),
        types(rnd.nextInt(types.length)))
    }
    val ev = rows.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Analytics.attribution(ev, lookbackUs = W)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), Option(r.getString(4)), Option(r.getString(5))))).toMap
    val expect = rows.groupBy(_._2).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(_._3)
      sorted.filter(_._4 == "purchase").map { p =>
        val win = sorted.filter(e =>
          e._3 >= p._3 - W && e._3 < p._3 && e._4 != "purchase")
        p._1 -> ((win.size.toLong, win.headOption.map(_._4), win.lastOption.map(_._4)))
      }
    }
    assert(got == expect && got.nonEmpty)
  }

  test("markovStationary equals a naive matrix power iteration") {
    val rnd = new scala.util.Random(73)
    val types = Seq("a", "b", "c", "d")
    val rows = (0 until 400).map { i =>
      (i.toLong, (i % 6).toLong, i.toLong * 1000000L, types(rnd.nextInt(4)))
    }
    val ev = rows.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val scale = 1000000000L
    val got = Analytics.markovStationary(ev, iters = 3, scale = scale)
      .select("state", "pi_scaled").as[(String, Long)].collect().toMap
    // naive: count transitions per user stream, then the integer rounds
    val trans = rows.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val s = evs.sortBy(e => (e._3, e._1)).map(_._4)
      s.zip(s.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val outTot = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val states = trans.flatMap { case ((f, t), _) => Seq(f, t) }.toSet.toSeq.sorted
    var pi = states.map(_ -> scale / states.size).toMap
    for (_ <- 1 to 3) {
      val in = states.map { s =>
        s -> trans.collect { case ((f, t), n) if t == s =>
          (pi(f) * n) / outTot(f) }.sum
      }.toMap
      pi = in
    }
    assert(got == pi)
  }
}
