package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession.spark

class TemporalSpec extends AnyFunSuite {
  import spark.implicits._

  test("forward as-of join picks the earliest right row at or after each left time") {
    val quotes = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0), (1L, 30L, 300.0),
      (2L, 15L, 150.0)).toDF("k", "t", "px")
    val trades = Seq(
      (1L, "a", 5L), (1L, "b", 10L), (1L, "c", 25L), (1L, "d", 99L),
      (2L, "e", 14L), (2L, "f", 16L)).toDF("k", "id", "t")
    val out = AsOf.asofJoin(trades, quotes, "k", "t", Map("px" -> "ref"),
        forward = true)
      .select("id", "ref").as[(String, Double)].collect().toMap
    // "a" (t=5) → quote t=10; "b" (t=10) → same-instant quote (equality
    // included); "c" (t=25) → t=30; "d" (t=99, after last quote) dropped;
    // "e" (t=14) → t=15; "f" (t=16, after key 2's only quote) dropped
    assert(out == Map("a" -> 100.0, "b" -> 100.0, "c" -> 300.0, "e" -> 150.0))
  }

  test("state intervals collapse runs of equal state into validity ranges") {
    val ev = Seq(
      (1L, "view", 10L, 1L), (1L, "view", 20L, 2L), (1L, "click", 30L, 3L),
      (1L, "view", 40L, 4L), (2L, "view", 5L, 5L))
      .toDF("user_id", "event_type", "us", "event_id")
    val out = Temporal.stateIntervals(ev, "user_id", "event_type", "us", "event_id")
      .orderBy("user_id", "valid_from_us")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // the second "view" run at t=40 is a NEW island, not merged with 10-20
    assert(out == Seq(
      (1L, "view", 10L, 20L, 2L), (1L, "click", 30L, 30L, 1L),
      (1L, "view", 40L, 40L, 1L), (2L, "view", 5L, 5L, 1L)))
  }

  test("decayed trailing sum: exact decimal fold, newest term at weight 1") {
    val ev = Seq((1L, 10L, 1L, 4.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 1.0))
      .toDF("user_id", "us", "event_id", "value")
    val out = Temporal.decayedTrailingSum(ev, "user_id", "us", "event_id",
        "value", lookback = 10, decay = 0.5)
      .orderBy("us").select("decayed_sum").as[String].collect().toSeq
    // t1: 4; t2: 2 + 4*0.5 = 4; t3: 1 + 2*0.5 + 4*0.25 = 3 — scale-12 strings
    assert(out == Seq("4.000000000000", "4.000000000000", "3.000000000000"))
  }

  test("decayed trailing sum honors the lookback horizon") {
    val ev = (1 to 5).map(i => (1L, i.toLong * 10, i.toLong, 1.0))
      .toDF("user_id", "us", "event_id", "value")
    val out = Temporal.decayedTrailingSum(ev, "user_id", "us", "event_id",
        "value", lookback = 2, decay = 0.5)
      .orderBy("us").select("decayed_sum").as[String].collect().toSeq
    // window of 2: first row 1.0, every later row 1 + 0.5
    assert(out == Seq("1.000000000000") ++ Seq.fill(4)("1.500000000000"))
  }

  test("windowed dedup collapses same-window duplicates to min id + count") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    def ts(mins: Int) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val ev = Seq(
      (1L, ts(0), 7L, "click"), (1L, ts(10), 9L, "click"), // same hour → dup
      (1L, ts(50), 3L, "click"), // 11:05 → next hour bucket
      (2L, ts(0), 4L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.windowedDedup(ev, "ts", "event_id",
        Seq("user_id", "event_type"))
      .orderBy("w_us", "user_id")
      .select("user_id", "keep_id", "n_dups").as[(Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq((1L, 7L, 2L), (2L, 4L, 1L), (1L, 3L, 1L)))
  }

  test("streaming windowed dedup equals the batch form on the fixture") {
    import org.apache.spark.sql.streaming.Trigger
    spark.streams.active.filter(q => Option(q.name).contains("temporal_windedup"))
      .foreach(_.stop())
    val q = graft.streaming.EventStreams.windowedDedup(
        graft.streaming.EventStreams.readEvents(spark, graft.SparkTestSession.sf0001))
      .writeStream.format("memory").queryName("temporal_windedup")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("temporal_windedup")
      .select(unix_micros(col("w_start")).as("w_us"), col("user_id"),
        col("event_type"), col("keep_id"), col("n_dups"))
      .collect().map(_.toSeq).toSet
    val batch = Temporal.windowedDedup(
        graft.etl.IngestOps.table(spark, graft.SparkTestSession.sf0001, "events"),
        "ts", "event_id", Seq("user_id", "event_type"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("forward as-of plan: one keyed shuffle, no theta-join fallback") {
    val ev = graft.etl.IngestOps.table(spark, graft.SparkTestSession.sf0001, "events")
    val left = ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .groupBy("user_id", "us").agg(max("value").as("value"))
    val plan = AsOf.asofJoin(left, right, "user_id", "us",
      Map("value" -> "next_value"), forward = true).queryExecution.executedPlan
    var bad: Option[String] = None
    graft.etl.PlanWalk.visit(plan) { p =>
      val n = p.getClass.getSimpleName
      if (n.contains("BroadcastNestedLoopJoin") || n.contains("CartesianProduct"))
        bad = Some(n)
    }
    assert(bad.isEmpty, s"forward as-of degraded to $bad")
  }

  test("intervalConcurrency: knowns on hand-built intervals") {
    // [0,10) [5,15) [20,25): active counts 1,2,1,0,1,0 at the boundaries
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 25L)).toDF("s", "e")
    val got = Temporal.intervalConcurrency(iv, "s", "e")
      .orderBy("us")
      .select("us", "n_active").as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1L), (5L, 2L), (10L, 1L), (15L, 0L),
      (20L, 1L), (25L, 0L)))
  }

  test("intervalConcurrency: random differential vs naive per-boundary count") {
    val rnd = new scala.util.Random(7)
    val iv = Seq.fill(300) { val s = rnd.nextInt(500).toLong; (s, s + 1 + rnd.nextInt(80)) }
    val got = Temporal.intervalConcurrency(iv.toDF("s", "e"), "s", "e")
      .select("us", "n_active").as[(Long, Long)].collect().toMap
    // naive: active at t = #{[s,e) : s <= t < e}
    got.foreach { case (t, n) =>
      val naive = iv.count { case (s, e) => s <= t && t < e }.toLong
      assert(n === naive, s"at t=$t")
    }
    // every boundary instant appears exactly once
    assert(got.size === (iv.map(_._1) ++ iv.map(_._2)).distinct.size)
  }

  test("withGlobalRunningSum: equals local prefix sum; partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0 until 500).toList)
      .map(k => (k.toLong, (rnd.nextInt(21) - 10).toLong))
    val df = rows.toDF("k", "w")
    val got = graft.etl.IngestOps
      .withGlobalRunningSum(df.repartition(7), col("k"), col("w"), "rs")
      .select("k", "rs").as[(Long, Long)].collect().toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, w) =>
      acc += w
      assert(got(k) === acc, s"at k=$k")
    }
    val again = graft.etl.IngestOps
      .withGlobalRunningSum(df.repartition(3), col("k"), col("w"), "rs")
      .select("k", "rs").as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("sessionIntervals: gap splits, bounds, and event counts") {
    val HourUs = 3600000000L
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 600L * 1000000), // session 1: 2 events
      (3L, 1L, 3L * HourUs),                  // session 2 after 2.8h gap
      (4L, 2L, 0L))                           // other user
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Temporal.sessionIntervals(ev)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, 0L, 600000000L),
      (1L, 2L, 1L, 3L * HourUs, 3L * HourUs),
      (2L, 1L, 1L, 0L, 0L)))
  }

  test("timeWeightedAvg: step-signal integral, single point, duplicate collapse") {
    // user 1: v=10 held for 30us, v=20 held for 10us → (300+200)/40 = 12.5
    // user 2: single observation → its own value
    // user 3: duplicate instant collapses to max(2, 8) = 8 before weighting
    val ev = Seq(
      (1L, 0L, 10.0), (1L, 30L, 20.0), (1L, 40L, 0.0),
      (2L, 5L, 7.25),
      (3L, 0L, 2.0), (3L, 0L, 8.0), (3L, 10L, 8.0))
      .toDF("user_id", "us", "value")
    val got = Temporal.timeWeightedAvg(ev, "user_id", "us", "value")
      .orderBy("user_id")
      .select("user_id", "span_us", "twa").as[(Long, Long, Double)]
      .collect().toSeq
    assert(got === Seq((1L, 40L, 12.5), (2L, 0L, 7.25), (3L, 10L, 8.0)))
    // partition invariance: exact integer accumulation can't drift
    val again = Temporal.timeWeightedAvg(ev.repartition(5), "user_id", "us", "value")
      .orderBy("user_id").select("user_id", "span_us", "twa")
      .as[(Long, Long, Double)].collect().toSeq
    assert(again === got)
  }

  test("backlog curve composition: order intervals through the sweep line") {
    val day = 86400000000L
    // o1 [d0, d2-ship +1d) = [0, 3d); o2 [d1, 2d); o3 [5d, 7d)
    val orders = Seq((1L, 0L), (2L, 1L), (3L, 5L))
      .toDF("o_orderkey", "d")
      .withColumn("start_us", col("d") * day).drop("d")
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 6L))
      .toDF("o_orderkey", "sd")
      .withColumn("ship_us", col("sd") * day).drop("sd")
    val iv = orders.join(
        li.groupBy("o_orderkey").agg(max(col("ship_us")).as("last")),
        "o_orderkey")
      .select(col("start_us"), (col("last") + day).as("end_excl_us"))
    val got = Temporal.intervalConcurrency(iv, "start_us", "end_excl_us")
      .select("us", "n_active").as[(Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 1L), (day, 2L), (2 * day, 1L), (3 * day, 0L),
      (5 * day, 1L), (7 * day, 0L)))
  }

  test("incidentOverlap: top-hour incidents, hour-bucketed session overlap") {
    val H = 3600000000L
    // errors (null user → no session of their own): 5 in hour 10, 4 in
    // hour 11 (the top-2, consecutive → ONE merged incident [10h, 12h)),
    // 3 in hour 20 (below the cut)
    val errs = (0 until 5).map(k => (1000L + k, Option.empty[Long],
        "error", 10 * H + k * 1000000L)) ++
      (0 until 4).map(k => (1100L + k, Option.empty[Long],
        "error", 11 * H + k * 1000000L)) ++
      (0 until 3).map(k => (1200L + k, Option.empty[Long],
        "error", 20 * H + k * 1000000L))
    // user 1: session fully inside the incident → overlap = span + 1µs
    val u1 = Seq((1L, Option(1L), "view", 10 * H + 100000000L),
      (2L, Option(1L), "view", 10 * H + 200000000L))
    // user 2: session at hour 5 → never joins
    val u2 = Seq((3L, Option(2L), "view", 5 * H))
    // user 3: session 9h50–10h20 (15-min steps) → clipped overlap 20min+1µs
    val u3 = Seq((4L, Option(3L), "view", 9 * H + 3000000000L),
      (5L, Option(3L), "view", 10 * H + 300000000L),
      (6L, Option(3L), "view", 10 * H + 1200000000L))
    val e = (errs ++ u1 ++ u2 ++ u3)
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Temporal.incidentOverlap(e, topHours = 2)
      .select("h_start", "incident_hours", "n_errors", "n_sessions",
        "overlap_us_total")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 2L, 9L, 2L, 100000001L + 1200000001L)))
    // fixture: deterministic under repartition, non-empty
    val fx = graft.etl.IngestOps.table(spark, graft.SparkTestSession.sf0001,
      "events")
    val a = Temporal.incidentOverlap(fx).collect().map(_.toString).sorted.toSeq
    val b = Temporal.incidentOverlap(fx.repartition(7)).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
