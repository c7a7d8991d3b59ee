package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession.spark

/** Randomized differentials for the Stats operators: the distributed
  * window/aggregate formulations must equal naive sequential
  * reimplementations on arbitrary (seeded) inputs. */
class StatsPropertySpec extends AnyFunSuite {
  import spark.implicits._

  test("cusumChangepoints equals the textbook sequential recurrence on random streams") {
    val rnd = new scala.util.Random(57)
    for (trial <- 0 until 3) {
      val slack = Seq(10L, 50L, 100L)(trial)
      val h = Seq(50L, 200L, 400L)(trial)
      val rows = (0 until 400).map { i =>
        (i.toLong, (i % 7).toLong, i.toLong * 60000000L,
          (rnd.nextInt(5000) + 1).toDouble / 100.0)
      }
      val ev = rows.toDF("event_id", "user_id", "us", "value")
        .withColumn("ts", timestamp_micros(col("us")))
      val got = Stats.cusumChangepoints(ev, slackPct = slack, hPct = h)
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
      // naive per-user sequential CUSUM
      val expect = rows.groupBy(_._2).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1))
        val cents = sorted.map(e => math.round(e._4 * 100))
        val ref = cents.sum / cents.length
        val k = (ref * slack) / 100
        val hh = (ref * h) / 100
        var sp = 0L; var sn = 0L
        sorted.zip(cents).flatMap { case (e, c) =>
          sp = math.max(0L, sp + c - ref - k)
          sn = math.max(0L, sn + ref - k - c)
          if (sp > hh || sn > hh) {
            val dir = if (sp > hh && sn > hh) "both"
              else if (sp > hh) "up" else "down"
            Some(e._1 -> ((sp, sn, dir)))
          } else None
        }
      }
      assert(got == expect, s"trial $trial (slack=$slack h=$h)")
    }
  }

  test("botRates burst equals the naive sliding-window maximum") {
    val rnd = new scala.util.Random(91)
    val rows = (0 until 300).map { i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(7200).toLong * 1000000L)
    }.distinct
    // dedupe ties within a user (fixture guarantees uniqueness; emulate it)
    val uniq = rows.groupBy(r => (r._2, r._3)).values.map(_.head).toSeq
    val ev = uniq.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val W = 60000000L
    val got = Stats.botRates(ev, burstUs = W)
      .select("user_id", "max_burst").as[(Long, Long)].collect().toMap
    val expect = uniq.groupBy(_._2).map { case (u, evs) =>
      val ts = evs.map(_._3).sorted
      u -> ts.map(t => ts.count(x => x >= t && x < t + W).toLong).max
    }
    assert(got == expect)
  }

  test("seasonality cell means and R² match the naive decomposition (within floor bias)") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 500).map { i =>
      (i.toLong, rnd.nextInt(14 * 24).toLong * 3600000000L + i,
        (rnd.nextInt(2000) + 1).toDouble / 100.0)
    }
    val ev = rows.toDF("event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("event_type", lit("t"))
    val got = Stats.seasonality(ev)
      .select("dow", "hour", "n", "cell_mean", "r2_seasonal")
      .as[(Long, Long, Long, Double, Double)].collect()
    // naive: group by (dow, hour) on the same integer calendar arithmetic
    val cells = rows.groupBy { r =>
      val day = r._2 / 86400000000L
      ((day + 4) % 7, (r._2 / 3600000000L) % 24)
    }.map { case (k, evs) =>
      k -> (evs.size.toLong,
        evs.map(e => BigDecimal(e._3)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .sum / evs.size)
    }
    got.foreach { case (d, hh, n, mean, _) =>
      val (en, emean) = cells((d, hh))
      assert(n == en && math.abs(mean - emean) < 1e-9)
    }
    // R² within the floored-term bias of the naive value
    val xs = rows.map(_._3)
    val grand = xs.sum / xs.size
    val ssTot = xs.map(x => (x - grand) * (x - grand)).sum
    val ssB = cells.values.map { case (n, m) => n * (m - grand) * (m - grand) }.sum
    val r2 = got.head._5
    assert(math.abs(r2 - ssB / ssTot) < 1e-4)
  }
}
