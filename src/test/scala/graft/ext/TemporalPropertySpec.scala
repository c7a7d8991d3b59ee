package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession.spark

/** Randomized differentials for the temporal operators: the distributed
  * forms must equal naive sequential reimplementations on arbitrary seeded
  * inputs. */
class TemporalPropertySpec extends AnyFunSuite {
  import spark.implicits._

  // (user, us, id, type, value) with duplicate timestamps and dense users
  private def randomEvents(seed: Int, n: Int): Seq[(Long, Long, Long, String, Double)] = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("a", "b", "c")
    // values strictly positive: a zero decimal sum prints in scientific
    // notation ("0E-12") on the JVM side, a formatting artifact orthogonal
    // to what this differential checks
    (1 to n).map(i => (rnd.nextInt(12).toLong, rnd.nextInt(300).toLong * 10L,
      i.toLong, types(rnd.nextInt(types.length)),
      (rnd.nextInt(9999) + 1) / 100.0))
  }

  test("stateIntervals equals a naive run-length scan on random streams") {
    val ev = randomEvents(11, 500)
    val expected = ev.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3)) // (us, id) total order
      val runs = scala.collection.mutable.ListBuffer
        .empty[(Long, String, Long, Long, Long)]
      sorted.foreach { case (_, us, _, typ, _) =>
        runs.lastOption match {
          case Some((uu, t, from, _, n)) if t == typ =>
            runs.update(runs.length - 1, (uu, t, from, us, n + 1))
          case _ => runs += ((u, typ, us, us, 1L))
        }
      }
      runs
    }.toSet
    val got = Temporal.stateIntervals(
        ev.toDF("user_id", "us", "event_id", "event_type", "value"),
        "user_id", "event_type", "us", "event_id")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("decayedTrailingSum equals a naive weighted fold on random streams") {
    val ev = randomEvents(23, 400)
    val expected = ev.groupBy(_._1).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3)).toIndexedSeq
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 9), i + 1)
        // same arithmetic path: per-term double product quantized to
        // DECIMAL(28,12), exact decimal accumulation
        val sum = win.reverse.zipWithIndex.map { case (e, k) =>
          BigDecimal(e._5 * math.pow(0.5, k))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (sorted(i)._3, sum.setScale(12).toString)
      }
    }.toSet
    val got = Temporal.decayedTrailingSum(
        ev.toDF("user_id", "us", "event_id", "event_type", "value"),
        "user_id", "us", "event_id", "value")
      .select("event_id", "decayed_sum").as[(Long, String)].collect().toSet
    assert(got == expected)
  }

  test("windowedDedup conserves rows and keeps the minimum id per group") {
    val ev = randomEvents(37, 500).map { case (u, us, id, typ, v) =>
      (u, new java.sql.Timestamp(1704067200000L + us * 60000L), id, typ, v)
    }
    val df = ev.toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Temporal.windowedDedup(df, "ts", "event_id",
        Seq("user_id", "event_type"))
      .as[(Long, Long, String, Long, Long)].collect()
    // row conservation: group sizes sum to the input size
    assert(out.map(_._5).sum == ev.size)
    // each keeper is the true minimum id of its (hour, user, type) group
    val byGroup = ev.groupBy { case (u, ts, _, typ, _) =>
      (ts.getTime / 3600000L, u, typ) }
    val expected = byGroup.map { case ((hr, u, typ), rows) =>
      (hr * 3600000000L, u, typ, rows.map(_._3).min, rows.size.toLong) }.toSet
    assert(out.toSet.map((t: (Long, Long, String, Long, Long)) => t) == expected)
  }
}
