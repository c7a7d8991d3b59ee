package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal state operators over the `events` table: SCD2-style state
  * intervals, exponentially-decayed trailing sums, and time-windowed
  * telemetry deduplication — the change-tracking / smoothing / dedup steps a
  * large event-ingest pipeline runs between raw landing and feature tables.
  *
  * All three are single-exchange designs: the only shuffle is the hash
  * partitioning on the entity key (window partition and the follow-on
  * groupBy share it), so at 100 TB the data moves once. No driver-side
  * state anywhere.
  */
object Temporal {

  /** Collapse each run of consecutive equal `state` values per `key` into
    * one validity interval — the classic gaps-and-islands compression that
    * turns an append-only event log into SCD2-style (key, state,
    * valid_from, valid_to) history rows. Standard two-window formulation:
    * a change flag via `lag`, a running sum of flags as the island id, then
    * one aggregate per island. Both windows and the groupBy hash on `key`
    * alone, so the whole operator is ONE exchange; (timeUs, ord) is a total
    * order within key, making the island assignment deterministic.
    */
  def stateIntervals(events: DataFrame, key: String, state: String,
      timeUs: String, ord: String): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(col(timeUs), col(ord))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(state), 1).over(byKey))
      .withColumn("_chg",
        when(col("_prev").isNull || col("_prev") =!= col(state), 1L).otherwise(0L))
      .withColumn("_grp", sum(col("_chg")).over(cum))
      .groupBy(col(key), col("_grp"), col(state))
      .agg(min(col(timeUs)).as("valid_from_us"), max(col(timeUs)).as("valid_to_us"),
        count(lit(1)).as("n_events"))
      .select(col(key), col(state), col("valid_from_us"), col("valid_to_us"),
        col("n_events"))
  }

  /** Exponentially-decayed trailing sum (finite-window EWMA numerator):
    * per key, sum of the last `lookback` values weighted decay^distance,
    * newest value at weight 1. The fold quantizes each weighted term to
    * DECIMAL(28,12) and accumulates in decimal, so the result is
    * bit-deterministic and order-independent past the (identical on both
    * engines) per-term double multiply — the oracle can recompute it with a
    * completely different plan (row-number self-join) and still hash-match.
    * Scale 12 matters: with decay 0.5 and lookback 10, a 2-decimal input
    * value times 2^-9 has an 11-digit decimal expansion, so a scale-10
    * quantization lands EXACTLY on the rounding midpoint and the engines'
    * tie rules diverge (Spark HALF_UP on the double's shortest repr, DuckDB
    * nearest on the exact binary value); at scale 12 the cast is exact and
    * no tie can occur. Spark side: one window `collect_list` of ≤
    * `lookback` elements, folded by codegen'd higher-order functions — no
    * self-join, no second shuffle.
    */
  def decayedTrailingSum(events: DataFrame, key: String, timeUs: String,
      ord: String, valueCol: String, lookback: Int = 10,
      decay: Double = 0.5): DataFrame = {
    require(lookback >= 1, "lookback must be at least 1")
    val w = Window.partitionBy(key).orderBy(col(timeUs), col(ord))
      .rowsBetween(-(lookback - 1), Window.currentRow)
    events
      .withColumn("_vals", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn("decayed_sum", expr(
        s"""CAST(aggregate(
           |  zip_with(_vals, sequence(size(_vals) - 1, 0, -1),
           |    (v, k) -> CAST(v * pow(CAST($decay AS DOUBLE), k) AS DECIMAL(28,12))),
           |  CAST(0 AS DECIMAL(28,12)),
           |  (acc, x) -> CAST(acc + x AS DECIMAL(28,12))) AS STRING)""".stripMargin))
      .drop("_vals")
  }

  /** Gap-based session intervals per user — the library form of the
    * lag/gap sessionization the events_sessionize query runs inline: a new
    * session opens when the inter-event gap exceeds `gapUs`. One exchange
    * on user_id (both windows and the rollup share it). */
  def sessionIntervals(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("_prev", lag(col("us"), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull || col("us") - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"))
  }

  /** Concurrency curve over a set of time intervals: at every distinct
    * boundary instant, how many intervals are active — the sweep-line
    * answer to "peak concurrent sessions", with NO pair enumeration (an
    * interval-overlap self-join is quadratic in busy periods; the sweep is
    * linear). Convention is half-open [start, end): an interval ending at
    * `t` is inactive at `t`, one starting at `t` is active — i.e. deltas at
    * an instant apply ends-before-starts, which falls out of summing the
    * net delta per distinct instant.
    *
    * Shape: boundaries (2 rows per interval) → one map-side-combined
    * groupBy on the instant (making the sweep key UNIQUE — required by the
    * running sum, and what makes the output deterministic under ties) →
    * [[graft.etl.IngestOps.withGlobalRunningSum]], the deterministic
    * bucketed prefix sum (no single-reducer global window at any scale).
    */
  def intervalConcurrency(intervals: DataFrame, startUs: String,
      endUs: String): DataFrame = {
    val deltas = intervals.select(col(startUs).as("us"), lit(1L).as("_d"))
      .union(intervals.select(col(endUs).as("us"), lit(-1L).as("_d")))
      .groupBy("us").agg(
        sum(col("_d")).as("delta"),
        sum(when(col("_d") > 0, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("_d") < 0, 1L).otherwise(0L)).as("n_ends"))
    graft.etl.IngestOps
      .withGlobalRunningSum(deltas, col("us"), col("delta"), "n_active")
      .select("us", "n_starts", "n_ends", "delta", "n_active")
  }

  /** TIME-WEIGHTED average per key — the irregular-sampling mean that a
    * plain avg() gets wrong: each observation's value is weighted by how
    * long it was current (t_{i+1} − t_i, last observation weight 0), i.e.
    * the left-Riemann integral of the step signal divided by the observed
    * span; a single-observation key degenerates to its own value. The
    * weighted sum accumulates as exact BIGINT cents·µs (2-dp value → cents
    * through DECIMAL, gap in µs — integer addition is associative, so
    * partitioning can never change the hash; decimal→double conversion,
    * which libm-rounds differently across engines, never happens), with
    * ONE int64→double conversion + division at the end. Magnitude bound:
    * |cents|·span_µs must stay under 2^63 ≈ 9.2e18 — with 2-dp values
    * ≤ 10^6 that allows a ~3-century per-key span. Duplicate (key, time)
    * observations collapse to max(value) first, making the lead() order
    * total. One exchange on the key (lead window + rollup co-partitioned). */
  def timeWeightedAvg(events: DataFrame, key: String, timeUs: String,
      valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))
      * lit(100)).cast("long")
    val pts = events
      .filter(col(key).isNotNull && col(valueCol).isNotNull)
      .select(col(key), col(timeUs).as("_us"), cents.as("_c"))
      .groupBy(col(key), col("_us")).agg(max("_c").as("_c"))
    val w = Window.partitionBy(key).orderBy("_us")
    pts
      .withColumn("_next", lead(col("_us"), 1).over(w))
      .groupBy(key)
      .agg(min("_us").as("_lo"), max("_us").as("_hi"),
        sum(when(col("_next").isNotNull,
          col("_c") * (col("_next") - col("_us"))).otherwise(lit(0L)))
          .as("_wsum"),
        max(when(col("_next").isNull, col("_c"))).as("_lastc"))
      .select(col(key), (col("_hi") - col("_lo")).as("span_us"),
        when(col("_hi") > col("_lo"),
          col("_wsum").cast("double") /
            ((col("_hi") - col("_lo")).cast("double") * lit(100.0)))
          .otherwise(col("_lastc").cast("double") / lit(100.0)).as("twa"))
  }

  def timeWeightedAvgSqlDuck: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS us,
      |    max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1, 2),
      | l AS (SELECT user_id, us, c,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us) AS nxt FROM p),
      | a AS (SELECT user_id, min(us) AS lo, max(us) AS hi,
      |    CAST(sum(CASE WHEN nxt IS NOT NULL THEN c * (nxt - us) ELSE 0 END) AS BIGINT) AS wsum,
      |    max(CASE WHEN nxt IS NULL THEN c END) AS lastc
      |  FROM l GROUP BY user_id)
      |SELECT user_id, hi - lo AS span_us,
      |  CASE WHEN hi > lo THEN CAST(wsum AS DOUBLE) / (CAST(hi - lo AS DOUBLE) * 100.0)
      |       ELSE CAST(lastc AS DOUBLE) / 100.0 END AS twa
      |FROM a ORDER BY user_id""".stripMargin

  /** Time-windowed telemetry dedup: within each tumbling window, collapse
    * rows sharing the identity `keys` to one keeper (min id) plus the
    * duplicate count — the "same logical event reported twice inside the
    * retry horizon" cleanup every event pipeline runs on landing. Built on
    * Spark's `window()` so the batch form is the EXACT aggregation the
    * streaming twin runs with a watermark (EventStreams.windowedDedup);
    * one shuffle on (window, keys), map-side combined.
    */
  def windowedDedup(events: DataFrame, tsCol: String, idCol: String,
      keys: Seq[String], windowDur: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col(tsCol), windowDur) +: keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(unix_micros(col("window.start")).as("w_us") +: keys.map(col) :+
        col("keep_id") :+ col("n_dups"): _*)
}
