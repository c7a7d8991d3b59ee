package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (100 TB posture, SURVEY.md §7 scale notes).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) covers
  * sort-merge joins at runtime; `saltedJoin` is the explicit fallback for
  * hot keys that concentrate in one task — e.g. joining events against a
  * per-key dimension where one key holds 30% of traffic.
  *
  * Mechanics: the big side gets a deterministic salt in [0, factor) derived
  * from its row content; the small side is replicated `factor` times, one
  * copy per salt value. The join key becomes (key, salt), splitting each hot
  * key across `factor` shuffle partitions. Result set is identical to the
  * unsalted join (inner/left semantics preserved; the small side must be
  * unique per key or duplicates multiply the same way they would unsalted).
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val bigCols = big.columns.map(col)
    // content-derived salt: deterministic, uniform, no RNG in the plan
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(bigCols.toSeq: _*)), lit(factor.toLong)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Convenience: top-N heavy keys of a column with frequencies — the
    * detection half of skew handling (run on a sample at scale). */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
