package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's relational algebra lacks
  * natively: for every left row, the single latest right row with
  * right.time <= left.time within the same key.
  *
  * Built by composition (preference (a) of the custom-operator ladder in the
  * build brief — no custom SparkPlan needed): tag and union both sides, then
  * one `last(_, ignoreNulls)` running window per right payload column,
  * partitioned by key and ordered by (time, tag) so a right row at the exact
  * left timestamp is visible to it. Cost: ONE shuffle on the key — never the
  * range-join row explosion of the naive `l.time >= r.time` theta join.
  * Equal-time tie-break: right rows sort before left rows (tag 0 < 1).
  *
  * The DuckDB oracle uses its native ASOF JOIN, so the semantics are checked
  * against an independent implementation.
  */
object AsOf {

  /** @param rightPayload right columns to carry (aliased as given)
    * @param inner drop left rows with no as-of match (ASOF JOIN default) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Map[String, String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == time)
    val payloadSrc = rightPayload.keys.toSeq
    val payloadDst = payloadSrc.map(rightPayload)

    val l = left.select(
      (col(key) +: col(time).as("_t") +: lit(1).as("_tag") +:
        leftCols.map(col).toSeq) ++
        payloadSrc.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c")): _*)
    val r = right.select(
      (col(key) +: col(time).as("_t") +: lit(0).as("_tag") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)).toSeq) ++
        payloadSrc.map(c => col(c).as(s"_p_$c")): _*)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select((col(key) +: col("_t") +: col("_tag") +: leftCols.map(col).toSeq) ++
        payloadSrc.zip(payloadDst).map { case (src, dst) =>
          last(col(s"_p_$src"), ignoreNulls = true).over(w).as(dst)
        }: _*)
    val onlyLeft = filled.filter(col("_tag") === 1)
      .withColumnRenamed("_t", time).drop("_tag")
    if (inner) onlyLeft.filter(payloadDst.map(col(_).isNotNull).reduce(_ && _))
    else onlyLeft
  }
}
