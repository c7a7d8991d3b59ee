package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** C4 — per-row error tolerance (SURVEY.md §2.4).
  *
  * Reference semantics (core/ExcelRowListener.java:164-169,244-271; contract
  * HighVolumeExcelConverter-Contract-v2.0.1.md:186-188):
  *  - continueOnError=true  → log + skip the bad row, keep going
  *  - continueOnError=false → fail fast on the first bad row
  *  - cell *type* issues are never errors (everything is a string)
  *
  * Spark mapping: a "bad row" is one whose structural parse (here: a JSON
  * payload column) fails. PERMISSIVE ≈ continueOnError, FAILFAST ≈ fail-fast.
  * The skipped count is surfaced through a LongAccumulator — the distributed
  * analog of the reference's skippedRows counter — so it aggregates across
  * executors without collecting data.
  */
object ErrorModes {

  /** Marks rows whose `jsonCol` is not a JSON document parseable to the given
    * schema. PERMISSIVE from_json never yields a null struct — malformed rows
    * surface through the corrupt-record column, the same signal Spark's JSON
    * source uses. A null payload is also structural corruption. */
  def corruptJson(jsonCol: Column, schemaDDL: String): Column = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDDL)
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = from_json(jsonCol, schema,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
    parsed.getField("_corrupt_record").isNotNull || jsonCol.isNull
  }

  /** continueOnError=true: drop corrupt rows, counting them into `skipped`.
    * One pass: the corrupt flag is computed by codegen'd expressions; the
    * mapPartitions only filters + counts. */
  def tolerate(df: DataFrame, corrupt: Column, skipped: LongAccumulator): DataFrame = {
    val withFlag = df.withColumn("_corrupt", coalesce(corrupt, lit(true)))
    val schema = withFlag.schema
    val bad = schema.fieldIndex("_corrupt")
    withFlag.mapPartitions { it: Iterator[Row] =>
      it.filter { row =>
        val isBad = row.getBoolean(bad)
        if (isBad) skipped.add(1L)
        !isBad
      }
    }(Encoders.row(schema)).drop("_corrupt")
  }

  /** continueOnError=true, codegen-friendly: drop corrupt rows with a plain
    * `filter`, counting them through `df.observe` instead of a mapPartitions
    * lambda — the whole pipeline stays inside whole-stage codegen / columnar
    * execution, and the count lands in QueryExecution.observedMetrics where
    * the Metrics listener picks it up under the contract's
    * `excel.rows.skipped` name.
    *
    * Spark requires observation names to be unique within one query, so
    * composing several tolerant sources in one action needs a distinct
    * `obsSuffix` per source; the Metrics listener sums every observation
    * under the `graft.skipped` prefix into one skipped-row total. */
  def tolerateObserved(df: DataFrame, corrupt: Column,
      obsSuffix: String = ""): DataFrame = {
    val name = if (obsSuffix.isEmpty) Metrics.SkippedObservation
      else s"${Metrics.SkippedObservation}.$obsSuffix"
    val withFlag = df.withColumn("_corrupt", coalesce(corrupt, lit(true)))
      .observe(name,
        sum(when(col("_corrupt"), 1L).otherwise(0L)).as(Metrics.SkippedColumn),
        count(lit(1)).as("rows_seen"))
    withFlag.filter(!col("_corrupt")).drop("_corrupt")
  }

  /** continueOnError=false: throw on the first corrupt row (FAILFAST).
    * Implemented as a filter predicate so Catalyst cannot prune it away. */
  def failFast(df: DataFrame, corrupt: Column, what: String): DataFrame =
    df.filter(
      when(corrupt, raise_error(lit(s"Malformed $what row (continueOnError=false)")))
        .otherwise(lit(true)))
}
