package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming DOCUMENT ingestion — the incremental twin of the batch
  * curation pipeline's gate stage ([[graft.ext.Pipelines.curateCorpus]]):
  * a continuously-arriving crawl is gated (language, token range, alpha
  * ratio — the same expressions as the batch path, so batch output is the
  * oracle by construction), exact-deduplicated by content fingerprint,
  * and rolled up into per-source admitted counts. The streaming family
  * elsewhere in this repo streams EVENTS; this is the corpus-side shape a
  * 100 TB training-data pipeline actually runs on ingest: admit, dedup,
  * count — then hand the admitted stream to the batch near-dup/curation
  * passes downstream.
  *
  * Scale notes: the gates are map-only (no shuffle); exact dedup is a
  * stateful dropDuplicates keyed (source, fingerprint) — one state row
  * per distinct admitted fingerprint per source, hash-partitioned across
  * the cluster exactly like the batch exact-dedup shuffle (no watermark:
  * corpus identity has no event time — a production deployment bounds
  * state with a retention window or an external fingerprint store, the
  * same tradeoff the batch incremental pipeline documents); the rollup is
  * |sources|-bounded. Keying the dedup by (source, fp) rather than fp
  * alone makes the counts deterministic — a fingerprint shared across
  * sources would otherwise credit whichever arrival won the race. */
object DocStreams {

  /** Footer schemas memoized per path (immutable fixtures — same
    * rationale as the events-side memo). */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val schema = schemaMemo.computeIfAbsent(s"$dir/documents.parquet",
      p => spark.read.parquet(p).schema)
    spark.readStream
      .schema(schema)
      .option("basePath", dir)
      // glob form: FileStreamSource rejects a bare file path
      .parquet(s"$dir/documents.parque[t]")
  }

  /** Gate → fingerprint-dedup → per-source admitted counts. Complete
    * output mode: the sink holds one row per source, upserted per batch. */
  def curatedSourceCounts(docs: DataFrame,
      lang: String = "en", minTokens: Long = 10, maxTokens: Long = 100000,
      minAlphaRatio: Double = 0.5): DataFrame =
    docs
      .select(col("source"), col("lang"), col("text"),
        graft.ext.TextOps.tokenCount("text").as("n_tokens"),
        graft.ext.TextOps.charCount("text").as("n_chars"),
        graft.ext.TextOps.alphaCount("text").as("n_alpha"))
      .withColumn("alpha_ratio",
        when(col("n_chars") > 0,
          col("n_alpha").cast("double") / col("n_chars")).otherwise(lit(0.0)))
      .filter(col("lang") === lang &&
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
        col("alpha_ratio") >= minAlphaRatio)
      .select(col("source"), md5(col("text")).as("fp"))
      .dropDuplicates("source", "fp")
      .groupBy("source").agg(count(lit(1)).as("n_admitted"))
}
