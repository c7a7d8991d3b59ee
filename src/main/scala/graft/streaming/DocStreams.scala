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
      // glob form: FileStreamSource rejects a bare file path; composed via
      // the shared metachar-guarded helper (ADVICE r14)
      .parquet(EventStreams.fileGlob(dir, "documents.parquet"))
  }

  /** The map-only admission gates — identical expressions to the batch
    * curation path, shared by both dedup variants so "batch output is the
    * oracle by construction" holds for each. */
  private def gated(docs: DataFrame, lang: String, minTokens: Long,
      maxTokens: Long, minAlphaRatio: Double): DataFrame = {
    // the fixture carries its own n_chars; the gate recomputes all three
    // counters from text, so clashing input columns are projected away
    val computed = Set("n_tokens", "n_chars", "n_alpha", "alpha_ratio")
    val keep = docs.columns.filterNot(computed.contains)
    docs
      .select(keep.map(col) :+
        graft.ext.TextOps.tokenCount("text").as("n_tokens") :+
        graft.ext.TextOps.charCount("text").as("n_chars") :+
        graft.ext.TextOps.alphaCount("text").as("n_alpha"): _*)
      .withColumn("alpha_ratio",
        when(col("n_chars") > 0,
          col("n_alpha").cast("double") / col("n_chars")).otherwise(lit(0.0)))
      .filter(col("lang") === lang &&
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
        col("alpha_ratio") >= minAlphaRatio)
  }

  /** Gate → fingerprint-dedup → per-source admitted counts. Complete
    * output mode: the sink holds one row per source, upserted per batch. */
  def curatedSourceCounts(docs: DataFrame,
      lang: String = "en", minTokens: Long = 10, maxTokens: Long = 100000,
      minAlphaRatio: Double = 0.5): DataFrame =
    gated(docs, lang, minTokens, maxTokens, minAlphaRatio)
      .select(col("source"), md5(col("text")).as("fp"))
      .dropDuplicates("source", "fp")
      .groupBy("source").agg(count(lit(1)).as("n_admitted"))

  /** Deterministic ingest-time axis for the retention-window dedup: the
    * fixture has no arrival timestamp, so one is derived from doc_id (one
    * doc per minute, starting one day after the epoch) — a stand-in for
    * the crawl's real fetch time, deterministic so the oracle and every
    * replay agree. The one-day base keeps every ingest_ts strictly ABOVE
    * the stream's initial watermark (epoch): doc_id 0 AT the epoch was
    * dropped by the late-row filter at sf0.01 (r15). */
  def withIngestTs(docs: DataFrame): DataFrame =
    docs.withColumn("ingest_ts",
      timestamp_micros(col("doc_id") * lit(60000000L) + lit(86400000000L)))

  /** BOUNDED-STATE variant of the exact fingerprint dedup (VERDICT r14 #4)
    * — the production shape [[curatedSourceCounts]]'s scaladoc promises:
    * `dropDuplicatesWithinWatermark` over the ingest-time axis keeps one
    * state row per (source, fp) only within the retention window — the
    * engine evicts a key once the watermark passes its ingest_ts +
    * retention, so state is bounded by (arrival rate × retention), not by
    * corpus lifetime. The semantic tradeoff is explicit: a duplicate
    * re-arriving AFTER retention is re-admitted (the standard
    * retention-window dedup contract; an external fingerprint store is the
    * alternative for exact forever-dedup, as the unbounded variant
    * documents). Append mode emits each admitted (source, fp) exactly once
    * per retention window; with duplicates arriving inside the window
    * (DocStreamsSpec and the oracle row drive real ones) the emitted set
    * equals the batch DISTINCT over the gated docs. */
  def curatedDedupBounded(docs: DataFrame, retention: String = "30 minutes",
      lang: String = "en", minTokens: Long = 10, maxTokens: Long = 100000,
      minAlphaRatio: Double = 0.5): DataFrame =
    gated(withIngestTs(docs), lang, minTokens, maxTokens, minAlphaRatio)
      .select(col("source"), md5(col("text")).as("fp"), col("ingest_ts"))
      .withWatermark("ingest_ts", retention)
      .dropDuplicatesWithinWatermark("source", "fp")
      .select(col("source"), col("fp"))
}
