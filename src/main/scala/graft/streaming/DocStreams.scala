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

  // ---- streaming NEAR-dup: stateful MinHash-LSH bucket membership ------

  /** One exploded band row per (gated doc, band). */
  case class NdBandRow(doc_id: Long, source: String,
      ingest_ts: java.sql.Timestamp, bi: Int, band: String)

  /** Per-bucket state: the representative (first-arrived doc) and its
    * ingest time in epoch-ms — the retention axis. */
  case class NdBucketState(rep: Long, repMs: Long)

  /** Per-(doc, band) membership verdict emitted by the stateful op:
    * `matched` = the bucket already held an earlier representative when
    * this doc arrived. A doc is ADMITTED iff no band matched — a
    * stateless per-doc rollup any sink consumer can run (the oracle row
    * does exactly that over the durable sink). */
  case class NdVerdict(doc_id: Long, source: String, bi: Int, matched: Boolean)

  /** Streaming near-duplicate detection (VERDICT r15 #2): the batch
    * incremental pipeline's LSH-bucket membership check
    * ([[graft.ext.Pipelines.incrementalIngestNearDup]]) as a CONTINUOUS
    * stateful stream — its implicit state (the standing corpus's band
    * buckets) made explicit as streaming state. An incoming doc is gated
    * (same admission expressions as the rest of the family), MinHash-
    * signed, exploded to its [[graft.ext.Dedup.NumBands]] band buckets,
    * and each bucket's `flatMapGroupsWithState` decides membership: the
    * first arrival registers as the bucket's representative, every later
    * arrival within the retention window is `matched`. Dropping on bucket
    * collision alone is the aggressive fuzzy-dedup mode (LSH bucket
    * membership IS the candidate test; an exact-Jaccard rescore is a
    * downstream batch pass when precision matters, as the batch pipeline
    * documents).
    *
    * Contracts, mirrored from [[curatedDedupBounded]]:
    *  - arrival order = ingest order (monotone doc_id, the fixture's
    *    deterministic axis) — within a batch the min doc_id registers, so
    *    micro-batch boundaries never change verdicts;
    *  - state is BOUNDED by (bucket arrival rate × retention): a
    *    representative evicts via event-time timeout once the watermark
    *    passes its ingest_ts + retention, and a doc arriving after that
    *    re-registers the bucket (the standard retention-window tradeoff,
    *    explicit not hidden). A batch whose watermark already passed a
    *    rep's window treats the state as expired even before the timeout
    *    callback fires (eviction lags one batch).
    *
    * Scale notes: the signature is MAP-ONLY here — a signature is a pure
    * per-row function, so the stream keeps it stateless per doc (the
    * batch family's explode+groupBy formulation is faster IN BATCH via
    * map-side combine, but in a stream it would become a needless
    * stateful aggregation). The one shuffle keys by (bi, band) — the
    * same hash-partitioned bucket axis as the batch LSH join; a hot
    * bucket's per-batch buffer is bounded by batch size, and its STATE is
    * one row regardless of popularity. */
  def neardupBandVerdicts(docs: DataFrame, retentionMin: Long = 5256000L,
      lang: String = "en", minTokens: Long = 10, maxTokens: Long = 100000,
      minAlphaRatio: Double = 0.5
      ): org.apache.spark.sql.Dataset[NdVerdict] = {
    val session = docs.sparkSession
    import session.implicits._
    import graft.ext.Dedup.{NumHashes, NumBands, RowsPerBand}
    val g = gated(withIngestTs(docs), lang, minTokens, maxTokens, minAlphaRatio)
    val sigCols = (0 until NumHashes).map(i =>
      array_min(transform(col("_toks"),
        t => md5(concat(lit(s"mh$i"), t)))).as(s"s$i"))
    val sigs = g
      .withColumn("_toks", array_distinct(graft.ext.TextOps.fastTokens(col("text"))))
      .select(col("doc_id") +: col("source") +: col("ingest_ts") +: sigCols: _*)
    val bandStructs = (0 until NumBands).map { b =>
      val cs = (b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"s$i"))
      struct(lit(b).as("bi"), md5(concat(cs: _*)).as("band"))
    }
    val rows = sigs
      .withWatermark("ingest_ts", s"$retentionMin minutes")
      .select(col("doc_id"), col("source"), col("ingest_ts"),
        explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("source"), col("ingest_ts"),
        col("b.bi").as("bi"), col("b.band").as("band"))
      .as[NdBandRow]
    val retentionMs = retentionMin * 60000L
    rows.groupByKey(r => (r.bi, r.band))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, String), values: Iterator[NdBandRow],
            state: org.apache.spark.sql.streaming.GroupState[NdBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // bounded buffer: this batch's members of ONE bucket (≤ batch
            // size even for a hot bucket; cross-batch population lives in
            // the one-row state, never in memory)
            val vs = values.toVector
            val wm = state.getCurrentWatermarkMs()
            val live = state.getOption.filter(_.repMs + retentionMs > wm)
            val first = vs.minBy(_.doc_id)
            val rep = live match {
              case Some(st) if st.rep <= first.doc_id => st
              case _ => NdBucketState(first.doc_id, first.ingest_ts.getTime)
            }
            state.update(rep)
            // strictly beyond the watermark (Spark rejects a stale timeout)
            state.setTimeoutTimestamp(math.max(rep.repMs + retentionMs, wm + 1))
            vs.iterator.map(v =>
              NdVerdict(v.doc_id, v.source, v.bi, matched = v.doc_id > rep.rep))
          })
  }
}
