import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: times named operators on the documents fixture and on a
  * 10× replica (each copy re-keyed into a fresh doc_id range, texts
  * perturbed per replica so the corpus grows in CONTENT, not just rows —
  * pure duplicates would collapse inside dedup and understate join work).
  * Prints seconds at 1× and 10× plus the ratio; sublinear-to-linear ratios
  * are the pass signal. Args: operator names (default: the round-7 set). */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val docs = graft.etl.IngestOps.table(spark, dir, "documents")

    // Replica sets MATERIALIZE to parquet and read back as one scan. A
    // lazy reps-way union would re-embed its whole branch list at every
    // reference an operator makes to its input — measured at 100x: a
    // 40,000-FileScan plan tree whose Catalyst planning time dwarfed the
    // actual data processing. A real Nx corpus is one bigger scan, and
    // that is what the probe must hand the operators.
    val scratch = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    def materialize(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.DataFrame = {
      val p = s"$scratch/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    val x10 = materialize((0 until reps).map { r =>
      docs.select(
        (col("doc_id") + lit(r * maxId)).as("doc_id"),
        (if (r == 0) col("text")
         else concat(col("text"), lit(s" replica$r marker"))).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(if (r == 0) 0 else s" replica$r marker".length))
          .as("n_chars"))
    }.reduce(_ unionAll _), "docs")

    // ---- other table families: embeddings (identical-similarity replicas:
    // per-replica scalar scaling preserves every cosine, so similarity
    // density grows 10x — the stress case) and events (time-shifted
    // replicas: the corpus grows along the time axis, window populations
    // stay constant — the realistic growth shape)
    val emb = graft.etl.IngestOps.table(spark, dir, "embeddings")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    val emb10 = materialize((0 until reps).map { r =>
      emb.select((col("vec_id") + lit(r * maxVec)).as("vec_id"),
        expr(s"transform(embedding, x -> x * CAST(1.0 + $r * 0.125 AS FLOAT))").as("embedding"),
        col("label"))
    }.reduce(_ unionAll _), "emb")
    val ev = graft.etl.IngestOps.table(spark, dir, "events")
    val maxEv = ev.agg(max("event_id")).head().getLong(0) + 1
    val spanDays = 400L
    val ev10 = materialize((0 until reps).map { r =>
      ev.select((col("event_id") + lit(r * maxEv)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${r * spanDays} DAYS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _), "ev")

    def rangeJoinCount(e: org.apache.spark.sql.DataFrame): Long = {
      val winUs = 600000000L
      val anchors = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("anchor_id"), unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) + lit(winUs)).as("e_us"))
      val points = e.select(col("event_id").as("point_id"),
        unix_micros(col("ts")).as("p_us"), col("value"))
      graft.ext.Ranges.bucketedRangeJoin(points, "p_us", anchors, "s_us", "e_us", winUs)
        .groupBy("anchor_id").agg(count(lit(1))).count()
    }
    def asofCount(e: org.apache.spark.sql.DataFrame): Long = {
      val left = e.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      graft.ext.AsOf.asofJoin(left, clicks, "user_id", "us",
        Map("value" -> "ref_value")).count()
    }

    val docOps: Map[String, org.apache.spark.sql.DataFrame => Long] = Map(
      "text_chunks" -> (d => graft.ext.Chunking.chunkDocs(d).count()),
      "pack_sequences" -> (d => graft.ext.Chunking.packSequences(d).count()),
      "text_top_ngrams" -> (d => graft.ext.Chunking.topNgrams(d).count()),
      "dedup_keep_first_lsh" -> (d => graft.ext.Dedup.dropNearDuplicatesLsh(d).count()),
      "dedup_keep_first_lsh_rep" -> (d => graft.ext.Dedup.dropNearDuplicatesLshRep(d).count()),
      "pipeline_training_examples" -> (d => graft.ext.Pipelines.trainingExamples(d).count()),
      "multimodal_resize" -> (d => graft.ext.Multimodal.resize(graft.ext.Multimodal.asMedia(d)).count()),
      "multimodal_frame_sample" -> (d => graft.ext.Multimodal.frameSample(graft.ext.Multimodal.asMedia(d)).count()),
      "dedup_clusters" -> (d => graft.ext.Dedup.clusterByBuckets(d,
        graft.ext.Dedup.bandBuckets(graft.ext.Dedup.minhashSignatures(d))).count()),
      "text_decontaminate" -> (d => graft.ext.TextOps.decontaminate(
        d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0")).count()),
      "text_dedup_segments" -> (d => graft.ext.TextOps.dedupSegments(d).count()),
      "text_dedup_segments_global" -> (d =>
        graft.ext.TextOps.dedupSegmentsGlobal(d).count()),
      "text_dedup_substrings" -> (d =>
        graft.ext.TextOps.dedupSubstrings(d).count()),
      "text_unicode_nfc" -> (d => d.selectExpr("doc_id",
          "concat(text, ' naïve café') AS raw")
        .select(graft.functions.UnicodeNormalize.nfc(col("raw"))).count()),
      "text_url_canonicalize" -> (d => d.selectExpr("doc_id",
          "concat('HTTPS://Example.COM:443//', source, '/./Docs/', CAST(doc_id AS STRING), '/../', lang, '/Page/?utm_source=x&b=1&a=2#f') AS url_raw")
        .select(graft.ext.TextOps.urlCanonicalize("url_raw")).count()),
      "sample_token_budget" -> (d =>
        graft.ext.Pipelines.mixByTokenBudget(d, "source", "doc_id", 800L).count()),
      "sample_temperature_mix" -> (d =>
        graft.ext.Pipelines.temperatureMix(d).count()),
      "sketch_kmv_overlap" -> (d => graft.ext.Sketch.kmvJaccard(
        graft.ext.Dedup.shingles(d.filter(col("source") === "src0"), 3), col("tok"),
        graft.ext.Dedup.shingles(d.filter(col("source") === "src1"), 3), col("tok"),
        128).count()),
      "text_pii_redact" -> (d => graft.ext.TextOps.piiRedact(d.select(col("doc_id"),
        graft.ext.TextOps.piiSeeded("text").as("text"))).count()),
      "text_postings" -> (d => graft.ext.TextOps.postings(d).count()),
      "pipeline_incremental" -> (d => graft.ext.Pipelines.incrementalIngest(
        d.filter(col("source") === "src0"), d.filter(col("source") =!= "src0")).count()),
      "pipeline_incremental_neardup" -> (d => graft.ext.Pipelines.incrementalIngestNearDup(
        d.filter(col("source") === "src0"), d.filter(col("source") =!= "src0")).count()),
      "text_novelty" -> (d => graft.ext.TextOps.novelty(d).count()),
      "text_surprisal" -> (d => graft.ext.TextOps.surprisal(d).count()),
      "text_vocab_coverage" -> (d => graft.ext.TextOps.vocabCoverage(d).count()),
      "dedup_cross_source_overlap" -> (d => graft.ext.Dedup.crossSourceOverlap(d).count()),
      "quality_ks_drift" -> (d => graft.ext.Stats.ksDrift(d).count()),
      "sample_length_quartiles" -> (d => graft.ext.Pipelines.lengthQuartiles(d).count()),
      "text_bm25" -> (d => graft.ext.TextOps.bm25(d).count()),
      "text_decontaminate_bloom" -> (d => graft.ext.TextOps.decontaminateBloom(
        d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0")).count()),
      "sketch_countmin" -> (d => graft.ext.Sketch.countMinTokens(d).count()),
      "sim_tfidf_pairs" -> (d => graft.ext.TextOps.tfidfCosinePairs(d).count()),
      "dedup_edit_distance" -> (d => graft.ext.Dedup.editDistancePairs(d).count()),
      "profile_documents" -> (d => graft.ext.Stats.profileColumns(d,
        Seq("doc_id", "lang", "source", "n_chars", "text")).count()),
      "dedup_jaccard_prefix" -> (d => graft.ext.Dedup.jaccardPrefixJoin(d).count()),
      "sample_priority_weighted" -> (d =>
        graft.ext.Pipelines.prioritySample(d, "n_chars", "doc_id", 100).count()),
      "graph_pagerank" -> (d => graft.ext.Graph.pageRank(d,
        graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(d))).count()),
      "graph_triangles" -> (d => graft.ext.Graph.triangles(d,
        graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(d))).count()),
      "graph_kcore" -> (d => graft.ext.Graph.kCore(d,
        graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(d))).count()),
      "graph_link_prediction" -> (d => graft.ext.Graph.linkPrediction(
        graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(d))).count()),
      "dedup_containment" -> (d =>
        graft.ext.Dedup.containmentPrefixJoin(d, theta = 0.8).count()),
      "dedup_simhash_pairs" -> (d =>
        graft.ext.Dedup.simhashHammingPairs(d).count()),
      "search_bm25_topk" -> (d => graft.ext.TextOps.searchTopK(d).count()),
      "sample_dedup_weights" -> (d => graft.ext.Pipelines.dedupWeights(d).count()),
      "pipeline_source_cap" -> (d => graft.ext.Pipelines.sourceCap(d).count()),
      "pipeline_shuffle_order" -> (d => graft.ext.Pipelines.shuffleOrder(d).count()),
      "text_gopher_rules" -> (d => graft.ext.TextOps.gopherRules(d).count()),
      "quality_classifier_score" -> (d =>
        graft.ext.TextOps.classifierScore(d).count()),
      "text_dup_fraction" -> (d => graft.ext.TextOps.dupFraction(d).count()),
      "dedup_keep_best" -> (d => graft.ext.Dedup.keepBestInCluster(d).count()),
      "search_eval_ndcg" -> (d => graft.ext.TextOps.searchEval(d).count()),
      "text_bpe_merges" -> (d => graft.ext.TextOps.bpeMerges(d).count()),
      "text_bpe_encode" -> (d => graft.ext.TextOps.bpeEncode(d).count()),
      "sample_kfold" -> (d => graft.ext.Pipelines.kfoldReport(d).count()),
      "sample_kfold_leakage" -> (d => graft.ext.Pipelines.kfoldLeakage(d).count()),
      "pipeline_curriculum" -> (d => graft.ext.Pipelines.curriculumShards(d).count()),
      "sample_dsir" -> (d => graft.ext.Pipelines.dsirSelect(d).count()),
      "dedup_sorted_neighborhood" -> (d =>
        graft.ext.Dedup.sortedNeighborhoodPairs(d).count()),
      "search_phrase" -> (d => graft.ext.TextOps.phraseSearch(d).count()),
      "text_rake_keywords" -> (d => graft.ext.TextOps.rakeKeywords(d).count()),
      "multimodal_phash_pairs" -> (d =>
        graft.ext.Multimodal.phashPairs(graft.ext.Multimodal.asMedia(d)).count()),
      "search_rrf_fusion" -> (d => graft.ext.TextOps.searchRrf(d).count()),
      "graph_lpa_communities" -> (d => graft.ext.Graph.lpaCommunities(d,
        graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(d))).count()),
      "sketch_kmv_difference" -> (d => graft.ext.Sketch.kmvDifference(
        graft.ext.Dedup.shingles(d.filter(col("source") === "src0"), 3), col("tok"),
        graft.ext.Dedup.shingles(d.filter(col("source") === "src1"), 3), col("tok"),
        128).count()))
    val embOps: Map[String, org.apache.spark.sql.DataFrame => Long] = Map(
      "dedup_embedding_cosine_bucketed" ->
        (e => graft.ext.Similarity.cosinePairsBucketed(e).count()),
      "sim_ann_lsh" -> (e => graft.ext.Similarity.annTopK(e).count()),
      "dedup_semantic" -> (e => graft.ext.Similarity.semanticDedup(e).count()),
      "sim_hard_negatives" -> (e => graft.ext.Similarity.hardNegatives(e).count()),
      "sim_pq_adc" -> (e => graft.ext.Similarity.pqTopK(e).count()),
      "sim_pq_recall" -> (e => graft.ext.Similarity.pqRecall(e).count()),
      "sim_ivfpq_topk" -> (e => graft.ext.Similarity.ivfPqTopK(e).count()),
      "sim_knn_classify" -> (e => graft.ext.Similarity.knnClassify(e).count()))
    val evOps: Map[String, org.apache.spark.sql.DataFrame => Long] = Map(
      "events_range_join" -> rangeJoinCount,
      "events_asof_join" -> asofCount,
      "events_resample_ffill" -> (e => graft.ext.AsOf.resampleFfill(
        e.select(col("user_id"), unix_micros(col("ts")).as("us"), col("value")),
        "user_id", "us", "value", 86400000000L).count()),
      "events_quantile_selection" -> (e =>
        graft.ext.Sketch.exactQuantileDisc(e, "value").count()),
      "events_funnel" -> (e => graft.ext.Analytics.funnel(e).count()),
      "events_retention_cohort" -> (e =>
        graft.ext.Analytics.retentionCohorts(e).count()),
      "events_outliers_iqr" -> (e => graft.ext.Analytics.outliersIqr(e).count()),
      "events_outliers_mad" -> (e => graft.ext.Analytics.outliersMad(e).count()),
      "events_value_histogram" -> (e => graft.ext.Analytics.valueHistogram(e).count()),
      "events_quantile_selection_grouped" -> (e =>
        graft.ext.Sketch.exactQuantileDiscByGroup(e, "event_type", "value").count()),
      "events_minmax_scale" -> (e => graft.ext.Analytics.minmaxScale(e).count()),
      "events_transition_matrix" -> (e =>
        graft.ext.Analytics.transitionMatrix(e).count()),
      "events_type_affinity" -> (e => graft.ext.Analytics.typeAffinity(e).count()),
      "events_corr_hour" -> (e => graft.ext.Stats.pearsonByHour(e).count()),
      "events_anomaly_zscore" -> (e => graft.ext.Stats.anomalyZscore(e).count()),
      "events_session_concurrency" -> (e => graft.ext.Temporal.intervalConcurrency(
        graft.ext.Temporal.sessionIntervals(e)
          .withColumn("end_excl_us", col("end_us") + 1L),
        "start_us", "end_excl_us").count()),
      "events_twa" -> (e => graft.ext.Temporal.timeWeightedAvg(
        e.select(col("user_id"), unix_micros(col("ts")).as("us"), col("value")),
        "user_id", "us", "value").count()),
      "events_resample_interp" -> (e => graft.ext.AsOf.resampleInterp(
        e.select(col("user_id"), unix_micros(col("ts")).as("us"), col("value")),
        "user_id", "us", "value", 86400000000L).count()),
      "quality_out_of_order" -> (e =>
        graft.ext.Analytics.outOfOrderRate(e).count()),
      "events_equidepth_hist" -> (e =>
        graft.ext.Analytics.equidepthHistogram(e, "value", 8).count()),
      "events_markov_stationary" -> (e =>
        graft.ext.Analytics.markovStationary(e).count()),
      "sketch_hll_distinct" -> (e =>
        graft.ext.Sketch.hllDistinctByGroup(e, "event_type", "user_id").count()),
      "events_winsorize" -> (e => graft.ext.Analytics.winsorize(e).count()),
      "events_survival_km" -> (e => graft.ext.Analytics.kaplanMeier(e).count()),
      "events_max_drawdown" -> (e => graft.ext.Analytics.maxDrawdown(e).count()),
      "layout_zorder_pruning" -> (e =>
        graft.etl.Layout.zorderPruningAudit(e).count()),
      "events_incident_overlap" -> (e =>
        graft.ext.Temporal.incidentOverlap(e).count()),
      "events_fano_factor" -> (e => graft.ext.Stats.fanoFactor(e).count()))

    val families: Seq[(String, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, Map[String, org.apache.spark.sql.DataFrame => Long])] =
      Seq(("doc", docs, x10, docOps), ("emb", emb, emb10, embOps), ("ev", ev, ev10, evOps))

    // ---- relational family: a full Nx TABLE DIRECTORY, so any SparkEntry
    // query can be probed BY NAME against it. Facts (orders, lineitem)
    // replicate with re-keyed order keys; dimensions stay at 1x — constant
    // dim cardinality under fact growth is the realistic 100 TB shape (and
    // the broadcast-join stressor: the build side must NOT grow with the
    // corpus).
    val relDir = s"$scratch/rel"
    val orders = graft.etl.IngestOps.table(spark, dir, "orders")
    val li = graft.etl.IngestOps.table(spark, dir, "lineitem")
    val maxOrd = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    (0 until reps).map { r =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(r * maxOrd))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$relDir/orders.parquet")
    (0 until reps).map { r =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * maxOrd))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$relDir/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { tn =>
      graft.etl.IngestOps.table(spark, dir, tn)
        .write.mode("overwrite").parquet(s"$relDir/$tn.parquet")
    }
    val relQueries = Seq("q4_order_priority", "q8_market_share",
      "q12_priority_class", "q17_small_qty", "q21_waiting_supplier",
      "q2_min_cost_supplier", "q9_profit_by_nation", "q11_important_parts",
      "q16_supplier_counts", "q20_excess_shipments",
      "sketch_sample_quantiles", "sketch_sample_quantiles_grouped",
      "orders_pareto_front", "orc_roundtrip", "csv_roundtrip",
      "orders_cohort_ltv", "orders_hhi_concentration", "orders_backlog_curve")

    // the all-pairs LSH form is probe-on-request only: its pair volume is
    // quadratic in duplicate density BY DESIGN (measured ~500x at 10x on
    // this dense fixture) — the rep variant is the standing scale path
    val requested = if (args.nonEmpty) args.toSet
      else families.flatMap(_._4.keys).toSet - "dedup_keep_first_lsh" ++ relQueries

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      graft.etl.CacheRegistry.releaseAll()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    for ((_, base, big, ops) <- families; name <- ops.keys.toSeq.sorted if requested(name)) {
      val op = ops(name)
      time(op(base)) // warm codegen/JIT on the small side
      val (t1, n1) = time(op(base))
      val (t10, n10) = time(op(big))
      println(f"PROBE $name%-32s 1x: $t1%6.2fs ($n1%9d rows)  ${reps}x: $t10%6.2fs ($n10%9d rows)  ratio: ${t10 / t1}%5.2f")
    }
    for (name <- relQueries if requested(name)) {
      val op = (d: String) => graft.SparkEntry.queries(name)(spark, d).count()
      time(op(dir)) // warm
      val (t1, n1) = time(op(dir))
      val (t10, n10) = time(op(relDir))
      println(f"PROBE $name%-32s 1x: $t1%6.2fs ($n1%9d rows)  ${reps}x: $t10%6.2fs ($n10%9d rows)  ratio: ${t10 / t1}%5.2f")
    }
    spark.stop()
  }
}
