import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing for graph_lpa_communities (round-14 headroom work):
  * where do the ~4.8 s go — LSH pair build, edge cache write, or the
  * per-round join/agg stages? Also A/Bs edge-cache storage levels and
  * skipping the intermediate per-round label persists. */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "16384")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def docs = graft.etl.IngestOps.table(spark, dir, "documents")

    // warmup
    graft.ext.Graph.lpaCommunities(docs,
      graft.ext.Dedup.lshCandidatePairs(
        graft.ext.Dedup.minhashSignatures(docs))).count()
    graft.etl.CacheRegistry.releaseAll()

    (1 to 2).foreach { it =>
      println(s"--- iter $it ---")
      time("pairs_build_count") {
        graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(docs)).count()
      }
      graft.etl.CacheRegistry.releaseAll()
      time("full_lpa_current") {
        graft.ext.Graph.lpaCommunities(docs,
          graft.ext.Dedup.lshCandidatePairs(
            graft.ext.Dedup.minhashSignatures(docs))).count()
      }
      graft.etl.CacheRegistry.releaseAll()
      // variant: MEMORY_AND_DISK_SER edges, persist only the FINAL labels
      time("lpa_ser_nointermediate") {
        lpaVariant(docs, graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.minhashSignatures(docs))).count()
      }
      graft.etl.CacheRegistry.releaseAll()
    }
    spark.stop()
  }

  def lpaVariant(nodes: DataFrame, pairs: DataFrame, rounds: Int = 4): DataFrame = {
    // pre-partition the cached edge list by the per-round join key: the
    // rounds' joins then read cache partitions that already satisfy the
    // HashPartitioning requirement — 1 repartition shuffle replaces
    // `rounds` re-shuffles of the O(Σ bucket²) relation
    val e = graft.etl.CacheRegistry.persistDisk(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .repartition(col("dst")))
    var lab = graft.etl.CacheRegistry.persist(
      e.groupBy("src").agg(min(col("dst")).as("label"))
        .select(col("src").as("id"), col("label")))
    for (_ <- 2 to rounds) {
      lab = graft.etl.CacheRegistry.persist(
        e.join(lab.select(col("id").as("dst"), col("label")), "dst")
          .groupBy("src", "label").agg(count(lit(1)).as("c"))
          .groupBy("src")
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("src").as("id"), (-col("m.nl")).as("label")))
    }
    val sizes = lab.groupBy("label").agg(count(lit(1)).as("n"))
    nodes.select(col("doc_id").as("id"))
      .join(lab, Seq("id"), "left")
      .join(sizes, Seq("label"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("label"), col("id")).as("community"),
        coalesce(col("n"), lit(1L)).as("community_size"))
  }
}
