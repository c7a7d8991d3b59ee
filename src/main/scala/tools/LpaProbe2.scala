import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-stage LPA profile: with pairs precomputed, what do the edge
  * cache write, round-1 agg, and each round-2+ join/agg cost, and does the
  * rounds' join broadcast the label side? */
object LpaProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.etl.IngestOps.table(spark, dir, "documents")
    val lvl = sys.env.getOrElse("LPA_LEVEL", "DISK_ONLY") match {
      case "SER" => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case _ => org.apache.spark.storage.StorageLevel.DISK_ONLY
    }
    // warmup whole thing once
    graft.ext.Graph.lpaCommunities(docs,
      graft.ext.Dedup.lshCandidatePairs(graft.ext.Dedup.minhashSignatures(docs))).count()
    graft.etl.CacheRegistry.releaseAll()

    val pairs = graft.ext.Dedup.lshCandidatePairs(graft.ext.Dedup.minhashSignatures(docs))
    time("pairs_count") { pairs.count() }
    val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(lvl)
    time("edge_cache_write") { e.count() }
    var lab = time("round1_agg") {
      val l = e.groupBy("src").agg(min(col("dst")).as("label"))
        .select(col("src").as("id"), col("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count(); l
    }
    (2 to 4).foreach { r =>
      lab = time(s"round${r}") {
        val l = e.join(lab.select(col("id").as("dst"), col("label")), "dst")
          .groupBy("src", "label").agg(count(lit(1)).as("c"))
          .groupBy("src")
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("src").as("id"), (-col("m.nl")).as("label"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        l.count(); l
      }
    }
    val sizes = lab.groupBy("label").agg(count(lit(1)).as("n"))
    time("final_joins") {
      docs.select(col("doc_id").as("id"))
        .join(lab, Seq("id"), "left")
        .join(sizes, Seq("label"), "left").count()
    }
    println("--- round2 plan (top) ---")
    val p = e.join(lab.select(col("id").as("dst"), col("label")), "dst")
      .groupBy("src", "label").agg(count(lit(1)).as("c"))
    println(p.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
