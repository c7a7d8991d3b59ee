import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing inside the LSH candidate-pair build (shared cost of the
  * whole dedup/graph bench family): tokens → minhash agg → band buckets →
  * salted self-join + distinct. */
object PairsProbe {
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
    def docs = graft.etl.IngestOps.table(spark, dir, "documents")
    // warmup
    graft.ext.Dedup.lshCandidatePairs(graft.ext.Dedup.minhashSignatures(docs)).count()
    graft.etl.CacheRegistry.releaseAll()
    (1 to 2).foreach { it =>
      println(s"--- iter $it ---")
      val nTok = time("tokens_count") { graft.ext.Dedup.tokens(docs).count() }
      val nSig = time("sigs_count") { graft.ext.Dedup.minhashSignatures(docs).count() }
      graft.etl.CacheRegistry.releaseAll()
      val nPairs = time("pairs_count") {
        graft.ext.Dedup.lshCandidatePairs(graft.ext.Dedup.minhashSignatures(docs)).count()
      }
      graft.etl.CacheRegistry.releaseAll()
      println(s"tokens=$nTok sigs=$nSig pairs=$nPairs")
    }
    spark.stop()
  }
}
