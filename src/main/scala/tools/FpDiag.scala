import org.apache.spark.sql.SparkSession

/** Fingerprint divergence reproducer: replays graft.Bench's EXACT
  * per-session sequence (sf0.001 warmup pass → sf0.1 timing samples →
  * cache-cleared fingerprint pass) for a restricted query set, and dumps
  * the canonicalized plan TEXT of the last query — the text Bench md5s —
  * so two runs with different query sets can be diffed token-by-token.
  * Args: outFile query1 [query2 ...] (fingerprint text dumped for the
  * LAST query; all run in the given order, like Bench's sorted order). */
object FpDiag {
  def main(args: Array[String]): Unit = {
    if (!graft.Bench.pinCanonicalJvmId()) // same digest convention as Bench
      System.err.println("WARN: pinCanonicalJvmId FAILED - digests may flap across JVMs")
    val out = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.rangejoin.bucketUs", "600000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    def runOnce(n: String, dir: String): Unit = {
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case _: Throwable => () }
      finally graft.etl.CacheRegistry.releaseAll()
    }
    names.foreach(runOnce(_, warmDir))                 // Bench warmup pass
    names.foreach { n => runOnce(n, sfDir); runOnce(n, sfDir) } // timing pass
    // fingerprint pass: per query, pristine cache, build, canonicalize
    var text = ""
    names.foreach { n =>
      spark.catalog.clearCache()
      try text = graft.Bench.canonicalPlanText(graft.SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => text = "err" }
      finally graft.etl.CacheRegistry.releaseAll()
    }
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(text) finally w.close()
    spark.stop()
  }
}
