import org.apache.spark.sql.SparkSession

/** Dumps the exact canonicalized+stripped plan text Bench.fingerprint
  * hashes, for one query, to a file — run it twice with different warm-up
  * query sets (SPARK_GRAFT_PRE) and diff the outputs to find any
  * session-order-dependent token that survives the stripping. */
object PlanText {
  def main(args: Array[String]): Unit = {
    if (!graft.Bench.pinCanonicalJvmId()) // same digest convention as Bench
      System.err.println("WARN: pinCanonicalJvmId FAILED - digests may flap across JVMs")
    val name = args(0)
    val out = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.rangejoin.bucketUs", "600000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // simulate an arbitrary earlier session history
    sys.env.get("SPARK_GRAFT_PRE").foreach(_.split(",").filter(_.nonEmpty).foreach { p =>
      try graft.SparkEntry.queries(p)(spark, dir).count()
      catch { case _: Throwable => () }
      finally graft.etl.CacheRegistry.releaseAll()
    })
    spark.catalog.clearCache()
    val plan = graft.Bench.canonicalPlanText(
      graft.SparkEntry.queries(name)(spark, dir))
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(plan) finally w.close()
    graft.etl.CacheRegistry.releaseAll()
    spark.stop()
  }
}
