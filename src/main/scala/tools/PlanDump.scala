import org.apache.spark.sql.SparkSession

/** Dump the executed plan of one SparkEntry query (adjudication aid).
  * Args: queryName [outFile]. Env: SPARK_GRAFT_SF_DIR. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.rangejoin.bucketUs", "600000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    // one full run first so caches/stages are in their steady state
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).count()
    val t1 = System.nanoTime()
    graft.etl.CacheRegistry.releaseAll()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t2 = System.nanoTime()
    df.count()
    val t3 = System.nanoTime()
    println(f"RUN1 ${(t1 - t0) / 1e9}%.2f s  RUN2 ${(t3 - t2) / 1e9}%.2f s")
    val text = df.queryExecution.executedPlan.toString
    if (args.length > 1) {
      val w = new java.io.PrintWriter(args(1), "UTF-8")
      try w.print(text) finally w.close()
      println(s"plan -> ${args(1)} (${text.linesIterator.size} lines)")
    } else println(text)
    spark.stop()
  }
}
