import org.apache.spark.sql.SparkSession

/** Round-17 optimization probe: time a list of SparkEntry queries in one JVM
  * (3 samples each, CacheRegistry released between samples — the Bench
  * methodology) and dump each query's `explain("formatted")` text plus the
  * AQE-final executed plan to SPARK_GRAFT_PLAN_DIR for the before/after
  * evidence files. Args: query names (comma or space separated).
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLAN_DIR,
  * SPARK_GRAFT_PROBE_ITERS (default 3). */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val names = args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.rangejoin.bucketUs", "600000000")
      .config("spark.sql.maxMetadataStringLength", "100000")
      .config("spark.sql.files.openCostInBytes", "16384")
    // A/B aid: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applies candidate session
    // configs so an optimization can be measured before landing in Bench
    val withExtra = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = graft.etl.ScratchDirs.withLocalDir(withExtra).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    planDir.foreach(d => new java.io.File(d).mkdirs())
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"optprobe: $name")
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { graft.SparkEntry.queries(name)(spark, dir).count() }
        finally graft.etl.CacheRegistry.releaseAll()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name%-40s min=${ts.min}%.3f samples=" +
        ts.map(t => f"$t%.3f").mkString(","))
      planDir.foreach { d =>
        try {
          val df = graft.SparkEntry.queries(name)(spark, dir)
          val fmt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          df.count() // AQE-final
          val fin = df.queryExecution.executedPlan.toString
          val w = new java.io.PrintWriter(s"$d/$name.txt", "UTF-8")
          try {
            w.println("=== explain(formatted) ===")
            w.println(fmt)
            w.println("=== AQE-final executedPlan ===")
            w.println(fin)
          } finally w.close()
        } catch { case e: Throwable =>
          println(s"PLANFAIL $name: ${e.getClass.getName}: ${e.getMessage}")
        } finally graft.etl.CacheRegistry.releaseAll()
      }
    }
    spark.stop()
  }
}
