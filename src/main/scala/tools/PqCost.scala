import org.apache.spark.sql.SparkSession

/** Where do sim_pq_adc's ~4 s go on a 2000-row fixture? Splits the cost
  * into (a) query construction (trainer collects + plan assembly),
  * (b) first count (optimize + codegen + execute), (c) second count of the
  * SAME DataFrame (execute only — optimizer/codegen caches hot). */
object PqCost {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def emb = graft.etl.IngestOps.table(spark, dir, "embeddings")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // JIT/codegen warm pass on the small fixture like Bench's warmup
    graft.ext.Similarity.pqTopK(
      graft.etl.IngestOps.table(spark, "/root/testdata/sf0.001", "embeddings"))
      .count()
    graft.etl.CacheRegistry.releaseAll()
    for (i <- 1 to 2) {
      val df = t(s"run$i construct")(graft.ext.Similarity.pqTopK(emb))
      t(s"run$i count#1")(df.count())
      t(s"run$i count#2")(df.count())
      graft.etl.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
