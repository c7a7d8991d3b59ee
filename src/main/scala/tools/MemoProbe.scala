import org.apache.spark.sql.SparkSession

/** Does TrainerMemo actually hit across two independent reads of the same
  * parquet path? Prints the semantic hash of each read's analyzed plan and
  * times two consecutive pqCentroids/ivfCentroids calls. */
object MemoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e1 = graft.etl.IngestOps.table(spark, "/root/testdata/sf0.001", "embeddings")
    val e2 = graft.etl.IngestOps.table(spark, "/root/testdata/sf0.1", "embeddings")
    println("hash1=" + e1.queryExecution.analyzed.semanticHash())
    println("hash2=" + e2.queryExecution.analyzed.semanticHash())
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    time("pq train 1")(graft.ext.Similarity.pqCentroids(e1, 2))
    time("pq train 2")(graft.ext.Similarity.pqCentroids(e2, 2))
    time("ivf train 1")(graft.ext.Similarity.ivfCentroids(e1, 16, 2))
    time("ivf train 2")(graft.ext.Similarity.ivfCentroids(e2, 16, 2))
    spark.stop()
  }
}
