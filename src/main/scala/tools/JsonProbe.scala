import org.apache.spark.sql.SparkSession

/** Decompose the jsonarray sink cost: upstream compute vs toJSON render vs
  * text-write vs toLocalIterator pull. */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val positioned = graft.etl.IngestOps.withFileRowPos(spark, s"$dir/orders.parquet")
    val ordered = graft.etl.IngestOps.allString(
      positioned.orderBy("_pos").drop("_pos"))
    for (i <- 1 to 3) {
      println(s"--- iter $i")
      time("noop ordered")(ordered.write.format("noop").mode("overwrite").save())
      time("noop toJSON")(ordered.toJSON.write.format("noop").mode("overwrite").save())
      time("text write")(ordered.toJSON.write.mode("overwrite")
        .text(s"/dev/shm/graft_jsonprobe_$i"))
      time("localIterator") {
        val it = ordered.toJSON.toLocalIterator()
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      time("coalesce1 text")(ordered.toJSON.coalesce(1).write.mode("overwrite")
        .text(s"/dev/shm/graft_jsonprobe_c_$i"))
    }
    spark.stop()
  }
}
