import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe: replicate the sf0.1 fixtures ~10× (≈ sf1) into /tmp
  * and time representative queries, to observe how the plans scale past the
  * bench SF. Not part of the driver contract. */
object StressRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/stress"

    def replicate(name: String, keyCols: Map[String, Long]): Unit = {
      val base = graft.etl.IngestOps.table(spark, src, name)
      val copies = (0 until 10).map { i =>
        keyCols.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }
      copies.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    replicate("lineitem", Map("l_orderkey" -> 100000000L))
    replicate("orders", Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
    replicate("customer", Map("c_custkey" -> 10000000L))
    replicate("events", Map("event_id" -> 100000000L, "user_id" -> 10000000L))
    println("replicated: lineitem=" +
      spark.read.parquet(s"$out/lineitem.parquet").count() +
      " events=" + spark.read.parquet(s"$out/events.parquet").count())

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STRESS $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    // warm
    graft.SparkEntry.queries("q1_pricing_summary")(spark, src).count()

    time("q1_pricing_summary_10x") {
      graft.SparkEntry.queries("q1_pricing_summary")(spark, out).count()
    }
    time("q3_top_revenue_10x") {
      graft.SparkEntry.queries("q3_top_revenue")(spark, out).count()
    }
    time("events_sessionize_10x") {
      graft.SparkEntry.queries("events_sessionize")(spark, out).count()
    }
    time("window_rank_orders_10x") {
      graft.SparkEntry.queries("window_rank_orders")(spark, out).count()
    }
    spark.stop()
  }
}
