import org.apache.spark.sql.SparkSession

object StressRun2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = "/tmp/stress"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STRESS $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("events_sessionize_10x") {
      graft.SparkEntry.queries("events_sessionize")(spark, out).count()
    }
    time("window_rank_orders_10x") {
      graft.SparkEntry.queries("window_rank_orders")(spark, out).count()
    }
    time("events_rolling_10x") {
      graft.SparkEntry.queries("events_rolling_count")(spark, out).count()
    }
    spark.stop()
  }
}
