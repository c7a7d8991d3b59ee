import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: does session_window aggregation run under complete output
  * mode with Trigger.AvailableNow, and does its (user, session_start, n)
  * output equal the batch lag/gap sessionization on the events fixture? */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val q = graft.streaming.EventStreams.sessionWindows(
        graft.streaming.EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("probe_sessions")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("probe_sessions")
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"))
      .collect().map(_.toSeq).toSet
    // batch twin: lag/gap sessionization, same 30-min gap
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = graft.etl.IngestOps.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("us").as("start_us"))
      .select(col("user_id"), col("start_us"), col("n_events"))
      .collect().map(_.toSeq).toSet
    println(s"PROBE streamed=${streamed.size} batch=${batch.size} equal=${streamed == batch}")
    spark.stop()
  }
}
