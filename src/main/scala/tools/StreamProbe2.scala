import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: does flatMapGroupsWithState's event-time timeout fire
  * under Trigger.AvailableNow (no-data final batch), and do the emitted
  * closed sessions equal the batch lag/gap sessionization restricted to
  * watermark-closed sessions? */
object StreamProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val q = graft.streaming.EventStreams.closedSessions(
        graft.streaming.EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("probe_closed")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("probe_closed")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq).toSet
    val byTimeout = spark.table("probe_closed").filter(col("closed_by") === "timeout").count()
    // batch twin: lag/gap sessions; closed = not last per user OR ripe vs wm
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = graft.etl.IngestOps.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val wm = ev.agg(max("us")).head().getLong(0) - 3600000000L
    val sess = ev
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(cum))
      .groupBy("user_id", "sid")
      .agg(min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("last_sid", max("sid").over(Window.partitionBy("user_id")))
    val closed = sess.filter(col("sid") < col("last_sid") ||
        col("end_us") + 1800000000L < lit(wm))
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq).toSet
    val closedLe = sess.filter(col("sid") < col("last_sid") ||
        col("end_us") + 1800000000L <= lit(wm))
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq).toSet
    println(s"PROBE2 streamed=${streamed.size} timeout=$byTimeout " +
      s"batchClosedLt=${closed.size} eqLt=${streamed == closed} " +
      s"batchClosedLe=${closedLe.size} eqLe=${streamed == closedLe}")
    spark.stop()
  }
}
