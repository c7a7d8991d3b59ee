import org.apache.spark.sql.SparkSession
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

/** Pin down which query trips Catalyst's HintErrorLogger ("A join hint
  * (strategy=broadcast) is specified but it is not part of a join
  * relation") — the warning names no query, so the bench tail only proves
  * SOME hint lands on a non-join node. Attaches an in-JVM appender to the
  * HintErrorLogger and touches every query's optimizedPlan (hint
  * elimination runs in the logical optimizer, so no execution needed for
  * batch rows; streaming rows execute during construction as usual). */
object HintAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.rangejoin.bucketUs", "600000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val app = new AbstractAppender("hintcap", null, null, true,
        Array.empty[Property]) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        events.synchronized { events += e.getMessage.getFormattedMessage }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val loggerName = "org.apache.spark.sql.catalyst.analysis.HintErrorLogger"
    val lc = new LoggerConfig(loggerName, Level.WARN, false)
    lc.addAppender(app, Level.WARN, null)
    conf.addLogger(loggerName, lc)
    ctx.updateLoggers()

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var hits = 0
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      events.synchronized(events.clear())
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.queryExecution.optimizedPlan
        val msgs = events.synchronized(events.toList)
        if (msgs.nonEmpty) {
          hits += msgs.size
          println(f"HINT $name%-36s ${msgs.size} warning(s): ${msgs.head}")
        }
      } catch {
        case e: Exception => println(f"HINT $name%-36s ERROR ${e.getMessage}")
      } finally graft.etl.CacheRegistry.releaseAll()
    }
    println(s"HINT_TOTAL $hits")
    spark.stop()
  }
}
