import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry(spark) must return
  * rows > 0 on sf0.001 under a vanilla session. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_SMOKE rows=$n")
    assert(n > 0)
    spark.stop()
  }
}
