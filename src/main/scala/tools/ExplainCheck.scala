import org.apache.spark.sql.SparkSession

/** Prints the executed plan of named SparkEntry queries (args; defaults to a
  * representative set). `SPARK_GRAFT_LINES=n` env widens the per-plan excerpt. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val lines = sys.env.getOrElse("SPARK_GRAFT_LINES", "45").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q5_local_supplier", "q3_top_revenue", "s1_scan_allstring",
        "t4_projection_rename", "dedup_lsh_pairs", "sim_topk_bruteforce")
    for (q <- names) {
      println(s"\n================ $q ================")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      // collect() drives df's OWN QueryExecution (count() would build a new
      // one and leave the printed plan un-finalized by AQE)
      df.collect()
      println(df.queryExecution.executedPlan.treeString.split("\n").take(lines).mkString("\n"))
    }
    spark.stop()
  }
}
