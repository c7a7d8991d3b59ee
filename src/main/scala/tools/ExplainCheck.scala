import org.apache.spark.sql.SparkSession

object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q5_local_supplier", "q3_top_revenue", "s1_scan_allstring", "t4_projection_rename", "dedup_lsh_pairs", "sim_topk_bruteforce")) {
      println(s"\n================ $q ================")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.treeString.split("\n").take(45).mkString("\n"))
    }
    spark.stop()
  }
}
