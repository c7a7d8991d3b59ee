import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: volume at each stage of Dedup.jaccardPrefixJoin. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.etl.IngestOps.table(spark, dir, "documents")
    val theta = 0.8
    val t0 = System.nanoTime()
    val t = docs.select(col("doc_id"),
        array_sort(array_distinct(graft.ext.TextOps.fastTokens(col("text")))).as("toks"))
      .filter(size(col("toks")) > 0).cache()
    println(s"docs=${t.count()}  avg_toks=" +
      t.agg(avg(size(col("toks")))).head.getDouble(0))
    val tok = t.select(col("doc_id"), explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    println(s"distinct_tokens=${dfreq.count()}")
    val ranked = tok.join(dfreq, "tok").groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("_ord"))
      .select(col("doc_id"), expr("transform(_ord, x -> x.tok)").as("rtoks"))
    val pre = ranked.select(col("doc_id"), size(col("rtoks")).as("n"),
        posexplode(expr(
          s"slice(rtoks, 1, size(rtoks) - CAST(ceil($theta * size(rtoks)) AS INT) + 1)")))
      .withColumnRenamed("col", "tok").withColumn("pos", col("pos") + 1).cache()
    println(s"prefix_instances=${pre.count()}")
    val reqOverlap = ceil(lit(theta / (1.0 + theta)) * (col("a.n") + col("b.n")))
    val raw = pre.as("a").join(pre.as("b"),
      col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
      col("b.n") >= col("a.n") * lit(theta) &&
      col("a.n") >= col("b.n") * lit(theta) &&
      (lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))) >= reqOverlap)
    println(s"raw_candidates=${raw.count()}")
    val cand = raw.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    println(s"distinct_candidates=${cand.count()}")
    val out = graft.ext.Dedup.jaccardPrefixJoin(docs, theta = theta)
    println(s"output_pairs=${out.count()}")
    println(f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
