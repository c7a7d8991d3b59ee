import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Piece-wise timing of incrementalIngestNearDup under the StageStore to
  * find the 2.7 s → 17 s regression (round-14). */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("OPEN_COST", "4194304"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val d = graft.etl.IngestOps.table(spark, dir, "documents")
    val existing = d.filter(col("source") === "src0")
    val incoming = d.filter(col("source") =!= "src0")
    // replicate the pipeline's internals
    import graft.ext.{Dedup, TextOps}
    (1 to 2).foreach { it =>
      println(s"--- iter $it ---")
      val salts = Dedup.DefaultSaltBuckets
      val tagged = existing.select(col("doc_id"), lit(true).as("_ex"), col("text"))
        .unionByName(incoming.select(col("doc_id"), lit(false).as("_ex"), col("text")))
      val toks = graft.etl.CacheRegistry.persist(tagged.select(col("doc_id"), col("_ex"),
        array_sort(array_distinct(TextOps.fastTokens(col("text")))).as("toks")))
      time("toks_count") { toks.count() }
      val b = graft.etl.CacheRegistry.persist(Dedup.bandBuckets(
        Dedup.minhashFromTokens(
          toks.select(col("doc_id"), col("_ex"), explode(col("toks")).as("tok")),
          carry = Seq("_ex")),
        carry = Seq("_ex")))
      time("b_count") { b.count() }
      val x = b.withColumn("_salt", pmod(hash(col("doc_id")), lit(salts)))
      val y = b.withColumn("_salt", explode(array((0 until salts).map(lit(_)): _*)))
      val pairs = x.as("x").join(y.as("y"),
          col("x.bi") === col("y.bi") && col("x.band") === col("y.band") &&
            col("x._salt") === col("y._salt") &&
            (col("x.doc_id") < col("y.doc_id") ||
              (col("x.doc_id") === col("y.doc_id") &&
                col("x._ex") && !col("y._ex"))) &&
            !(col("x._ex") && col("y._ex")))
        .select(col("x.doc_id").as("doc_a"), col("x._ex").as("ex_a"),
          col("y.doc_id").as("doc_b"), col("y._ex").as("ex_b"))
      time("pairs_count") { pairs.count() }
      val sizeOk = least(col("na"), col("nb")).cast("double") >=
        lit(0.8) * greatest(col("na"), col("nb")).cast("double")
      val sim = graft.etl.CacheRegistry.persist(pairs
        .join(toks.select(col("doc_id").as("doc_a"),
          col("toks").as("ta"), size(col("toks")).as("na")), "doc_a")
        .join(toks.select(col("doc_id").as("doc_b"),
          col("toks").as("tb"), size(col("toks")).as("nb")), "doc_b")
        .filter(sizeOk)
        .select("doc_a", "ex_a", "doc_b", "ex_b"))
      time("sim_count_sizeok_only") { sim.count() }
      time("full_pipeline") {
        graft.ext.Pipelines.incrementalIngestNearDup(existing, incoming).count()
      }
      graft.etl.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
