package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing + volume probe for pipeline_incremental_neardup (the
  * r11→r12 perf adjudication): times each materialization boundary of the
  * unified-chain operator and prints the intermediate cardinalities, so the
  * expensive stage is named, not guessed. */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      graft.etl.CacheRegistry.releaseAll()
      val d = graft.etl.IngestOps.table(spark, sfDir, "documents")
      val existing = d.filter(col("source") === "src0")
      val incoming = d.filter(col("source") =!= "src0")
      val salts = Dedup.DefaultSaltBuckets
      val threshold = 0.8

      val tagged = existing.select(col("doc_id"), lit(true).as("_ex"), col("text"))
        .unionByName(incoming.select(col("doc_id"), lit(false).as("_ex"), col("text")))
      val toks = graft.etl.CacheRegistry.persist(tagged.select(col("doc_id"), col("_ex"),
        array_sort(array_distinct(TextOps.fastTokens(col("text")))).as("toks")))
      timed("tokenize union")(println(s"PROBE   n_docs=${toks.count()}"))
      val b = graft.etl.CacheRegistry.persist(Dedup.bandBuckets(
        Dedup.minhashFromTokens(
          toks.select(col("doc_id"), col("_ex"), explode(col("toks")).as("tok")),
          carry = Seq("_ex")),
        carry = Seq("_ex")))
      timed("minhash+buckets")(println(s"PROBE   n_bucket_rows=${b.count()}"))
      val x = b.withColumn("_salt", pmod(hash(col("doc_id")), lit(salts)))
      val y = b.withColumn("_salt", explode(array((0 until salts).map(lit(_)): _*)))
      val pairsRaw = x.as("x").join(y.as("y"),
          col("x.bi") === col("y.bi") && col("x.band") === col("y.band") &&
            col("x._salt") === col("y._salt") &&
            col("x.doc_id") < col("y.doc_id") &&
            !(col("x._ex") && col("y._ex")))
        .select(col("x.doc_id").as("doc_a"), col("x._ex").as("ex_a"),
          col("y.doc_id").as("doc_b"), col("y._ex").as("ex_b"))
      timed("pair join (pre-distinct)")(println(s"PROBE   n_raw_pairs=${pairsRaw.count()}"))
      val pairs = graft.etl.CacheRegistry.persist(pairsRaw.distinct())
      timed("pair distinct")(println(s"PROBE   n_pairs=${pairs.count()}"))
      val sim = graft.etl.CacheRegistry.persist(pairs
        .join(toks.select(col("doc_id").as("doc_a"),
          col("toks").as("ta"), size(col("toks")).as("na")), "doc_a")
        .join(toks.select(col("doc_id").as("doc_b"),
          col("toks").as("tb"), size(col("toks")).as("nb")), "doc_b")
        .filter(Dedup.jaccardFromIntersect(
          Dedup.intersectCount(col("ta"), col("tb")), col("na"), col("nb")) >= threshold)
        .select("doc_a", "ex_a", "doc_b", "ex_b"))
      timed("rescore")(println(s"PROBE   n_sim=${sim.count()}"))
      val crossLosers = sim.filter(col("ex_a") =!= col("ex_b"))
        .select(when(col("ex_a"), col("doc_b")).otherwise(col("doc_a")).as("doc_id"))
        .distinct()
      val batchLosers = sim.filter(!col("ex_a") && !col("ex_b"))
        .join(crossLosers.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
        .join(crossLosers.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
        .select(col("doc_b").as("doc_id")).distinct()
      val out = timed("losers + final anti")(
        incoming.join(crossLosers.unionByName(batchLosers), Seq("doc_id"), "left_anti")
          .count())
      println(s"PROBE survivors=$out")
    }
    spark.stop()
  }
}
