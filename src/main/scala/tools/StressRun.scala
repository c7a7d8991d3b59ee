import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (not part of the driver contract): replicate the sf0.1
  * fixtures ~10× (≈ sf1) into /tmp/stress — shifting every key column so ids
  * stay unique — then time queries there. `REPLICATE=0` skips the copy pass;
  * query names come from args (default: the round-3 changed shapes).
  *
  * Reading the near-dup numbers: replication makes the corpus 10× DENSER
  * (every doc/vector gains 9 sharing its block/bucket), so blocked or
  * LSH-bucketed pair volume grows ~100×, not 10× — that is the problem
  * getting quadratically harder, not the plan degrading; the linear-work
  * queries (scans, aggregations, windows, as-of, top-k with fixed query
  * set) are the plan-scaling evidence. */
object StressRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/stress"

    def replicate(name: String, keyCols: Map[String, Long]): Unit = {
      val base = graft.etl.IngestOps.table(spark, src, name)
      val copies = (0 until 10).map { i =>
        keyCols.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }
      copies.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    if (sys.env.getOrElse("REPLICATE", "1") != "0") {
      replicate("lineitem", Map("l_orderkey" -> 100000000L))
      replicate("orders", Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
      replicate("customer", Map("c_custkey" -> 10000000L))
      replicate("events", Map("event_id" -> 100000000L, "user_id" -> 10000000L))
      replicate("documents", Map("doc_id" -> 10000000L))
      replicate("embeddings", Map("vec_id" -> 10000000L))
      // small dims copy through unchanged
      Seq("region", "nation", "supplier", "part").foreach(n => replicate(n, Map.empty))
      println("replicated: lineitem=" +
        spark.read.parquet(s"$out/lineitem.parquet").count() +
        " documents=" + spark.read.parquet(s"$out/documents.parquet").count())
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q3_top_revenue", "t3_skip_rows", "k2_csv_chunks",
      "events_sessionize", "events_asof_join", "sim_topk_bruteforce",
      "sim_ann_lsh", "dedup_minhash", "dedup_simhash")
    names.foreach { name => // warm at the bench SF first
      try graft.SparkEntry.queries(name)(spark, src).count()
      catch { case _: Throwable => () }
      finally graft.etl.CacheRegistry.releaseAll()
    }
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, out).count()
        catch { case e: Throwable => println(s"STRESS $name FAILED: $e"); -1L }
        finally graft.etl.CacheRegistry.releaseAll()
      println(f"STRESS $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
