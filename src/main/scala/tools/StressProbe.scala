import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: times named operators on the documents fixture and on a
  * 10× replica (each copy re-keyed into a fresh doc_id range, texts
  * perturbed per replica so the corpus grows in CONTENT, not just rows —
  * pure duplicates would collapse inside dedup and understate join work).
  * Prints seconds at 1× and 10× plus the ratio; sublinear-to-linear ratios
  * are the pass signal. Args: operator names (default: the round-7 set). */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.etl.IngestOps.table(spark, dir, "documents")

    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    val x10 = (0 until 10).map { r =>
      docs.select(
        (col("doc_id") + lit(r * maxId)).as("doc_id"),
        (if (r == 0) col("text")
         else concat(col("text"), lit(s" replica$r marker"))).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(if (r == 0) 0 else s" replica$r marker".length))
          .as("n_chars"))
    }.reduce(_ unionAll _)

    val ops: Map[String, org.apache.spark.sql.DataFrame => Long] = Map(
      "text_chunks" -> (d => graft.ext.Chunking.chunkDocs(d).count()),
      "pack_sequences" -> (d => graft.ext.Chunking.packSequences(d).count()),
      "text_top_ngrams" -> (d => graft.ext.Chunking.topNgrams(d).count()),
      "dedup_keep_first_lsh" -> (d => graft.ext.Dedup.dropNearDuplicatesLsh(d).count()),
      "dedup_keep_first_lsh_rep" -> (d => graft.ext.Dedup.dropNearDuplicatesLshRep(d).count()),
      "pipeline_training_examples" -> (d => graft.ext.Pipelines.trainingExamples(d).count()),
      "multimodal_resize" -> (d => graft.ext.Multimodal.resize(graft.ext.Multimodal.asMedia(d)).count()),
      "multimodal_frame_sample" -> (d => graft.ext.Multimodal.frameSample(graft.ext.Multimodal.asMedia(d)).count()))
    // the all-pairs LSH form is probe-on-request only: its pair volume is
    // quadratic in duplicate density BY DESIGN (measured ~500x at 10x on
    // this dense fixture) — the rep variant is the standing scale path
    val names = if (args.nonEmpty) args.toSeq
      else ops.keys.toSeq.sorted.filterNot(_ == "dedup_keep_first_lsh")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      graft.etl.CacheRegistry.releaseAll()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    names.foreach { name =>
      val op = ops(name)
      time(op(docs)) // warm codegen/JIT on the small side
      val (t1, n1) = time(op(docs))
      val (t10, n10) = time(op(x10))
      println(f"PROBE $name%-28s 1x: $t1%6.2fs ($n1%9d rows)  10x: $t10%6.2fs ($n10%9d rows)  ratio: ${t10 / t1}%5.2f")
    }
    spark.stop()
  }
}
