package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class DocStreamsSpec extends AnyFunSuite {

  test("streaming curated per-source counts equal the batch gates + distinct-fp rollup") {
    val stream = DocStreams.curatedSourceCounts(
      DocStreams.readDocuments(spark, sf0001))
    val q = stream.writeStream
      .format("memory").queryName("docs_curate_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("docs_curate_test")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val docs = graft.etl.IngestOps.table(spark, sf0001, "documents")
    val batch = docs
      .withColumn("n_tokens", graft.ext.TextOps.tokenCount("text"))
      .withColumn("ar", when(length(col("text")) > 0,
        graft.ext.TextOps.alphaCount("text").cast("double") / length(col("text")))
        .otherwise(lit(0.0)))
      .filter(col("lang") === "en" && col("n_tokens") >= 10 &&
        col("n_tokens") <= 100000 && col("ar") >= 0.5)
      .groupBy("source").agg(countDistinct(md5(col("text"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(streamed == batch && streamed.nonEmpty)
  }

  test("cross-source duplicate fingerprints count once PER SOURCE (keyed dedup)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstreams_fix").toString
    // same admitted text in two sources + an in-source exact duplicate +
    // one gated-out row (wrong lang)
    val text = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, text, "en", "a"), (2L, text, "en", "a"), // in-source dup: 1 for a
      (3L, text, "en", "b"),                        // cross-source: 1 for b
      (4L, text, "de", "b"))                        // gated out (lang)
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = DocStreams.curatedSourceCounts(DocStreams.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("docs_curate_dup_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("docs_curate_dup_test")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L))
  }
}
