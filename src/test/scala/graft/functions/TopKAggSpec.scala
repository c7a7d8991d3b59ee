package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}
import graft.ext.Similarity

class TopKAggSpec extends AnyFunSuite {
  import spark.implicits._

  test("top-k aggregate equals the window row_number formulation") {
    val emb = graft.etl.IngestOps.table(spark, sf0001, "embeddings")
    val v = Similarity.withNorm(emb)
    val q = v.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"nrm".as("qn"))
    val c = v.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"), $"nrm".as("cn"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .withColumn("cos", Similarity.dotCol("qv", "cv") / ($"qn" * $"cn"))

    val viaAgg = scored.groupBy("query_id")
      .agg(TopKAgg.topk(5)($"cos", $"neighbor_id").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("i", "pair")))
      .select($"query_id", ($"i" + 1).cast("long").as("rank"),
        $"pair._2".as("neighbor_id"), $"pair._1".as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val viaWindow = Similarity.bruteForceTopK(emb, nQueries = 3, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
      .toSet

    assert(viaAgg == viaWindow)
  }

  test("buffer stays bounded: groups larger than k return exactly k") {
    val df = (1 to 1000).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "score", "id")
    val out = df.groupBy("g").agg(TopKAgg.topk(7)($"score", $"id").as("top"))
      .select(explode($"top").as("p")).select($"p._2").as[Long].collect()
    assert(out.toSeq == (994 to 1000).reverse.map(_.toLong))
  }
}
