package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class MultimodalSpec extends AnyFunSuite {

  private def media = Multimodal.asMedia(graft.etl.IngestOps.table(spark, sf0001, "documents"))

  test("asMedia: payload is binary, metadata struct is typed") {
    val schema = media.schema
    assert(schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("origin", "mime", "declared_len"))
  }

  test("features: byte length matches declared length (ascii fixture)") {
    val rows = Multimodal.features(media).join(media.select("doc_id", "meta"), "doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") ==
        r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("declared_len"))
      assert(r.getAs[String]("content_sha").length == 64)
    }
  }

  test("decode: partition-parallel stub is deterministic and complete") {
    val d1 = Multimodal.decode(media).collect().map(d => d.doc_id -> d).toMap
    val d2 = Multimodal.decode(media.repartition(7)).collect().map(d => d.doc_id -> d).toMap
    assert(d1.size == 500 && d1.keySet == d2.keySet)
    d1.foreach { case (id, d) =>
      assert(d == d2(id)) // partitioning must not change decoded values
      assert(d.width >= 1 && d.width <= 640 && d.height >= 1 && d.height <= 480)
    }
  }
}
