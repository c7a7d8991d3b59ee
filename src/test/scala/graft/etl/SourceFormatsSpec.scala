package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class SourceFormatsSpec extends AnyFunSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    IngestOps.allString(df).collect().map(_.toSeq.map(String.valueOf)).toSet

  test("round-trip: parquet → csv/json/orc → read back preserves data") {
    val orders = IngestOps.table(spark, sf0001, "orders")
    val expect = canon(orders)
    val base = Files.createTempDirectory("fmt").toString
    for (fmt <- Seq("csv", "json", "orc")) {
      val p = s"$base/$fmt"
      fmt match {
        case "csv" => orders.write.option("header", "true").csv(p)
        case "json" => orders.write.json(p)
        case "orc" => orders.write.orc(p)
      }
      val back = IngestOps.read(spark, p, fmt, Some(orders.schema))
      assert(back.count() == 1500, fmt)
      assert(canon(back) == expect, s"$fmt round-trip altered data")
    }
  }

  test("FAILFAST mode dies on malformed records; PERMISSIVE tolerates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bad").toString + "/data.json"
    Files.writeString(java.nio.file.Paths.get(dir),
      """{"a": 1}
        |not json at all
        |{"a": 3}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a INT")
    val ok = IngestOps.read(spark, dir, "json", Some(schema), continueOnError = true)
    assert(ok.count() == 3) // PERMISSIVE keeps the bad row with null fields
    assert(ok.filter($"a".isNotNull).count() == 2)
    val ex = intercept[Exception] {
      IngestOps.read(spark, dir, "json", Some(schema), continueOnError = false).collect()
    }
    assert(ex.getMessage != null)
  }

  test("unknown format errors with the supported list") {
    val e = intercept[IllegalArgumentException](
      IngestOps.read(spark, "/tmp/x", "avro"))
    assert(e.getMessage.contains("Supported"))
  }
}
