package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.{sf0001, spark}

class ConvertSpec extends AnyFunSuite {

  private def cfg(fmt: String, out: String) = EngineConfig(
    inputDir = sf0001, sheetName = Some("ORDERS"), format = fmt,
    outputPath = Some(out), overwrite = true, batchSize = 500)

  test("end-to-end ndjson conversion: all rows written, all-string cells") {
    val out = Files.createTempDirectory("cv").toString + "/nd"
    val r = Convert.run(spark, cfg("ndjson", out))
    assert(r.sheet == "orders" && r.rowsWritten == 1500)
    val back = spark.read.json(out)
    assert(back.count() == 1500)
    assert(back.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
  }

  test("end-to-end chunked csv conversion honors batchSize") {
    val out = Files.createTempDirectory("cv").toString + "/csv"
    val r = Convert.run(spark, cfg("csv", out))
    assert(r.rowsWritten == 1500)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val dataLines = scala.io.Source.fromFile(f).getLines().size - 1 // minus header
      assert(dataLines <= 500)
    }
  }

  test("end-to-end json-array conversion writes one well-formed document") {
    val out = Files.createTempDirectory("cv").toString + "/arr.json"
    val r = Convert.run(spark, cfg("json", out))
    assert(r.rowsWritten == 1500)
    val txt = Files.readString(java.nio.file.Paths.get(out))
    assert(txt.startsWith("[{") && txt.endsWith("}]"))
  }

  test("headerRow skips leading rows positionally") {
    val out = Files.createTempDirectory("cv").toString + "/nd2"
    val r = Convert.run(spark, cfg("ndjson", out).copy(headerRow = 100))
    assert(r.rowsWritten == 1400)
  }

  test("sheet by index when no name given") {
    val out = Files.createTempDirectory("cv").toString + "/nd3"
    val r = Convert.run(spark, cfg("ndjson", out).copy(sheetName = None, sheetIndex = 0))
    assert(r.sheet == "region" && r.rowsWritten == 5)
  }

  test("end-to-end from a real .xlsx package: scan → header → ndjson sink") {
    val dir = Files.createTempDirectory("cvx").toString
    graft.sources.XlsxTestFiles.writeDense(s"$dir/book.xlsx", Seq(
      ("Inventory", Seq(
        Seq("sku", "name", "qty"),
        Seq("s1", "first item", "10"),
        Seq("s2", "second item", "20"),
        Seq("s3", "third item", "30")))))
    val out = s"$dir/nd"
    val r = Convert.run(spark, EngineConfig(
      inputDir = s"$dir/book.xlsx", inputFormat = "xlsx",
      sheetName = Some("INVENTORY"), // case-insensitive resolve (S3)
      format = "ndjson", outputPath = Some(out), overwrite = true))
    assert(r.sheet == "Inventory" && r.rowsWritten == 3)
    val back = spark.read.json(out).orderBy("sku").collect()
    assert(back.map(_.getAs[String]("name")).toSeq ==
      Seq("first item", "second item", "third item"))
  }

  test("xlsx headerRow preamble skip and chunked csv sink compose") {
    val dir = Files.createTempDirectory("cvx2").toString
    graft.sources.XlsxTestFiles.writeDense(s"$dir/book.xlsx", Seq(
      ("S", Seq(
        Seq("col_a", "col_b"),
        Seq("PREAMBLE", "ignored"), // headerRow=1 drops this data row
        Seq("a1", "b1"),
        Seq("a2", "b2")))))
    val out = s"$dir/csv"
    val r = Convert.run(spark, EngineConfig(
      inputDir = s"$dir/book.xlsx", inputFormat = "xlsx", headerRow = 1,
      format = "csv", outputPath = Some(out), overwrite = true, batchSize = 1))
    assert(r.rowsWritten == 2)
    val back = spark.read.option("header", "true").csv(out).orderBy("col_a").collect()
    assert(back.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a1", "b1"), ("a2", "b2")))
  }
}
