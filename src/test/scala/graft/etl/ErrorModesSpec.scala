package graft.etl

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

class ErrorModesSpec extends AnyFunSuite {
  import spark.implicits._

  private def mixed = Seq(
    (1L, """{"k": 1}"""),
    (2L, """not json"""),
    (3L, """{"k": 3}"""),
    (4L, """{broken"""),
    (5L, null.asInstanceOf[String])).toDF("id", "props")

  test("C4 continueOnError=true: corrupt rows skipped and counted") {
    val acc = spark.sparkContext.longAccumulator("skipped")
    val corrupt = ErrorModes.corruptJson($"props", "k INT")
    val good = ErrorModes.tolerate(mixed, corrupt, acc)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(acc.value == 3L)
  }

  test("C4 continueOnError=false: first corrupt row fails the job") {
    val corrupt = ErrorModes.corruptJson($"props", "k INT")
    val e = intercept[Exception](ErrorModes.failFast(mixed, corrupt, "props").collect())
    def chain(t: Throwable): List[Throwable] =
      Option(t).map(x => x :: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("continueOnError"))))
  }

  test("C4: type issues are never errors (all-string model keeps them)") {
    // {"k": "notanint"} parses as an object; the k field is a cast concern,
    // not a structural error (contract :186-188)
    val df = Seq((1L, """{"k": "zzz"}""")).toDF("id", "props")
    val acc = spark.sparkContext.longAccumulator
    val good = ErrorModes.tolerate(df, ErrorModes.corruptJson($"props", "k STRING"), acc)
    assert(good.count() == 1 && acc.value == 0)
  }
}
