package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession.spark

/** The GraftExtensions SQL-function registry: the codegen'd expressions
  * reached from `spark.sql(...)` must agree with their built-in/regex
  * equivalents (the library-API equivalence is tested per-expression in
  * functions/ specs; these lock the SQL wiring). */
class SqlFunctionsSpec extends AnyFunSuite {
  import spark.implicits._

  test("graft_tokens from SQL equals the regexp formulation") {
    Seq((1L, "Hello, World-42! ÜBER café"), (2L, ""), (3L, "a1 b2"))
      .toDF("id", "s").createOrReplaceTempView("sqlfn_t")
    val diff = spark.sql(
      """SELECT id FROM sqlfn_t
        |WHERE NOT graft_tokens(s) <=> regexp_extract_all(lower(s), '[a-z0-9]+', 0)
        |""".stripMargin).count()
    assert(diff == 0)
  }

  test("graft_vec_dot from SQL equals the explicit cast-chain") {
    Seq((1L, Array(1.5f, -2.0f, 0.25f), Array(2.0f, 0.5f, 4.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("sqlfn_v")
    val r = spark.sql(
      """SELECT graft_vec_dot(a, b) AS d,
        |  CAST(a[0] AS DOUBLE)*CAST(b[0] AS DOUBLE) +
        |  CAST(a[1] AS DOUBLE)*CAST(b[1] AS DOUBLE) +
        |  CAST(a[2] AS DOUBLE)*CAST(b[2] AS DOUBLE) AS e
        |FROM sqlfn_v""".stripMargin).head()
    assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(0) == 3.0)
  }

  test("graft_sorted_intersect from SQL counts the sorted-merge intersection") {
    Seq((1L, Array("a", "b", "c", "e"), Array("b", "c", "d")))
      .toDF("id", "a", "b").createOrReplaceTempView("sqlfn_i")
    val n = spark.sql("SELECT graft_sorted_intersect(a, b) FROM sqlfn_i")
      .head().getInt(0)
    assert(n == 2)
  }

  test("registered functions reject wrong arities with a clear error") {
    val e = intercept[Exception](spark.sql("SELECT graft_vec_dot(array(1.0f))").collect())
    assert(e.getMessage.contains("graft_vec_dot expects 2 arguments"))
  }
}
