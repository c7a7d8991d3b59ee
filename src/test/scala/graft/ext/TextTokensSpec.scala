package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark

class TextTokensSpec extends AnyFunSuite {
  import spark.implicits._

  test("token counting: whitespace vs BPE-ish pieces vs chars/4 estimate") {
    val d = Seq((1L, "Hello world, it's 2024!"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = TextOps.tokenCounts(d).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "Hello world, it's 2024!" → ws: [Hello, world,, it's, 2024!] = 4
    assert(out(1L).getAs[Long]("n_ws_tokens") == 4)
    // bpe: Hello|world|,|it|'|s|2024|! = 8
    assert(out(1L).getAs[Long]("n_bpe_pieces") == 8)
    assert(out(1L).getAs[Long]("n_tok_est") == math.ceil(23 / 4.0).toLong)
    assert(out(2L).getAs[Long]("n_ws_tokens") == 0)
    assert(out(3L).getAs[Long]("n_ws_tokens") == 0)
  }
}
