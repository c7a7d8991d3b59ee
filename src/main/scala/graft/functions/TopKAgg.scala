package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k highest (score, id) pairs per group
  * in a size-k buffer — the aggregation-path alternative to
  * window+row_number for top-k-per-group. The buffer never exceeds k
  * entries, so partial aggregation ships at most k rows per group per map
  * task regardless of group size; ties broken by ascending id (matching the
  * window formulation `ORDER BY score DESC, id ASC`).
  *
  * (Spark 3.5+'s WindowGroupLimit gives the window plan similar map-side
  * bounding; this Aggregator exists as the library's custom-aggregate
  * extension point — SURVEY.md §7.4 — and for groupBy pipelines where a
  * window would force a second shuffle.)
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    // fast reject: buffer full and the new item loses to the current weakest
    if (buf.size >= k) {
      val (ws, wid) = buf.last
      if (in._1 < ws || (in._1 == ws && in._2 > wid)) return buf
    }
    trim(buf :+ in)
  }
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopKAgg {
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
}
