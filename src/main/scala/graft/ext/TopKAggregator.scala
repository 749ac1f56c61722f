package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial top-k aggregator: IN = (score, key), OUT = the k best
  * pairs ordered by (score desc, key asc).
  *
  * The scalable replacement for `row_number().over(partitionBy(group))
  * ≤ k`: a window must shuffle and SORT every row of every group, while
  * an Aggregator partial-aggregates map-side — each partition sends at
  * most k pairs per group into the exchange, and the merge is
  * associative. At corpus scale (per-doc term scores, per-domain top
  * documents) that turns a full-sort shuffle into a bounded one.
  */
class TopKAggregator(val k: Int)
    extends Aggregator[(Long, String), Seq[(Long, String)], Seq[(Long, String)]] {

  require(k >= 1, "k must be >= 1")

  // strict weak order: score desc, key asc
  private def better(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, String)] = Seq.empty

  override def reduce(buf: Seq[(Long, String)], x: (Long, String)): Seq[(Long, String)] =
    if (buf.size == k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
}
