package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY.md §7.3: the one place a
  * custom aggregate is warranted): IN = one shingle hash, BUF = the
  * running per-slot minima, OUT = the nSig-slot signature.
  *
  * Same hash family as the declarative path in [[Dedup]]
  * (((2j+1)·x + 7919j) mod 4294967311), so signatures are
  * interchangeable. Being a real `Aggregator`, it partial-aggregates
  * map-side, merges associatively, and — unlike the batch-only
  * explode+min formulation — drops straight into Structured Streaming
  * (`groupBy(...).agg(minhash(...))` in update mode) for incremental
  * sketch maintenance at ingest time.
  */
class MinHashAggregator(val nSig: Int = 16)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val P = 4294967311L

  override def zero: Array[Long] = Array.fill(nSig)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var j = 0
    while (j < nSig) {
      val h = ((2L * j + 1) * x + 7919L * j) % P
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < nSig) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
