package graft.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable bounded top-k buffer: a size-k binary min-heap whose root is
  * the WORST retained (score, key) pair under the order (score desc,
  * key asc). Insert is O(1) reject / O(log k) accept; no boxing, no
  * per-row (de)serialization — the fix for the encoder-boxed
  * `Aggregator` this replaces (3.7× regression on x12, VERDICT r2 #2).
  */
final class TopKHeap(val k: Int) {
  var size: Int = 0
  val scores: Array[Long] = new Array[Long](k)
  val keys: Array[UTF8String] = new Array[UTF8String](k)

  // a is strictly worse than b: lower score, or same score and later key
  @inline private def worse(sa: Long, ka: UTF8String, sb: Long, kb: UTF8String): Boolean =
    sa < sb || (sa == sb && ka.compareTo(kb) > 0)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val t = keys(i); keys(i) = keys(j); keys(j) = t
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), keys(i), scores(p), keys(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), keys(l), scores(m), keys(m))) m = l
      if (r < size && worse(scores(r), keys(r), scores(m), keys(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  /** `key` must already be safe to retain (cloned off any reused row buffer). */
  def insert(score: Long, key: UTF8String): Unit =
    if (size < k) {
      scores(size) = score
      keys(size) = key
      size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), keys(0), score, key)) {
      scores(0) = score
      keys(0) = key
      siftDown()
    }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.keys(i)); i += 1 }
  }

  /** Retained pairs ordered best-first (score desc, key asc). */
  def sortedPairs: Array[(Long, UTF8String)] = {
    val out = Array.tabulate(size)(i => (scores(i), keys(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Long, UTF8String), b: (Long, UTF8String)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
    out
  }
}

/** Native partial top-k aggregate: `top_k_pairs(score, key, k)` returns
  * the k best (score, key) pairs per group as ARRAY<STRUCT<score, key>>
  * ordered by (score desc, key asc).
  *
  * The scalable replacement for `row_number().over(partitionBy(g)
  * .orderBy(...)) <= k`: a window shuffles and SORTS every row of every
  * group, while this partial-aggregates map-side — each partition
  * forwards at most k pairs per group into the exchange and the merge is
  * associative. A `TypedImperativeAggregate` keeps the heap as a live
  * JVM object for the whole partition and pays serialization only at the
  * exchange boundary (the encoder-backed `Aggregator` formulation
  * round-tripped the buffer through an `ExpressionEncoder` on every
  * input row).
  */
case class TopKPairs(
    score: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1, "top_k_pairs: k must be >= 1")

  override def children: Seq[Expression] = Seq(score, key)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, key.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, t) => TypeCheckResult.TypeCheckFailure(
        s"top_k_pairs requires (BIGINT score, STRING key), got ${s.sql} and ${t.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType), StructField("key", StringType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val t = key.eval(input)
    if (s != null && t != null) {
      // clone: the UTF8String points into a reused unsafe row buffer
      buf.insert(s.asInstanceOf[Long], t.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, t) =>
      InternalRow(s, t): Any
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.scores(i))
      val b = buf.keys(i).getBytes
      out.writeInt(b.length)
      out.write(b)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val s = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      heap.insert(s, UTF8String.fromBytes(b))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), key = newChildren(1))

  override def prettyName: String = "top_k_pairs"
}

object TopKPairs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column-level entry: `topK(col("score"), col("term"), 3)`. */
  def topK(score: Column, key: Column, k: Int): Column =
    toCol(TopKPairs(toExpr(score), toExpr(key), k).toAggregateExpression())
}
