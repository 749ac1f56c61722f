package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Bloom-filter bit file: `mBits` bits stored as 64-bit words.
  * Position i of term t is `md5_prefix64(t || ':' || i, 15) % mBits`
  * (the repo's one portable hash with a per-hash salt suffix), so the
  * DuckDB oracle reproduces every bit with pure string + integer
  * arithmetic. Union of two filters is the elementwise OR of the words.
  */
final class BloomBits(val mBits: Int, val k: Int) {
  val words: Array[Long] = new Array[Long](mBits / 64)

  def add(term: UTF8String): Unit = {
    val s = term.toString
    var i = 0
    while (i < k) {
      val p = (HashUtil.md5Prefix64(s + ":" + i, 15) % mBits).toInt
      words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def mightContain(term: UTF8String): Boolean = {
    val s = term.toString
    var i = 0
    while (i < k) {
      val p = (HashUtil.md5Prefix64(s + ":" + i, 15) % mBits).toInt
      if ((words(p >>> 6) >>> (p & 63) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  def orFrom(other: BloomBits): Unit = {
    var i = 0
    while (i < words.length) {
      words(i) |= other.words(i)
      i += 1
    }
  }

  def bitsSet: Int = {
    var n = 0
    var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }
}

/** Native Bloom-filter aggregate: `bloom_sketch(term, mBits, k)` returns
  * the filter as ARRAY<BIGINT> (mBits/64 words, little-endian bit order
  * within each word). The membership pre-filter of the sketch family:
  * CMS answers "how often", HLL answers "how many distinct", Bloom
  * answers "have I seen this key" with zero false negatives and a
  * measurable false-positive rate.
  *
  * Scale story: the standing corpus's key set at 100 TB is billions of
  * rows — probing it is a full shuffle join. The Bloom file is
  * `mBits/8` BYTES TOTAL regardless of corpus size, broadcastable to
  * every executor, and prunes the probe scan to (true dups + the FP
  * residue) before the exact join runs. Partials merge by elementwise
  * OR — across partitions, shards, or days — which an exact key set
  * only matches by re-shuffling itself.
  *
  * Bit-deterministic by construction (md5 positions, OR merges), so the
  * oracle replays the filter exactly: build-side distinct positions,
  * probe side matches all k. No sampled/seeded randomness anywhere.
  */
case class BloomSketchAgg(
    term: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBits] {

  require(mBits >= 64 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, "k must be in [1, 16]")

  override def children: Seq[Expression] = Seq(term)

  override def checkInputDataTypes(): TypeCheckResult =
    term.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires a STRING term, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomBits = new BloomBits(mBits, k)

  override def update(buf: BloomBits, input: InternalRow): BloomBits = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: BloomBits, other: BloomBits): BloomBits = {
    buf.orFrom(other)
    buf
  }

  override def eval(buf: BloomBits): Any = new GenericArrayData(buf.words)

  override def serialize(buf: BloomBits): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 * buf.words.length)
    out.asLongBuffer().put(buf.words)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBits = {
    val b = new BloomBits(mBits, k)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(b.words)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketchAgg =
    copy(term = newChildren(0))

  override def prettyName: String = "bloom_sketch"
}

object BloomSketchAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
  import org.apache.spark.sql.catalyst.expressions.{Add, And, BitwiseAnd, Cast,
    Concat, ElementAt, EqualTo, IntegralDivide, Literal, Remainder, ShiftRight}
  import org.apache.spark.sql.types.IntegerType

  /** Column-level entry: `sketch(col("key"), mBits, k)`. */
  def sketch(term: Column, mBits: Int, k: Int): Column =
    toCol(BloomSketchAgg(toExpr(term), mBits, k).toAggregateExpression())

  /** Membership test as a resolved Catalyst expression tree — true iff
    * all k bit positions of `term` are set in the `words` ARRAY<BIGINT>
    * (the aggregate's output, typically broadcast as a 1-row
    * dimension). All built-in expressions — stays inside whole-stage
    * codegen on the probe scan. Also the body of the SQL function
    * `bloom_might_contain` (a plain Column composition would reach the
    * injected-function path unresolved).
    */
  def mightContainExpr(words: Expression, term: Expression,
                       mBits: Int, k: Int): Expression =
    (0 until k).map { i =>
      val p = Remainder(
        Md5Prefix64(Concat(Seq(term, Literal(":" + i))), 15),
        Literal(mBits.toLong))
      val word = ElementAt(words,
        Add(Cast(IntegralDivide(p, Literal(64L)), IntegerType), Literal(1)))
      // & 1, not % 2: arithmetic >> keeps the sign, so a word with bit 63
      // set shifts to a NEGATIVE odd value and % 2 would yield -1
      EqualTo(
        BitwiseAnd(
          ShiftRight(word, Cast(Remainder(p, Literal(64L)), IntegerType)),
          Literal(1L)),
        Literal(1L))
    }.reduceLeft[Expression]((a, b) => And(a, b))

  /** Column-level probe: `mightContain(col("words"), col("key"), m, k)`. */
  def mightContain(words: Column, term: Column, mBits: Int, k: Int): Column =
    toCol(mightContainExpr(toExpr(words), toExpr(term), mBits, k))
}
