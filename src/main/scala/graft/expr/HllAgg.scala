package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable HyperLogLog register file: m = 256 registers (p = 8), fed by
  * the repo's ONE portable hash. For term t, `h = md5_prefix64(t, 15)`
  * (60 bits, nonnegative): the top 8 bits pick the register, the low 52
  * are the rank pattern — `rho` = position of the highest set bit from
  * the left of the 52-bit field (53 when the field is all zeros), and
  * each register keeps the max. Deterministic by construction: the
  * DuckDB oracle rebuilds the identical register file from the same md5
  * prefixes with pure integer arithmetic.
  */
final class HllRegisters {
  val regs: Array[Int] = new Array[Int](HllRegisters.M)

  def add(term: UTF8String): Unit = {
    val h = HashUtil.md5Prefix64(term.getBytes, 15)
    val j = (h >>> 52).toInt
    val w = h & ((1L << 52) - 1)
    val rho = if (w == 0L) 53 else java.lang.Long.numberOfLeadingZeros(w) - 11
    if (rho > regs(j)) regs(j) = rho
  }

  def mergeFrom(other: HllRegisters): Unit = {
    var i = 0
    while (i < regs.length) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

object HllRegisters {
  val P = 8
  val M: Int = 1 << P
}

/** Native HyperLogLog aggregate: `hll_sketch(term)` returns the 256
  * registers as ARRAY<INT> — the distinct-count twin of `cms_sketch`
  * (frequency). Callers compute the estimate from the registers with
  * plain column arithmetic (`alpha·m² / Σ 2^−Mj`); every 2^−Mj is a
  * dyadic rational, so the indicator sum is EXACT in double no matter
  * the summation order and both engines of the oracle agree to the
  * bit. (No small-range linear-counting correction: it needs `ln`,
  * whose last ulp is not portable across engines — the raw estimate is
  * the deterministic contract, accurate in the regime n ≳ 2.5·m.)
  *
  * Scale story vs `count_distinct`: the exchange carries one fixed
  * 256-int register file per partition instead of every distinct value
  * — O(partitions·m) bytes for any corpus, merged by elementwise max,
  * and sketches for different slices union by the same max (mergeable
  * across days/shards, which exact distinct counts are not).
  */
case class HllSketchAgg(
    term: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllRegisters] {

  override def children: Seq[Expression] = Seq(term)

  override def checkInputDataTypes(): TypeCheckResult =
    term.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_sketch requires a STRING term, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllRegisters = new HllRegisters

  override def update(buf: HllRegisters, input: InternalRow): HllRegisters = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: HllRegisters, other: HllRegisters): HllRegisters = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HllRegisters): Any = new GenericArrayData(buf.regs)

  override def serialize(buf: HllRegisters): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * buf.regs.length)
    out.asIntBuffer().put(buf.regs)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): HllRegisters = {
    val r = new HllRegisters
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(r.regs)
    r
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(term = newChildren(0))

  override def prettyName: String = "hll_sketch"
}

/** `hll_count_distinct(term)`: the register file of [[HllSketchAgg]]
  * evaluated straight to a LONG estimate (`round(alpha·m²/Σ2^−Mj)`).
  * Exists for [[ApproxDistinctRule]]: swapping `count(DISTINCT c)` for
  * this aggregate is type-preserving, so the optimizer rule is a pure
  * AggregateFunction substitution — no expression-tree surgery above
  * the aggregate. Same determinism as the register file itself.
  */
case class HllCountDistinctAgg(
    term: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllRegisters] {

  override def children: Seq[Expression] = Seq(term)

  override def checkInputDataTypes(): TypeCheckResult =
    term.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_count_distinct requires a STRING term, got ${t.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllRegisters = new HllRegisters

  override def update(buf: HllRegisters, input: InternalRow): HllRegisters = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: HllRegisters, other: HllRegisters): HllRegisters = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HllRegisters): Any = {
    // Small-range correction (ADVICE r6): the raw estimator alone maps
    // an empty register file to ~184 (z = 256 → alpha·m²/256) — a
    // categorical error for empty/low-cardinality groups, which the
    // opt-in count(DISTINCT)→HLL rewrite hits on every small group.
    // Standard HLL linear counting: with V zero registers and raw
    // estimate ≤ 2.5·m, use m·ln(m/V) — V=m gives exactly 0, V=m−1
    // gives 1. StrictMath.log is bit-deterministic across JVMs (this
    // aggregate has no cross-engine oracle; the dyadic-sum estimate
    // contract of hll_sketch/x74 is a different, unchanged code path).
    var z = 0.0d
    var zeros = 0
    var i = 0
    while (i < buf.regs.length) {
      if (buf.regs(i) == 0) zeros += 1
      z += java.lang.Math.pow(2.0d, -buf.regs(i))
      i += 1
    }
    val m = buf.regs.length.toDouble
    val raw = 0.7213 / (1.0 + 1.079 / m) * m * m / z
    if (raw <= 2.5 * m && zeros > 0)
      java.lang.Math.round(m * java.lang.StrictMath.log(m / zeros))
    else java.lang.Math.round(raw)
  }

  override def serialize(buf: HllRegisters): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * buf.regs.length)
    out.asIntBuffer().put(buf.regs)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): HllRegisters = {
    val r = new HllRegisters
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(r.regs)
    r
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllCountDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllCountDistinctAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllCountDistinctAgg =
    copy(term = newChildren(0))

  override def prettyName: String = "hll_count_distinct"
}

object HllSketchAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column-level entry: `sketch(col("term"))`. */
  def sketch(term: Column): Column =
    toCol(HllSketchAgg(toExpr(term)).toAggregateExpression())

  /** HLL estimate from a register array: `alpha·m² / Σ 2^−Mj` — exact
    * double arithmetic (dyadic indicator sum), identical in DuckDB.
    */
  def estimate(regs: Column): Column = {
    import org.apache.spark.sql.functions._
    val z = aggregate(regs, lit(0.0d), (acc, r) => acc + pow(lit(2.0d), -r.cast("double")))
    lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0d) / z
  }
}
