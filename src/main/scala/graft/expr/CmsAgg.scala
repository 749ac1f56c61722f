package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable count-min matrix (row-major `depth × width` longs) with the
  * repo's ONE portable hash: cell (r, b) for term t has
  * `b = md5_prefix64(r || ':' || t, 8) mod width` — byte-identical to
  * `Dedup.cmsCells` and the DuckDB oracle, so sketches built by any of
  * the three agree cell-for-cell.
  */
final class CmsMatrix(val depth: Int, val width: Int) {
  val cells: Array[Long] = new Array[Long](depth * width)

  // cached "r:" prefixes — term bytes are appended per add, so the only
  // per-row allocation is one combined byte array per sketch row
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(r => s"$r:".getBytes("UTF-8"))

  def add(term: UTF8String): Unit = {
    val tb = term.getBytes
    var r = 0
    while (r < depth) {
      val p = prefixes(r)
      val buf = new Array[Byte](p.length + tb.length)
      System.arraycopy(p, 0, buf, 0, p.length)
      System.arraycopy(tb, 0, buf, p.length, tb.length)
      val b = (HashUtil.md5Prefix64(buf, 8) % width).toInt
      cells(r * width + b) += 1L
      r += 1
    }
  }

  def mergeFrom(other: CmsMatrix): Unit = {
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
  }
}

/** Native count-min-sketch aggregate: `cms_sketch(term, depth, width)`
  * returns the row-major matrix as ARRAY<BIGINT>.
  *
  * The scale story vs the relational formulation (explode every term
  * into `depth` (r, b) cells and groupBy them): the exchange carries one
  * fixed `depth·width`-long matrix PER PARTITION instead of partial
  * counts for every distinct (r, b) cell per partition — O(partitions ·
  * d·w) bytes, independent of corpus size, merged by elementwise add.
  */
case class CmsSketchAgg(
    term: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsMatrix] {

  require(depth >= 1 && depth <= 16, "cms_sketch: depth must be in [1, 16]")
  require(width >= 1 && width <= (1 << 20), "cms_sketch: width must be in [1, 2^20]")

  override def children: Seq[Expression] = Seq(term)

  override def checkInputDataTypes(): TypeCheckResult =
    term.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a STRING term, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CmsMatrix = new CmsMatrix(depth, width)

  override def update(buf: CmsMatrix, input: InternalRow): CmsMatrix = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: CmsMatrix, other: CmsMatrix): CmsMatrix = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: CmsMatrix): Any = new GenericArrayData(buf.cells)

  override def serialize(buf: CmsMatrix): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 * buf.cells.length)
    out.asLongBuffer().put(buf.cells)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsMatrix = {
    val m = new CmsMatrix(depth, width)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(m.cells)
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(term = newChildren(0))

  override def prettyName: String = "cms_sketch"
}

object CmsSketchAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column-level entry: `sketch(col("term"), 4, 1024)`. */
  def sketch(term: Column, depth: Int, width: Int): Column =
    toCol(CmsSketchAgg(toExpr(term), depth, width).toAggregateExpression())
}
