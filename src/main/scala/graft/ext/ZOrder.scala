package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * primitive behind Delta/Iceberg `ZORDER BY`: interleaving the bits of
  * two dimension values gives a single sort key under which points
  * close in BOTH dimensions land close in the key space, so a range
  * predicate on either (or both) dimensions prunes to a small key
  * range of files/row-groups instead of a full scan.
  *
  * Morton keys are monotone per dimension (each input bit keeps its own
  * weight in the output), so every point of the box
  * `[x0,x1]×[y0,y1]` has `z ∈ [morton(x0,y0), morton(x1,y1)]` — the
  * classic superset bound a reader uses for skipping. Pure integer
  * bit arithmetic (shifts/and/or), bit-identical in any engine.
  */
object ZOrder {

  /** 16-bit Morton key of two 8-bit dimension values (callers mask their
    * dims into [0, 255] first). x occupies even bit positions, y odd.
    */
  def morton8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftleft(x.bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)

  /** DuckDB mirror of [[morton8]] over SQL expressions `x` and `y`. */
  def morton8Sql(x: String, y: String): String =
    (0 until 8).map { i =>
      s"((($x) & ${1L << i}) << $i) | ((($y) & ${1L << i}) << ${i + 1})"
    }.mkString("(", " | ", ")")
}
