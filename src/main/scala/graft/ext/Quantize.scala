package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the storage/IO
  * side of ANN at 100 TB: a 64-dim float32 vector is 256 bytes; its
  * SQ8 codes are 64, so a quantized candidate scan reads 4× fewer
  * bytes and the codes ride shuffles that raw vectors shouldn't.
  *
  * All arithmetic is INTEGER on micro-unit values (`floor(v·10⁶)` —
  * floor, not round/cast, because Spark truncates and DuckDB rounds on
  * raw double→int casts, while IEEE `floor` is identical everywhere):
  * per-dimension `[mn, mx]` ranges, `code = ((vi−mn)·255) div span`,
  * `recon = mn + (code·span) div 255`. Every quantity is bit-replayable
  * in the DuckDB oracle — no float rounding can flip a code at the
  * boundary.
  *
  * Scale shape: the range pass is one map-side-combined groupBy on 64
  * dimension keys; ranges are broadcast back (64 rows), so quantization
  * itself is a scan-speed projection — no shuffle of vector data.
  */
object Quantize {

  /** Micro-unit integer value of a float embedding component. */
  private def vi(v: Column): Column = floor(v.cast("double") * 1000000d).cast("long")

  /** Exact integer division for nonnegative a, positive b — `a div b`
    * as pure Column ops (usable inside lambda functions where
    * `expr("a div b")` strings can't reach). `a − a%b` is exactly
    * divisible, so the double division is exact below 2⁵³.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Per-dimension integer ranges over the corpus: (dim, mn, mx). */
  def dimRanges(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), vi(col("v")).as("vi"))
      .groupBy("dim").agg(min("vi").as("mn"), max("vi").as("mx"))

  /** Per-dimension quantization error report: (dim, mn, mx, n,
    * sum_abs_err, max_err) in micro-units — the "is 8 bits enough for
    * this column" answer, and the first thing to check before switching
    * a corpus's ANN path to quantized codes. Errors are exact integers,
    * so aggregation order can't drift the result.
    */
  def sq8Stats(emb: DataFrame, vecCol: String): DataFrame = {
    val ex = emb.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), vi(col("v")).as("vi"))
    val span = col("mx") - col("mn")
    ex.join(broadcast(dimRanges(emb, vecCol)), "dim")
      .withColumn("code",
        when(span === 0, 0L).otherwise(idiv((col("vi") - col("mn")) * 255, span)))
      .withColumn("recon",
        col("mn") + when(span === 0, 0L).otherwise(idiv(col("code") * span, lit(255L))))
      .withColumn("err", abs(col("vi") - col("recon")))
      .groupBy("dim", "mn", "mx")
      .agg(count(lit(1)).as("n"),
        sum(col("err")).as("sum_abs_err"),
        max(col("err")).as("max_err"))
      .select("dim", "mn", "mx", "n", "sum_abs_err", "max_err")
  }

  /** Reconstructed (de-quantized) vectors: (idCol, `recon` as
    * array<double> in original units) — what an SQ8 ANN path actually
    * scores against. The 64 per-dim ranges collapse to two broadcast
    * array literals, so reconstruction is a scan-speed `transform` over
    * the vector column with no shuffle and no explode.
    */
  def reconVectors(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val arrs = dimRanges(emb, vecCol)
      .agg(array_sort(collect_list(struct(col("dim"), col("mn")))).as("mns"),
        array_sort(collect_list(struct(col("dim"), col("mx")))).as("mxs"))
      .select(transform(col("mns"), s => s.getField("mn")).as("mnArr"),
        transform(col("mxs"), s => s.getField("mx")).as("mxArr"))
    emb.crossJoin(broadcast(arrs))
      .select(col(idCol),
        transform(col(vecCol), (v, i) => {
          val mn = element_at(col("mnArr"), (i + 1).cast("int"))
          val mx = element_at(col("mxArr"), (i + 1).cast("int"))
          val span = mx - mn
          val code = when(span === 0, lit(0L))
            .otherwise(idiv((vi(v) - mn) * 255, span))
          val recon = mn + when(span === 0, lit(0L)).otherwise(idiv(code * span, lit(255L)))
          recon.cast("double") / 1000000d
        }).as("recon"))
  }
}
