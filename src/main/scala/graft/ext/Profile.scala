package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StructType}

/** One-scan data profiling — the ANALYZE operator, schema-driven so it
  * runs on ANY table (x78 is the declared instance over `documents`).
  *
  * Per column: non-null count, null count, exact distinct count, the
  * HLL estimate of the same, and min/max in native-type order rendered
  * as strings. The exact distinct and the sketch sit side by side on
  * purpose: at 100 TB the exact count is the expand-and-reshuffle you
  * delete, the 256-int register file is what ships, and the profile
  * quantifies the swap per column. Counts and min/max are map-side
  * partial aggregation on the scan; the whole profile is ONE pass
  * however many columns the table has.
  */
object Profile {

  /** Per-column profile rows `(col_name, n_nonnull, n_null, n_distinct,
    * hll_est, min_s, max_s)`, one per profiled column, ordered by name.
    * `columns` defaults to every top-level column of the frame; map
    * columns are rejected (no ordering), as are names that would not
    * survive re-parsing inside the unpivot expression.
    */
  def tableProfile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "tableProfile needs at least one column")
    cols.foreach { c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"tableProfile column name not a plain identifier: $c")
      // generated aggregate aliases live in the __prof_ namespace, so an
      // input column there could alias-collide with a generated name
      // (ADVICE r6: a column literally named 'total' collided with the
      // old bare n_total alias, miswiring the stack() references)
      require(!c.startsWith("__prof_"),
        s"tableProfile column name collides with generated aliases: $c")
      require(!df.schema(c).dataType.isInstanceOf[MapType] &&
        !df.schema(c).dataType.isInstanceOf[StructType],
        s"tableProfile column $c: map/struct columns have no min/max ordering")
    }
    val est = (c: String) => graft.expr.HllSketchAgg.estimate(
      graft.expr.HllSketchAgg.sketch(col(c).cast("string")))
    val aggs: Seq[Column] = count(lit(1)).as("__prof_total") +: cols.flatMap { c => Seq(
      count(col(c)).as(s"__prof_n_$c"),
      countDistinct(col(c)).as(s"__prof_nd_$c"),
      round(est(c), 6).as(s"__prof_est_$c"),
      min(col(c)).cast("string").as(s"__prof_min_$c"),
      max(col(c)).cast("string").as(s"__prof_max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, " + cols.map(c =>
          s"'$c', __prof_total, `__prof_n_$c`, `__prof_nd_$c`, `__prof_est_$c`, `__prof_min_$c`, `__prof_max_$c`").mkString(", ") +
        ") AS (col_name, n_total, n_nonnull, n_distinct, hll_est, min_s, max_s)"))
      .select(col("col_name"), col("n_nonnull"),
        (col("n_total") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("hll_est"), col("min_s"), col("max_s"))
      .orderBy("col_name")
  }

  /** Generic snapshot diff (x77 is the declared instance with a planted
    * revision): classify every id across two snapshots of the same
    * schema as added / removed / changed / unchanged, by full-outer
    * join on `idCol` comparing a row fingerprint — md5 of the JSON of
    * all non-id columns in schema order. Ships 128-bit hashes through
    * the join, never the row bodies.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String): DataFrame = {
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"snapshotDiff: schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    def fp(df: DataFrame, out: String): DataFrame = {
      val body = df.columns.filter(_ != idCol).sorted.map(col)
      df.select(col(idCol), md5(to_json(struct(body.toIndexedSeq: _*))).as(out))
    }
    fp(a, "fp_a").join(fp(b, "fp_b"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") === col("fp_b"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
