package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Population-stability monitoring for score pipelines — the quality
  * family's operational complement, exactly as the codebook-drift
  * report (x89) is the ANN family's: before a standing quality
  * threshold is trusted on a NEW data tranche, compare the tranche's
  * score distribution against the standing corpus'. The metric is PSI
  * (population stability index — the standard model-monitoring
  * statistic: Σ (p_new − p_std)·ln(p_new/p_std) over score bins;
  * > 0.2 conventionally means "distribution shifted, re-examine the
  * model/threshold").
  *
  * Determinism discipline: scores are integers (the x85/x93 models are
  * integer-exact), bins are the x102 equal-width BIGINT bins over the
  * COMBINED extrema (one broadcast scalar row — no global sort), bin
  * counts are BIGINT, and the only floating arithmetic is the add-one-
  * smoothed fractions and one ln per bin, rounded to 6 dp — the x100
  * pattern, so DuckDB replays every PSI contribution.
  *
  * Scale shape: one pass over each side (map-side partial aggregation
  * collapses both to ≤ `bins` rows), extrema and totals ride as
  * broadcast scalars, and the report is `bins` rows — nothing
  * corpus-sized ever shuffles.
  */
object Drift {

  /** Per-bin PSI report between a standing and a new score frame:
    * (bin, n_std, n_new, psi) with `bins` rows always present (empty
    * bins carry zero counts; add-one smoothing keeps their PSI
    * defined). Total PSI = Σ psi.
    */
  def scorePsi(standing: DataFrame, incoming: DataFrame, scoreCol: String,
               bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = standing.sparkSession
    val lab = standing.select(col(scoreCol).cast("long").as("score"),
        lit(0).as("src"))
      .unionAll(incoming.select(col(scoreCol).cast("long").as("score"),
        lit(1).as("src")))
    val ext = lab.agg(min("score").as("mn"), max("score").as("mx"))
    val counts = lab.crossJoin(broadcast(ext))
      .withColumn("bin",
        ((col("score") - col("mn")) * bins / (col("mx") - col("mn") + 1))
          .cast("long"))
      .groupBy("bin")
      .agg(sum(when(col("src") === 0, 1L).otherwise(0L)).as("n_std"),
        sum(when(col("src") === 1, 1L).otherwise(0L)).as("n_new"))
    val allBins = spark.range(bins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_std"), lit(0L)).as("n_std"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tots = allBins.agg(sum("n_std").as("ts"), sum("n_new").as("tn"))
    val fs = (col("n_std") + lit(1.0)) / (col("ts") + bins)
    val fn = (col("n_new") + lit(1.0)) / (col("tn") + bins)
    allBins.crossJoin(broadcast(tots))
      .select(col("bin"), col("n_std"), col("n_new"),
        round((fn - fs) * log(fn / fs), 6).as("psi"))
  }
}
