package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift monitoring between two corpus snapshots (round
  * 13) — the check a 100 TB ingestion pipeline runs between crawl
  * generations to catch a scraper regression or a source-mix shift
  * before it poisons a training run.
  *
  * The caller bins each row (any scalar: a projection of an embedding,
  * a document length, a quality score) and tags which window it belongs
  * to; [[histogramDrift]] reduces that to `nBins` rows per window and
  * reports per-bin shift plus two whole-distribution statistics:
  *
  *  - `tv` — the L1 histogram distance Σ|p_cur − p_ref|;
  *  - `chi2` — Σ (p_cur − p_ref)²/p_ref over bins with reference mass
  *    (empty-reference bins contribute 0 by convention; their raw
  *    counts stay visible per-bin).
  *
  * ln-based divergences (PSI/KL) are deliberately NOT offered: IEEE
  * arithmetic (+,−,×,÷) on identical inputs is deterministic across
  * engines, transcendental libm calls are not — and the oracle gate
  * depends on bit equality. Totals follow the exact-decimal sum
  * discipline (terms cast to DECIMAL(28,12) before summing, so they are
  * aggregation-order-independent), then surface as doubles.
  *
  * Scale shape: ONE aggregation pass over the union of both windows
  * (map-side partial to ≤ nBins rows per task), an nBins-row spine
  * join, and window sums over nBins rows — nothing downstream of the
  * first aggregation grows with the corpus. */
object Drift {

  /** `binned` must carry (`bin` int, `__ref` boolean — true for the
    * reference window). Returns one row per bin in [0, nBins):
    * (bin, n_ref, n_cur, tv_term, chi2_term, tv, chi2), ordered. */
  def histogramDrift(binned: DataFrame, nBins: Int): DataFrame = {
    val spark = binned.sparkSession
    val counts = binned
      .groupBy("bin")
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("n_cur"))
    val spine = spark.range(0, nBins.toLong)
      .select(col("id").cast("int").as("bin"))
    val w = Window.partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val dec0 = lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 12))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("__pr", col("n_ref").cast("double") / sum("n_ref").over(w))
      .withColumn("__pc", col("n_cur").cast("double") / sum("n_cur").over(w))
      .withColumn("tv_term",
        abs(col("__pc") - col("__pr")).cast(DecimalType(28, 12)))
      .withColumn("chi2_term",
        when(col("n_ref") === 0L, dec0).otherwise(
          ((col("__pc") - col("__pr")) * (col("__pc") - col("__pr")) /
            col("__pr")).cast(DecimalType(28, 12))))
      .select(col("bin").cast("long").as("bin"), col("n_ref"), col("n_cur"),
        col("tv_term").cast("double").as("tv_term"),
        col("chi2_term").cast("double").as("chi2_term"),
        sum(col("tv_term")).over(w).cast("double").as("tv"),
        sum(col("chi2_term")).over(w).cast("double").as("chi2"))
      .orderBy("bin")
  }
}
