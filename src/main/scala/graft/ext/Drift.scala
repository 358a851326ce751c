package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * (bin, n_ref, n_cur, tv_term, chi2_term, tv, chi2), ordered.
    *
    * The corpus sees exactly ONE aggregation pass; its ≤ nBins-row
    * result is collected (the bounded 1-row-serve-collect class — a
    * histogram is driver-sized by definition) and the statistics are
    * finished in exact driver-side arithmetic: probabilities as IEEE
    * divisions of the collected integers, terms rounded to scale 12
    * HALF_UP — bit-for-bit the `CAST(x AS DECIMAL(28,12))` the oracle
    * applies — and totals as exact BigDecimal sums.
    *
    * An EMPTY window is refused, not averaged over: a first crawl (no
    * reference) or a dead scraper (no current) makes every p a 0/0 —
    * the degenerate comparison must flag loudly, because silently
    * reporting NaN-poisoned totals is precisely the monitoring failure
    * this operator exists to catch. */
  def histogramDrift(binned: DataFrame, nBins: Int): DataFrame =
    histogramDriftCounts(
      binned
        .groupBy("bin")
        .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("__ref"), 1L).otherwise(0L)).as("n_cur")),
      nBins)

  /** The counts-based core: `counts` carries one (bin, n_ref, n_cur)
    * row per observed bin — the shape a STREAMING monitor accumulates
    * across micro-batches (counting is associative, so cumulative
    * per-batch counts and a one-shot aggregation are the same input
    * here; the `stream_drift_replay` shared oracle hash-pins that). */
  def histogramDriftCounts(counts: DataFrame, nBins: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val byCnt = counts
      .select(col("bin").cast("int"), col("n_ref").cast("long"),
        col("n_cur").cast("long"))
      .as[(Int, Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (b, rows) =>
        b -> (rows.map(_._2).sum, rows.map(_._3).sum) }
    // out-of-range bins must fail loudly, not vanish: an unclamped
    // caller losing mass silently is the exact monitoring failure this
    // operator exists to catch (the degenerate-window guard below can't
    // see it — totals over the surviving bins still look healthy)
    val stray = byCnt.keys.filter(b => b < 0 || b >= nBins)
    require(stray.isEmpty,
      s"histogramDrift: bins outside [0, $nBins) in the input counts " +
        s"(${stray.toSeq.sorted.take(5).mkString(", ")}…) — clamp the " +
        "binning expression (least/greatest) before handing counts over")
    val byBin = (0 until nBins).map(b => byCnt.getOrElse(b, (0L, 0L)))
    val nRef = byBin.map(_._1).sum
    val nCur = byBin.map(_._2).sum
    require(nRef > 0 && nCur > 0,
      s"histogramDrift: degenerate comparison — reference window has " +
        s"$nRef rows, current window has $nCur; drift against an empty " +
        "window is undefined (new corpus? dead scraper?)")
    def dec(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d)
        .setScale(12, java.math.RoundingMode.HALF_UP)
    val terms = byBin.map { case (r, c) =>
      val pr = r.toDouble / nRef
      val pc = c.toDouble / nCur
      val tv = dec(math.abs(pc - pr))
      val chi2 = if (r == 0L) java.math.BigDecimal.ZERO.setScale(12)
        else dec((pc - pr) * (pc - pr) / pr)
      (tv, chi2)
    }
    val tvTotal = terms.map(_._1).reduce(_ add _).doubleValue
    val chi2Total = terms.map(_._2).reduce(_ add _).doubleValue
    byBin.zipWithIndex.map { case ((r, c), b) =>
      (b.toLong, r, c, terms(b)._1.doubleValue, terms(b)._2.doubleValue,
        tvTotal, chi2Total)
    }.toDF("bin", "n_ref", "n_cur", "tv_term", "chi2_term", "tv", "chi2")
      .orderBy("bin")
  }
}
