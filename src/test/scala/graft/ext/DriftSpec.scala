package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Histogram-drift statistics — exact closed-form cases (the fixture
  * queries `emb_drift`/`corpus_drift` hash-gate the full pipelines; this
  * pins the statistic's math and conventions on planted windows). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Int, Boolean)], nBins: Int) =
    Drift.histogramDrift(rows.toDF("bin", "__ref"), nBins)
      .collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"), r.getAs[Double]("tv"),
        r.getAs[Double]("chi2")))

  test("identical windows: zero drift, every bin spine row present") {
    val rows = for (b <- Seq(0, 0, 1, 2); ref <- Seq(true, false)) yield (b, ref)
    val got = run(rows, 4)
    got.map(_._1) shouldBe Seq(0L, 1L, 2L, 3L) // spine fills empty bin 3
    got.foreach { case (_, _, _, tv, chi2) =>
      tv shouldBe 0.0
      chi2 shouldBe 0.0
    }
  }

  test("disjoint windows: TV reaches its maximum 2; empty-ref bins add 0 to chi2") {
    // ref mass all in bin 0, cur mass all in bin 1
    val got = run(Seq((0, true), (0, true), (1, false), (1, false)), 2)
    got.head._4 shouldBe 2.0 // |0-1| + |1-0|
    // chi2 convention: bin 1 has n_ref = 0 → contributes 0; bin 0 has
    // p_cur = 0 → (0-1)²/1 = 1
    got.head._5 shouldBe 1.0
  }

  test("an empty window refuses instead of reporting NaN-poisoned totals") {
    // first crawl: nothing in the reference window
    an[IllegalArgumentException] should be thrownBy
      run(Seq((0, false), (1, false)), 2)
    // dead scraper: nothing in the current window
    an[IllegalArgumentException] should be thrownBy
      run(Seq((0, true), (1, true)), 2)
  }

  test("partial shift: exact rational values") {
    // ref: 2 in bin0, 2 in bin1; cur: 3 in bin0, 1 in bin1
    val rows = Seq((0, true), (0, true), (1, true), (1, true),
      (0, false), (0, false), (0, false), (1, false))
    val got = run(rows, 2)
    got.map(t => (t._1, t._2, t._3)).toSeq shouldBe Seq((0L, 2L, 3L), (1L, 2L, 1L))
    // p_ref = (.5,.5), p_cur = (.75,.25): tv = .25+.25; chi2 = .0625/.5 ×2
    got.head._4 shouldBe 0.5
    got.head._5 shouldBe 0.25
  }
}
