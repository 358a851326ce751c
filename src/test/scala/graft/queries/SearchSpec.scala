package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value-level retrieval gates the hash oracles can't express on
  * their own (round-15 verdict #1/#2): the oracle compare proves the
  * engine and DuckDB AGREE, but both can agree on an empty arm — round
  * 14's `search_bm25_indexed` hash-passed on zero rows because the
  * absolute df cap emptied the lexical arm at fixture scale. These
  * tests pin NON-VACUITY: the BM25 serve returns candidates for every
  * probe, and the hybrid fusion contains candidates reachable ONLY
  * through the lexical arm. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("search_bm25_indexed is non-vacuous: every probe gets candidates") {
    val res = SimilarityQueries.searchBm25Indexed(spark, dir)
    val perProbe = res.groupBy("probe_id").count()
      .as[(Long, Long)].collect().toMap
    // all NProbes probes present, each with a full top-R page (the
    // 500-doc fixture has far more admitted candidates than RrfDepth)
    perProbe.keySet shouldBe (0L until 5L).toSet
    perProbe.values.foreach(_ should be > 0L)
    // and the scores are real BM25 sums, not a degenerate constant
    res.select(countDistinct(col("score"))).as[Long].head() should be > 1L
  }

  test("pruned serve: candidates bounded, scores exact, recall neither vacuous nor free") {
    val pruned = SimilarityQueries.searchBm25Pruned(spark, dir)
      .select("probe_id", "cand_id", "score")
      .as[(Long, Long, Double)].collect()
    pruned.map(_._1).toSet shouldBe (0L until 5L).toSet
    // two-phase contract: a pruned-serve score IS the exact serve's
    // score for the same pair — only the candidate SET approximates
    val exact = SimilarityQueries.searchBm25Indexed(spark, dir)
      .select("probe_id", "cand_id", "score")
      .as[(Long, Long, Double)].collect()
      .map { case (p, c, s) => (p, c) -> s }.toMap
    pruned.foreach { case (p, c, s) =>
      exact.get((p, c)).foreach(es => withClue(s"pair ($p,$c) ") {
        s shouldBe es
      })
    }
    val rec = SimilarityQueries.searchPrunedRecall(spark, dir)
      .select("recall_at_k").as[Double].collect()
    // non-vacuous (the prefix-only-scoring bug read 0.0 here) and not
    // degenerate-complete (M actually prunes at fixture scale)
    rec.sum should be > 0.0
    assert(rec.exists(_ < 1.0))
  }

  test("hybrid fusion carries lexical-only candidates (the arm contributes)") {
    val rec = SimilarityQueries.searchRecallQ(spark, dir)
      .select("probe_id", "n_hit", "lex_hits", "lex_only_hits")
      .as[(Long, Long, Long, Long)].collect()
    rec.map(_._1).toSet shouldBe (0L until 5L).toSet
    // the lexical arm proposed fused candidates...
    rec.map(_._3).sum should be > 0L
    // ...including at least one reachable ONLY through it — the
    // assertion that catches a silently empty arm (r15 verdict #1)
    rec.map(_._4).sum should be > 0L
    // and the vector arm still carries real recall: the fused top-K
    // finds exact-cosine ground truth for at least some probes
    rec.map(_._2).sum should be > 0L
  }

  test("pruned-hybrid recall: non-vacuous lexical arm, recall within a stated delta of the exact composition") {
    val exact = SimilarityQueries.searchRecallQ(spark, dir)
      .select("probe_id", "n_hit", "lex_hits")
      .as[(Long, Long, Long)].collect()
    val pruned = SimilarityQueries.searchHybridPrunedRecall(spark, dir)
      .select("probe_id", "n_hit", "lex_hits")
      .as[(Long, Long, Long)].collect()
    pruned.map(_._1).toSet shouldBe (0L until 5L).toSet
    // the bounded lexical arm still proposes fused candidates — the
    // r14 vacuity class stays mechanically impossible on THIS endpoint
    // too, not only the exact one
    pruned.map(_._3).sum should be > 0L
    // the stated delta (r15 verdict #3): bounding the lexical arm may
    // cost fused recall, but not more than 2 ground-truth hits per
    // probe on aggregate at fixture scale — a collapse here means the
    // prefix candidates stopped overlapping the exact arm's
    val exactHits = exact.map(_._2).sum
    val prunedHits = pruned.map(_._2).sum
    prunedHits should be >= exactHits - 2L * exact.length
    prunedHits should be > 0L
  }

  test("WAND serve: output identical to the exact serve (registry-level twin of the shared oracle)") {
    val exact = SimilarityQueries.searchBm25Indexed(spark, dir)
      .collect().toSeq
    val wand = SimilarityQueries.searchBm25Wand(spark, dir)
      .collect().toSeq
    wand shouldBe exact
  }

  test("WAND upsert serve: identical to the exact serve over the multi-generation tier") {
    // the exact lifecycle query builds base [0,400) + one arrival
    // generation [400,500) unconditionally; the WAND twin then serves
    // the SAME tier with gens-folded bounds — rows must be identical
    // on the twin's narrower probe window (the first 5 arrivals; the
    // fixture's flat vocabulary makes wide WAND probes pure overhead)
    val exact = SimilarityQueries.searchBm25Upsert(spark, dir)
      .filter(col("probe_id") < 405L).collect().toSeq
    val wand = SimilarityQueries.searchBm25WandUpsert(spark, dir)
      .collect().toSeq
    wand shouldBe exact
  }
}
