package graft.queries

import graft.SparkSpec

/** Gates for `stream_ann_upsert_replay` — the streaming half of the IVF
  * maintenance lifecycle. The DuckDB oracle pins the served CONTENT; what
  * it cannot see is the execution shape these tests pin: that the replay
  * really ran TWO micro-batches through the live `foreachBatch` sink and
  * left two delta generations behind, and that streaming arrival is
  * answer-equivalent to the batch two-upsert lifecycle on the same
  * split (at this fixture the 600-vector stream cap covers the whole
  * 500-vector corpus, so the served sets coincide by construction).
  */
class StreamAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("replay-harness collect guard trips on a fixture-shape blowup") {
    // round-9 verdict #4: the MemoryStream-feeding collect is bounded by
    // an id-window assumption the fixture could silently break; the
    // guard must fail loudly, with the re-derivation hint, not OOM later
    SimilarityQueries.requireBoundedReplay(800, 800, "ok") // at cap: fine
    val e = intercept[IllegalArgumentException] {
      SimilarityQueries.requireBoundedReplay(801, 800, "streamAnnUpsertReplay arrivals")
    }
    e.getMessage should include("re-derive the replay window")
  }

  test("streaming replay lands two delta generations and serves both") {
    val probe = rowsOf(SimilarityQueries.streamAnnUpsertReplay(spark, dir))
    probe should not be empty

    val root = SimilarityQueries.streamIndexPathForTest(dir)
    val gens = new java.io.File(s"$root/lists_delta")
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .filter(f => new java.io.File(f, "_GRAFT_DELTA_COMPLETE").exists())
      .map(_.getName)
      .sorted
    gens.toSeq shouldBe Seq("gen=1", "gen=2")
  }

  test("streaming arrival ≡ batch two-upsert lifecycle on the same split") {
    val streamed = rowsOf(SimilarityQueries.streamAnnUpsertReplay(spark, dir))
    val batch = rowsOf(SimilarityQueries.knnIvfUpsertedMultiQ(spark, dir))
    streamed shouldBe batch
  }

  test("serving replay: micro-batched probes ≡ one-shot batch search over the same window") {
    import org.apache.spark.sql.functions.col
    val streamed = rowsOf(SimilarityQueries.streamAnnQueryReplay(spark, dir))
    streamed should not be empty
    // every probe in the window answered exactly once with k rows
    streamed.map(_.getLong(0)).distinct.sorted shouldBe
      (0L until SimilarityQueries.StreamQueryCap)
    // the index is static, so chunked arrival must be invisible: the
    // union of per-batch answers equals the one-shot indexed search
    val path = {
      val e = graft.core.Tables.embeddings(spark, dir)
      val probes = e.filter(col("vec_id") < SimilarityQueries.StreamQueryCap)
      val batch = graft.ext.Similarity.knnIvfIndexed(spark,
        SimilarityQueries.ivfIndexPathForTest(dir), probes, 10, nprobe = 2)
      rowsOf(batch
        .select(col("probe_id"), col("neighbor_id"),
          org.apache.spark.sql.functions.round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id")))
    }
    streamed shouldBe path
  }
}
