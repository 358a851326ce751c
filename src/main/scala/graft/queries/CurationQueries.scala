package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Dedup, Fuzzy, Text}
import graft.functions.BoundedTopK

/** Second wave of training-data curation operators: within-doc repetition
  * signals (Gopher-style), segment-level cross-doc dedup (the CCNet/C4
  * line-dedup shape), n-gram decontamination (the GPT-3 appendix-C
  * shape), a blocked bounded-edit-distance fuzzy join, and exact-k
  * stratified sampling on the engine's own heap aggregate. Every query is
  * DuckDB-oracle-checked; planted fixtures are built in closed form from
  * doc_id so both engines derive them independently. */
object CurationQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", Text.tokens(col("text")))

  private val duckToks = s"regexp_extract_all(lower(text), '${Text.tokenPattern}')"

  // ---------------------------------------------------------------- //
  // 1. Within-document repetition signals (Gopher-style quality)      //
  // ---------------------------------------------------------------- //

  /** Per-doc repetition profile: type-token ratio, most-frequent-token
    * count, most-frequent-bigram count, and the resulting repetitive
    * flag. Narrow map over each document ([[Text.maxRunCount]] — sorted
    * run-length fold, no shuffle); ratios are single IEEE divisions of
    * exact ints, so bit-stable across engines. */
  def repetitionQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        Text.maxRunCount(col("toks")).as("top_token_n"),
        Text.maxRunCount(Text.ngrams(col("toks"))).as("top_bigram_n"))
      .withColumn("ttr",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_distinct") / col("n_tokens"), 6)))
      .withColumn("repetitive",
        (col("top_bigram_n") >= 4 ||
          (col("n_tokens") > 0 && col("top_token_n") / col("n_tokens") > 0.1))
          .cast("int"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- //
  // 2. Segment-level cross-document dedup (CCNet/C4 line dedup)       //
  // ---------------------------------------------------------------- //

  private val SegLen = 10
  private val SegDfCap = 3L

  /** 10-token boilerplate header planted on every doc_id % 3 == 0 doc —
    * the corpus itself has no line structure, so the fixture recreates
    * the navigation-chrome/license-block situation the operator exists
    * for. Closed-form from doc_id: both engines derive it independently. */
  private val SegHeader =
    "shared header line alpha beta gamma delta epsilon zeta eta"

  /** Per-doc segment-dedup stats over the header-planted corpus:
    * [[Dedup.segmentDedupStats]] cuts docs into 10-token segments, drops
    * any segment content seen in ≥ 3 distinct docs. The planted header
    * (~n/3 docs) is dropped everywhere; exact-dup families ≥ 3 lose all
    * their segments; everything else survives. */
  def segmentDedupQ(spark: SparkSession, dir: String): DataFrame = {
    val enriched = when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit(SegHeader + " "), col("text"))).otherwise(col("text"))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokens(enriched).as("toks"))
    Dedup.segmentDedupStats(d, segLen = SegLen, dfCap = SegDfCap)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- //
  // 3. N-gram decontamination (train/test overlap)                    //
  // ---------------------------------------------------------------- //

  private val DeconN = 8

  /** Split: doc_id % 10 == 7 is the eval set, the rest trains. Half the
    * eval docs (doc_id % 20 == 7) are contaminated in closed form by
    * appending tokens 5..12 of train doc (doc_id + 1) — a genuine 8-gram
    * of that train doc, so the overlap join must flag exactly those. */
  private def deconFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val train = d.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      .withColumn("toks", Text.tokens(col("text")))
    val donors = d.select((col("doc_id") - 1).as("doc_id"),
      concat_ws(" ", slice(Text.tokens(col("text")), 5, DeconN)).as("__donated"))
    val test = d.filter(pmod(col("doc_id"), lit(10)) === 7)
      .join(donors, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(20)) === 7 && col("__donated").isNotNull,
          concat_ws(" ", col("text"), col("__donated")))
          .otherwise(col("text")).as("text"))
      .withColumn("toks", Text.tokens(col("text")))
    (train, test)
  }

  /** Per-eval-doc contamination report from [[Dedup.ngramContamination]]:
    * distinct 8-gram count, overlap-with-train count, contaminated flag. */
  def deconQ(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = deconFrames(spark, dir)
    Dedup.ngramContamination(train, test, n = DeconN)
      .withColumn("contaminated", col("contaminated").cast("int"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- //
  // 4. Fuzzy join (bounded edit distance, blocked)                    //
  // ---------------------------------------------------------------- //

  private val FuzzyMaxDist = 3

  /** Near-identical part-name pairs: distinct p_name self-join blocked on
    * the name's last token, edit distance ≤ 3 ([[Fuzzy.fuzzyJoin]] —
    * length-band prefilter + threshold levenshtein inside blocks only). */
  def fuzzyPartsQ(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
    Fuzzy.fuzzyJoin(parts, "p_name", parts, "p_name",
        v => element_at(split(v, " "), -1), FuzzyMaxDist)
      .filter(col("left_val") < col("right_val"))
      .select(col("left_val").as("name_a"), col("right_val").as("name_b"),
        col("dist"))
      .orderBy("name_a", "name_b")
  }

  // ---------------------------------------------------------------- //
  // 5. Exact-k stratified sampling on the heap aggregate              //
  // ---------------------------------------------------------------- //

  private val SampleK = 5

  /** Deterministic exact-k sample per source stratum: k smallest md5
    * hashes of doc_id win, via [[BoundedTopK]] (score = negated hash) —
    * ≤ k rows per stratum cross the shuffle, vs a rank window's full
    * per-stratum sort. The hash is the same portable 48-bit md5 prefix
    * as `sample_hash` (exact in a double, so heap order ≡ the oracle's
    * BIGINT order). */
  def sampleStratifiedQ(spark: SparkSession, dir: String): DataFrame = {
    val hh = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long")
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), (-hh.cast("double")).as("__score"))
      .groupBy("source")
      .agg(BoundedTopK.topk(col("__score"), col("doc_id"), SampleK).as("__nn"))
      .select(col("source"), explode(col("__nn")).as("__e"))
      .select(col("source"), col("__e.id").as("doc_id"))
      .orderBy("source", "doc_id")
  }

  // ---------------------------------------------------------------- //
  // 6. Corpus mixing: weighted sampling + per-source token budgets    //
  // ---------------------------------------------------------------- //

  /** Source-WEIGHTED deterministic sampling — the data-mixing step that
    * up/down-weights sources in the final training mix. Per-source keep
    * rate derived in closed form from the source name (20/40/60/80 %),
    * keep decision from the same portable md5-mod-100 hash as
    * `sample_hash`. Pure narrow map: the weights travel in the
    * expression, no join, no shuffle before the output sort. */
  def sampleWeightedQ(spark: SparkSession, dir: String): DataFrame = {
    val hh = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100))
    val w = (regexp_extract(col("source"), "([0-9]+)", 1).cast("int") % 4) * 20 + 20
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        w.as("keep_pct"), (hh < w).cast("int").as("kept"))
      .orderBy("doc_id")
  }

  private val MixTempScale = 1e6

  /** Temperature-based mixing weights (the multilingual/multi-source
    * sampling-rate primitive: p_s ∝ n_s^(1/T), here T=2 i.e. α=0.5):
    * per-source token counts → raw share, temperature share, and the
    * boost factor low-resource sources gain. α is FIXED at 0.5 because
    * sqrt is IEEE-correctly-rounded in every engine while pow(x, 0.7)
    * may differ in the last ulp — and the scaled-integer quantization
    * (floor(sqrt·1e6), exact BIGINT sums) makes the cross-source
    * normalizer bit-deterministic regardless of aggregation order, the
    * same integer-ranking trick as `text_tfidf`. Distributed shape: one
    * per-source aggregate, then a 1-row broadcast for the normalizers —
    * no collect, no second wide shuffle; at 100 TB the per-source frame
    * is |sources| rows, constant. */
  def mixTemperatureQ(spark: SparkSession, dir: String): DataFrame = {
    val counts = docs(spark, dir)
      .groupBy("source")
      .agg(sum(size(col("toks")).cast("long")).as("n_tokens"))
      .withColumn("__st",
        floor(sqrt(col("n_tokens").cast("double")) * MixTempScale).cast("long"))
    val totals = counts.agg(
      sum(col("n_tokens")).as("__tot"), sum(col("__st")).as("__stot"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_tokens"),
        round(col("n_tokens") / col("__tot"), 6).as("share_raw"),
        round(col("__st") / col("__stot"), 6).as("share_temp"),
        round((col("__st") / col("__stot")) / (col("n_tokens") / col("__tot")), 6)
          .as("boost"))
      .orderBy("source")
  }

  private val ShuffleShards = 8

  /** Deterministic global shuffle for training order, computed WITHOUT a
    * global sort: every doc hashes to one of N shards (seeded portable
    * md5), position-in-shard is a per-shard rank on the hash — exactly
    * the (shard file, in-shard order) layout a training data loader
    * consumes. Distributed shape: one hash shuffle on the shard key and
    * per-shard window sorts that parallelize across shards; at 100 TB,
    * N scales with the corpus so no shard outgrows an executor, and no
    * stage ever sees a global ordering. Reseeding the hash string is a
    * full reshuffle (epoch re-randomization) with the same plan. */
  def shuffleShardsQ(spark: SparkSession, dir: String): DataFrame = {
    val hh = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(":graft42"))), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("__h", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), hh.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(ShuffleShards)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  private val TrimBudget = 10000L

  /** Per-source token-BUDGET trim: in deterministic doc_id order, each
    * source keeps whole documents while its cumulative token count stays
    * within budget — the "cap every source at N tokens" mixing primitive.
    * Same distributed shape as `pack_bins`: one window (partition-sort)
    * per source stratum, strata parallelize, no second shuffle. */
  def budgetTrimQ(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("kept", (col("cum") <= TrimBudget).cast("int"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- //
  // Oracles                                                           //
  // ---------------------------------------------------------------- //

  /** DuckDB bigram list over a token-list expression (1-based). */
  private def duckBigrams(t: String): String =
    s"list_transform(range(1, len($t)), i -> $t[i] || ' ' || $t[i+1])"

  /** DuckDB max within-list element frequency (0 for empty lists). */
  private def duckMaxFreq(t: String): String =
    s"coalesce(list_max(list_transform(list_distinct($t), x -> len(list_filter($t, y -> y = x)))), 0)"

  private def duckNgrams(t: String, n: Int): String = {
    val cat = (0 until n).map(k => s"$t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($t) - ${n - 2}), i -> $cat)"
  }

  /** CORPUS-SHAPE DRIFT between two snapshots — the documents-table
    * twin of `emb_drift`, on a PURELY INTEGER scalar (n_chars) so every
    * decision is exact in both engines with no float contract at all:
    * fixed-width length bins, fixed id windows [0,250) vs [250,500),
    * per-bin counts + exact-decimal TV/chi² totals. The operator a
    * crawl pipeline runs to catch a scraper regression (truncated
    * pages, boilerplate floods) before it poisons a training mix. */
  private val CorpusDriftBins = 10
  private val CorpusDriftWidth = 200L

  private def corpusDriftBin: org.apache.spark.sql.Column =
    least(floor(col("n_chars") / lit(CorpusDriftWidth)),
      lit((CorpusDriftBins - 1).toLong)).cast("int")

  def corpusDriftQ(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Drift.histogramDrift(
      Tables.documents(spark, dir).filter(col("doc_id") < 500L)
        .select(corpusDriftBin.as("bin"), (col("doc_id") < 250L).as("__ref")),
      CorpusDriftBins)

  /** STREAMING drift monitor: the current window's documents arrive as
    * TWO real micro-batches; each batch's `foreachBatch` appends its
    * per-bin counts to a run-scoped state table (what a deployed
    * monitor keeps between triggers — counting is associative, so
    * per-batch accumulation is exact, never approximate). The final
    * report folds the accumulated counts against the fixed reference
    * window and must be IDENTICAL to the one-shot [[corpusDriftQ]] —
    * the SHARED oracle hash-proves micro-batching cannot change a
    * drift verdict. Per-batch state is ≤ nBins rows; nothing on the
    * streaming path grows with the corpus. */
  def streamDriftReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
    val arrivals = d
      .filter(col("doc_id") >= 250L && col("doc_id") < 500L)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .collect()
      .sortBy(_._1)
    SimilarityQueries.requireBoundedReplay(arrivals.length, 1000,
      "streamDriftReplay arrivals")
    require(arrivals.nonEmpty,
      "streamDriftReplay: empty arrival window — the fixture's id space " +
        "changed shape; re-derive the replay window")
    val state = java.nio.file.Files
      .createTempDirectory("graft_drift_state_").toString
    // the state dir is run-scoped: histogramDriftCounts collects its
    // ≤ nBins input rows and returns a locally-backed frame, so once it
    // has run nothing references the parquet — delete in finally or
    // every bench rep leaks a dir into /tmp (the graft_ann_serve_ lesson)
    try {
      StreamReplayQueries.replayChunks(spark,
        StreamReplayQueries.midSplit(arrivals.toSeq)(_._1),
        Seq("doc_id", "n_chars")) { batch =>
        batch.select(corpusDriftBin.as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n"))
          .write.mode("append").parquet(state)
      }
      val cur = spark.read.parquet(state)
        .groupBy("bin").agg(sum("n").as("n_cur"))
      val ref = d.filter(col("doc_id") < 250L)
        .select(corpusDriftBin.as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_ref"))
      graft.ext.Drift.histogramDriftCounts(
        ref.join(cur, Seq("bin"), "full_outer")
          .select(col("bin"),
            coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_cur"), lit(0L)).as("n_cur")),
        CorpusDriftBins)
    } finally {
      val root = new org.apache.hadoop.fs.Path(state)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
      ()
    }
  }

  /** SNAPSHOT DIFF — the ingestion report between two crawls of the
    * same key space: which documents were added, removed, changed
    * (fingerprint moved), or unchanged. Fixture geometry in closed form
    * from doc_id: the old snapshot is keys [0, 250) (doc k), the new
    * snapshot keys [10, 260) re-pulled as doc k+240 — so keys [0, 10)
    * read `removed`, [250, 260) `added`, and the shared middle is
    * changed/unchanged by content fingerprint. Scale shape: each
    * snapshot reduces to a (key, fixed-width md5) table in one narrow
    * map — text never shuffles — and the diff is ONE co-partitioned
    * full-outer join on the stable key. */
  def snapshotDiffQ(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val fp = Text.fingerprint(Text.tokens(col("text")))
    val prev = d.filter(col("doc_id") < 250L)
      .select(col("doc_id").as("key"), fp.as("fp_old"))
    val next = d.filter(col("doc_id") >= 250L && col("doc_id") < 500L)
      .select((col("doc_id") - 240L).as("key"), fp.as("fp_new"))
    prev.join(next, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("fp_new"), col("fp_old")).as("fp"))
      .orderBy("key")
  }

  /** Shared by `corpus_drift` (one-shot) and `stream_drift_replay`
    * (two-micro-batch accumulation) — the two must hash-match. */
  private lazy val corpusDriftOracle: String = s"""
      WITH c AS (
        SELECT CAST(least(floor(n_chars / $CorpusDriftWidth),
                 ${CorpusDriftBins - 1}) AS INT) AS bin,
               sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS n_cur
        FROM documents WHERE doc_id < 500 GROUP BY 1),
      f AS (
        SELECT r.range AS bin,
               CAST(coalesce(c.n_ref, 0) AS BIGINT) AS n_ref,
               CAST(coalesce(c.n_cur, 0) AS BIGINT) AS n_cur
        FROM range(0, $CorpusDriftBins) r LEFT JOIN c ON c.bin = r.range),
      t AS (
        SELECT bin, n_ref, n_cur,
               n_ref::DOUBLE / (SELECT sum(n_ref) FROM f) AS pr,
               n_cur::DOUBLE / (SELECT sum(n_cur) FROM f) AS pc
        FROM f),
      terms AS (
        SELECT bin, n_ref, n_cur,
               CAST(abs(pc - pr) AS DECIMAL(28,12)) AS tv_term,
               CASE WHEN n_ref = 0 THEN CAST(0 AS DECIMAL(28,12))
                    ELSE CAST((pc - pr) * (pc - pr) / pr AS DECIMAL(28,12))
               END AS chi2_term
        FROM t)
      SELECT CAST(bin AS BIGINT) AS bin, n_ref, n_cur,
             CAST(tv_term AS DOUBLE) AS tv_term,
             CAST(chi2_term AS DOUBLE) AS chi2_term,
             CAST(sum(tv_term) OVER () AS DOUBLE) AS tv,
             CAST(sum(chi2_term) OVER () AS DOUBLE) AS chi2
      FROM terms ORDER BY bin"""

  val queries: Seq[GQuery] = Seq(
    GQuery("corpus_snapshot_diff", snapshotDiffQ, Some(s"""
      WITH f AS (SELECT doc_id, md5(array_to_string($duckToks, ' ')) AS fp
                 FROM documents),
      o AS (SELECT doc_id AS key, fp AS fp_old FROM f WHERE doc_id < 250),
      n AS (SELECT doc_id - 240 AS key, fp AS fp_new FROM f
            WHERE doc_id >= 250 AND doc_id < 500)
      SELECT coalesce(o.key, n.key) AS key,
             CASE WHEN o.key IS NULL THEN 'added'
                  WHEN n.key IS NULL THEN 'removed'
                  WHEN fp_old = fp_new THEN 'unchanged'
                  ELSE 'changed' END AS status,
             coalesce(fp_new, fp_old) AS fp
      FROM o FULL OUTER JOIN n ON o.key = n.key
      ORDER BY key""")),
    GQuery("corpus_drift", corpusDriftQ, Some(corpusDriftOracle)),
    GQuery("stream_drift_replay", streamDriftReplay, Some(corpusDriftOracle)),
    GQuery("text_repetition", repetitionQ, Some(s"""
      WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
               CAST(${duckMaxFreq("tk")} AS BIGINT) AS top_token_n,
               CAST(${duckMaxFreq(duckBigrams("tk"))} AS BIGINT) AS top_bigram_n
        FROM t)
      SELECT doc_id, n_tokens, n_distinct, top_token_n, top_bigram_n,
             CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) END AS ttr,
             CAST(CASE WHEN top_bigram_n >= 4 OR
                            (n_tokens > 0 AND CAST(top_token_n AS DOUBLE) / n_tokens > 0.1)
                       THEN 1 ELSE 0 END AS INT) AS repetitive
      FROM m ORDER BY doc_id""")),
    GQuery("corpus_segment_dedup", segmentDedupQ, Some(s"""
      WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(CASE WHEN doc_id % 3 = 0
                 THEN '$SegHeader ' || text ELSE text END),
                 '${Text.tokenPattern}') AS tk
        FROM documents),
      s AS (
        SELECT doc_id,
               list_slice(tk, i * $SegLen + 1, i * $SegLen + $SegLen) AS seg
        FROM t, UNNEST(range(CAST(ceil(len(tk) / $SegLen.0) AS INT))) AS u(i)
        WHERE len(tk) > 0),
      h AS (
        SELECT doc_id, md5(array_to_string(seg, ' ')) AS key,
               len(seg) AS seg_len
        FROM s),
      d AS (SELECT key, count(DISTINCT doc_id) AS df FROM h GROUP BY 1),
      p AS (
        SELECT h.doc_id,
               count(*) AS n_segs,
               sum(CASE WHEN d.df >= $SegDfCap THEN 1 ELSE 0 END) AS n_dropped,
               sum(CASE WHEN d.df < $SegDfCap THEN h.seg_len ELSE 0 END) AS tokens_kept
        FROM h JOIN d USING (key) GROUP BY 1)
      SELECT doc.doc_id,
             CAST(coalesce(p.n_segs, 0) AS BIGINT) AS n_segs,
             CAST(coalesce(p.n_dropped, 0) AS BIGINT) AS n_dropped,
             CAST(coalesce(p.tokens_kept, 0) AS BIGINT) AS tokens_kept
      FROM documents doc LEFT JOIN p ON p.doc_id = doc.doc_id
      ORDER BY doc.doc_id""")),
    GQuery("decon_ngram_overlap", deconQ, Some {
      val toks = s"regexp_extract_all(lower(text), '${Text.tokenPattern}')"
      s"""
      WITH donors AS (
        SELECT doc_id - 1 AS doc_id,
               array_to_string(list_slice($toks, 5, ${5 + DeconN - 1}), ' ') AS donated
        FROM documents),
      test AS (
        SELECT b.doc_id,
               CASE WHEN b.doc_id % 20 = 7 AND d.donated IS NOT NULL
                    THEN b.text || ' ' || d.donated ELSE b.text END AS text
        FROM documents b LEFT JOIN donors d USING (doc_id)
        WHERE b.doc_id % 10 = 7),
      traing AS (
        SELECT DISTINCT md5(g) AS key
        FROM (SELECT unnest(${duckNgrams("tk", DeconN)}) AS g
              FROM (SELECT $toks AS tk FROM documents WHERE doc_id % 10 <> 7))),
      testg AS (
        SELECT DISTINCT doc_id, md5(g) AS key
        FROM (SELECT doc_id, unnest(${duckNgrams("tk", DeconN)}) AS g
              FROM (SELECT doc_id, $toks AS tk FROM test))),
      agg AS (
        SELECT tg.doc_id,
               count(*) AS n_ngrams,
               sum(CASE WHEN tr.key IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
        FROM testg tg LEFT JOIN traing tr USING (key)
        GROUP BY 1)
      SELECT t.doc_id,
             CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
             CAST(coalesce(a.n_overlap, 0) AS BIGINT) AS n_overlap,
             CAST(CASE WHEN coalesce(a.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS INT)
               AS contaminated
      FROM test t LEFT JOIN agg a USING (doc_id)
      ORDER BY t.doc_id"""
    }),
    GQuery("fuzzy_join_parts", fuzzyPartsQ, Some(s"""
      WITH n AS (SELECT DISTINCT p_name FROM part)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      FROM n a JOIN n b
        ON (string_split(a.p_name, ' '))[-1] = (string_split(b.p_name, ' '))[-1]
       AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
      ORDER BY name_a, name_b""")),
    GQuery("sample_weighted", sampleWeightedQ, Some(s"""
      SELECT doc_id, source,
             CAST((regexp_extract(source, '([0-9]+)', 1)::INT % 4) * 20 + 20 AS INT)
               AS keep_pct,
             CAST(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
                            < (regexp_extract(source, '([0-9]+)', 1)::INT % 4) * 20 + 20
                       THEN 1 ELSE 0 END AS INT) AS kept
      FROM documents ORDER BY doc_id""")),
    GQuery("corpus_budget_trim", budgetTrimQ, Some(s"""
      WITH t AS (
        SELECT doc_id, source, CAST(len($duckToks) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum,
             CAST(CASE WHEN cum <= $TrimBudget THEN 1 ELSE 0 END AS INT) AS kept
      FROM c ORDER BY doc_id""")),
    GQuery("corpus_mix_temperature", mixTemperatureQ, Some(s"""
      WITH t AS (SELECT source, CAST(len($duckToks) AS BIGINT) AS n FROM documents),
      c AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
      s AS (SELECT source, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS st
            FROM c),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
                     CAST(sum(st) AS BIGINT) AS stot FROM s)
      SELECT source, n_tokens,
             round(CAST(n_tokens AS DOUBLE) / tot, 6) AS share_raw,
             round(CAST(st AS DOUBLE) / stot, 6) AS share_temp,
             round((CAST(st AS DOUBLE) / stot) / (CAST(n_tokens AS DOUBLE) / tot), 6)
               AS boost
      FROM s, tot ORDER BY source""")),
    GQuery("corpus_shuffle_shards", shuffleShardsQ, Some(s"""
      WITH h AS (
        SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR || ':graft42'), 1, 15))::BIGINT AS hh
        FROM documents)
      SELECT doc_id,
             CAST(hh % $ShuffleShards AS INT) AS shard,
             CAST(row_number() OVER (PARTITION BY hh % $ShuffleShards
               ORDER BY hh, doc_id) AS BIGINT) AS pos
      FROM h ORDER BY doc_id""")),
    GQuery("sample_stratified", sampleStratifiedQ, Some(s"""
      WITH h AS (
        SELECT source, doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS hh
        FROM documents),
      r AS (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
        FROM h)
      SELECT source, doc_id FROM r WHERE rk <= $SampleK
      ORDER BY source, doc_id"""))
  )
}
