package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Text

/** Text-analysis queries over `documents` (north-star extension set).
  * The DuckDB oracles re-express the same tokenizer regex verbatim, so
  * both engines tokenize identically. */
object TextQueries {

  /** Shared projection: documents + token array. */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", Text.tokens(col("text")))

  /** Oracle-side tokenizer, kept in lockstep with [[Text.tokenPattern]]. */
  private val duckToks = s"regexp_extract_all(lower(text), '${Text.tokenPattern}')"

  /** Top-20 token frequencies (explode → count; the classic word-count). */
  def tokensTop(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  /** Top-20 bigram frequencies. */
  def bigramsTop(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(Text.ngrams(col("toks"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg"))
      .limit(20)

  /** Per-language corpus stats: docs, chars, tokens, mean tokens/doc. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(size(col("toks")).cast("long")).as("sum_tokens"),
        (sum(size(col("toks")).cast("long")) / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  /** Per-doc quality scoring: token counts (word + BPE-ish), stopword
    * ratio, bucket label. Per-doc output on purpose — no cross-row double
    * summation, so every value is bit-stable (ints + one IEEE division). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(Text.bpeTokens(col("text"))).cast("long").as("n_bpe"),
        Text.stopwordCount(col("toks")).cast("long").as("n_stop"))
      .withColumn("stop_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_stop") / col("n_tokens")))
      .withColumn("quality",
        when(col("n_tokens") >= 40 && col("stop_ratio") < 0.3, "good")
          .when(col("n_tokens") >= 10, "fair")
          .otherwise("poor"))
      .orderBy("doc_id")

  /** Per-doc fingerprint: md5 of the normalized token stream. */
  def fingerprintQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), Text.fingerprint(col("toks")).as("fp"))
      .orderBy("doc_id")

  /** Unicode NFC normalization ([[graft.functions.NormalizeNFC]] — the
    * codegen'd JDK-Normalizer expression): the canonical-composition
    * pass that must precede fingerprinting so the same page crawled
    * with precomposed é and with e + combining U+0301 dedups together.
    * The ASCII corpus is deterministically dirtied from doc_id with
    * decomposed sequences (combining acute / diaeresis); NFC has exactly
    * one correct output per the Unicode spec, so DuckDB's
    * `nfc_normalize` reproduces every byte and the md5 fingerprints
    * hash-match. Pure narrow map — no shuffle before the output sort. */
  def normalizeUnicodeQ(spark: SparkSession, dir: String): DataFrame = {
    val planted = when(pmod(col("doc_id"), lit(3)) === 1,
        concat(lit("Cafe\u0301 "), col("text")))
      .when(pmod(col("doc_id"), lit(3)) === 2,
        concat(lit("Zu\u0308rich "), col("text")))
      .otherwise(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), planted.as("__t"))
      .select(col("doc_id"), col("__t"),
        graft.functions.NormalizeNFC.nfc(col("__t")).as("__n"))
      .select(col("doc_id"),
        (col("__n") =!= col("__t")).cast("int").as("changed"),
        md5(col("__n").cast("binary")).as("fp"))
      .orderBy("doc_id")
  }

  /** Per-LANGUAGE quality-percentile cut (the CCNet/Gopher-style
    * distribution-relative filter): each doc's stopword-ratio score is
    * compared against its own language's p25, dropping the bottom
    * quartile PER LANGUAGE instead of one global threshold that would
    * gut low-stopword languages. The cut uses the exact interpolated
    * percentile (`percentile` ≡ DuckDB `quantile_cont`, the
    * `value_quantiles` idiom) so the whole decision is oracle-checkable;
    * at 100 TB the exact per-group multiset buffer is the scale
    * bottleneck and `approx_percentile` is the drop-in (the
    * `approx_value_quantiles` twin pattern). Both score and cut are
    * 6-dp-rounded before the boundary compare, the same determinism
    * rationale as the near-dup thresholds. The |langs|-row cut table
    * broadcasts — no second wide shuffle. */
  def qualityFilterQ(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        Text.stopwordCount(col("toks")).cast("long").as("n_stop"))
      .withColumn("score",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_stop") / col("n_tokens")))
    val cuts = scored.groupBy("lang")
      .agg(round(expr("percentile(score, 0.25)"), 6).as("cut"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"),
        round(col("score"), 6).as("score"), col("cut"),
        (round(col("score"), 6) >= col("cut")).cast("int").as("kept"))
      .orderBy("doc_id")
  }

  private val BpeMerges = 8

  /** BPE merge training ([[Text.bpeTrain]] — the tokenizer-learning op:
    * first [[BpeMerges]] merges from the corpus word-frequency table,
    * freq-weighted pair counts, lexicographic tie-breaks). The oracle
    * unrolls every round (the `knnGraphCtes` discipline): pair
    * extraction, argmax, and the space-wrapped `replace` application
    * replay identically in DuckDB, so the learned merge table is a full
    * hash gate. */
  def bpeTrainQ(spark: SparkSession, dir: String): DataFrame =
    Text.bpeTrain(Tables.documents(spark, dir), merges = BpeMerges)
      .orderBy("merge_rank")

  /** BPE applied ([[Text.bpeSegments]]): the corpus's top-20 subword
    * units after the learned merges — the segmentation a trained
    * tokenizer produces, derived from training's final vocab state so
    * the whole trajectory stays one hash gate. */
  def bpeSegmentsQ(spark: SparkSession, dir: String): DataFrame =
    Text.bpeSegments(Tables.documents(spark, dir), merges = BpeMerges)

  /** Model root for the PERSISTED tokenizer, keyed by corpus file
    * identity ([[TierRoots]]). */
  private def bpeModelRoot(dir: String): String =
    TierRoots.of("graft_bpe_model", dir, "documents")

  /** Segmentation from the FROZEN persisted tokenizer
    * ([[Text.bpeSegmentsIndexed]]): trains + persists the merge table
    * once per corpus generation (marker + fingerprint gated), then
    * apply is ONE narrow projection — the production tokenize step.
    * Must serve IDENTICALLY to [[bpeSegmentsQ]]: the shared oracle
    * hash-proves the frozen model replays training's trajectory. */
  def bpeSegmentsIndexedQ(spark: SparkSession, dir: String): DataFrame = {
    val path = bpeModelRoot(dir)
    if (!Text.bpeModelServes(spark, path, BpeMerges))
      Text.bpeSaveModel(Tables.documents(spark, dir), path, merges = BpeMerges)
    Text.bpeSegmentsIndexed(spark, path, Tables.documents(spark, dir),
      merges = BpeMerges)
  }

  /** DuckDB unroll of the training trajectory (w0 → w[BpeMerges]) —
    * the shared CTE prefix of every BPE oracle. */
  private lazy val bpeTrainCtes: String = {
    def round(wIn: String, pr: String, b: String, wOut: String) = s"""
      $pr AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
          SELECT freq, unnest(list_transform(range(1, len(l)),
                   i -> l[i] || ' ' || l[i + 1])) AS pair
          FROM (SELECT freq, string_split(trim(syms), ' ') AS l FROM $wIn))
        GROUP BY 1),
      $b AS (SELECT pair, n FROM $pr ORDER BY n DESC, pair LIMIT 1),
      $wOut AS (SELECT word, freq,
                  replace(syms, ' ' || b.pair || ' ',
                          ' ' || replace(b.pair, ' ', '') || ' ') AS syms
                FROM $wIn, $b b)"""
    val rounds = (1 to BpeMerges)
      .map(r => round(s"w${r - 1}", s"pr$r", s"b$r", s"w$r")).mkString(",")
    s"""
      WITH w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
                         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g')
                             || '</w> ' AS syms
                  FROM (SELECT unnest($duckToks) AS word FROM documents)
                  GROUP BY word),
      $rounds"""
  }

  /** DuckDB unroll of train→apply, shared by `text_bpe_segments` (in-
    * query trainer) and `text_bpe_frozen` (persisted model) — the two
    * must hash-match each other through it. */
  private lazy val bpeSegmentsOracle: String = s"""
      $bpeTrainCtes
      SELECT unit, CAST(sum(freq) AS BIGINT) AS n_occurrences,
             CAST(count(*) AS BIGINT) AS n_types
      FROM (SELECT freq, unnest(string_split(trim(syms), ' ')) AS unit
            FROM w$BpeMerges)
      GROUP BY unit ORDER BY n_occurrences DESC, unit LIMIT 20"""

  /** Per-language fertility oracle: the trained vocab's per-word unit
    * counts joined against per-(lang, word) frequencies. */
  private lazy val bpeFertilityOracle: String = s"""
      $bpeTrainCtes,
      u AS (SELECT word,
                   CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS nu
            FROM w$BpeMerges),
      lw AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
             FROM (SELECT lang, unnest($duckToks) AS word FROM documents)
             GROUP BY 1, 2)
      SELECT lang, CAST(sum(freq) AS BIGINT) AS n_words,
             CAST(sum(freq * nu) AS BIGINT) AS n_units,
             round(CAST(sum(freq * nu) AS DOUBLE) / sum(freq), 6) AS fertility
      FROM lw JOIN u USING (word)
      GROUP BY lang ORDER BY lang"""

  /** Per-language tokenizer fertility from the frozen persisted model
    * ([[Text.bpeFertility]]) — units emitted per word by language, the
    * report that exposes which languages the learned merges
    * under-serve. */
  def bpeFertilityQ(spark: SparkSession, dir: String): DataFrame = {
    val path = bpeModelRoot(dir)
    if (!Text.bpeModelServes(spark, path, BpeMerges))
      Text.bpeSaveModel(Tables.documents(spark, dir), path, merges = BpeMerges)
    Text.bpeFertility(spark, path, Tables.documents(spark, dir),
      merges = BpeMerges)
  }

  /** Trained quality classifier ([[Text.nbQualityClassifier]] — the
    * fastText-style bootstrap: heuristic seed labels → Laplace-smoothed
    * multinomial NB → corpus-scale scoring; see the Scaladoc for the
    * DECIMAL weight discipline that keeps the per-doc score sums
    * order-independent and oracle-exact). On the near-uniform synthetic
    * corpus label/pred agreement is necessarily weak (the tokens carry
    * little class signal — the LSH-recall caveat's analogue); the
    * planted-vocabulary spec proves real separation. */
  def qualityClassifierQ(spark: SparkSession, dir: String): DataFrame =
    Text.nbQualityClassifier(Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** Bigram-LM perplexity per doc ([[Text.lmScore]]) — the fluency
    * quality signal; model stats from one bigram aggregation pass,
    * scoring by vocabulary join, decimal-exact per-doc sums. */
  def lmScoreQ(spark: SparkSession, dir: String): DataFrame =
    Text.lmScore(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Trigram Kneser-Ney perplexity per doc ([[Text.lmScoreKn]]) — the
    * CCNet-style fluency filter one honest step up from the add-k
    * bigram floor; absolute discounting + continuation-count backoff,
    * every transcendental a DetMath chain. */
  def lmScoreKnQ(spark: SparkSession, dir: String): DataFrame =
    Text.lmScoreKn(Tables.documents(spark, dir)).orderBy("doc_id")

  /** Language-ID heuristic (stopword-profile argmax; ties → first profile
    * in order, zero hits → "und"). The corpus labels are synthetic so
    * accuracy is judged by the unit test on real per-language sentences —
    * but the heuristic itself is pure list algebra, so the oracle
    * re-expresses the exact argmax in DuckDB and hash-checks the decision
    * on every document. */
  def langIdQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), Text.langId(col("toks")).as("lang_pred"))
      .orderBy("doc_id")

  /** The north-star composition: one pass of a training-data cleaning
    * pipeline — quality-filter (≥10 tokens) → exact dedup (min doc_id per
    * fingerprint) → per-language survivor stats. Shows the text/dedup
    * operators composing into the corpus-prep job this engine exists for;
    * fully SQL-expressible, so the whole chain is oracle-checked. */
  def corpusCleanStats(spark: SparkSession, dir: String): DataFrame = {
    val survivors = docs(spark, dir)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") >= 10)
      .withColumn("fp", Text.fingerprint(col("toks")))
      .withColumn("keep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id"))
    survivors
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("lang")
  }

  private val stopList = Text.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  /** DuckDB twin of [[Text.langId]] as (hit-count select list, CASE expr)
    * — shared by `text_lang_id` and the curation funnel's lang stage. */
  private def duckLangId: (String, String) = {
    val hitExprs = Text.langProfiles.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_filter($duckToks, x -> list_contains($lst, x)))"
    }
    val cols = hitExprs.map { case (l, e) => s"$e AS h_$l" }.mkString(",\n               ")
    val best = hitExprs.map { case (l, _) => s"h_$l" }.mkString("greatest(", ", ", ")")
    val cases = hitExprs.map { case (l, _) =>
      s"WHEN h_$l = $best AND h_$l > 0 THEN '$l'"
    }.mkString("\n                  ")
    (cols, s"CASE $cases\n                  ELSE 'und' END")
  }

  /** Token-length histogram over fixed power-of-two-ish buckets — the
    * length-distribution profile a training-data pipeline reads before
    * picking sequence lengths and packing strategy. Explicit CASE
    * boundaries instead of `floor(log2(n))`: integer compares cannot
    * drift between engines, a double log at a bucket boundary can. */
  def tokenHist(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(size(col("toks")).cast("long").as("n"))
      .withColumn("bucket",
        when(col("n") === 0, "0")
          .when(col("n") < 16, "a_1_15")
          .when(col("n") < 32, "b_16_31")
          .when(col("n") < 64, "c_32_63")
          .when(col("n") < 128, "d_64_127")
          .otherwise("e_128_plus"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("sum_tokens"),
        min(col("n")).as("min_tokens"),
        max(col("n")).as("max_tokens"))
      .orderBy("bucket")

  /** Corpus TF-IDF table for the 20 highest-document-frequency tokens:
    * per token, document frequency, total term frequency, and
    * idf = ln(N/df). Ranking and ties stay on EXACT integers (df, token)
    * — the doubles are output-only and rounded to 6 dp, so a last-ulp
    * difference between the engines' ln implementations cannot reorder
    * rows, only (at ~1e-16 odds) flip a rounded digit. One explode +
    * one (token) shuffle with map-side partial aggregation — the plain
    * word-count shape, scale-safe. */
  def tfidfQ(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val n = d.count() // corpus size: one cheap parquet-metadata count
    // idf's ln is deterministic DetMath (round-14 libm closure): n/df
    // ≥ 1 is one IEEE division of identical values in both engines;
    // the engine evaluates the native expression twin of the chain the
    // oracle runs (bit-identical — DetMathSpec), so the 6-dp idf is
    // bit-exact across engines — the integer (df DESC, token) ranking
    // already made ORDER ulp-proof, now the VALUE is too
    d.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("cnt")).as("tf"))
      .withColumn("__x", lit(n.toDouble) / col("df"))
      .withColumn("__idf", graft.functions.DetMathExpr.detLn(col("__x")))
      .select(col("token"), col("df"), col("tf"),
        round(col("__idf"), 6).as("idf"))
      .orderBy(col("df").desc, col("token"))
      .limit(20)
  }

  private val PackBudget = 512L

  /** Sequence packing: per-source contiguous fill into 512-token bins
    * ([[Text.packBins]]), reported as per-bin stats. The oracle
    * reproduces the identical window cumsum + integer division, so the
    * hash proves every document's bin assignment. */
  def packBinsQ(spark: SparkSession, dir: String): DataFrame =
    Text.packBins(
        docs(spark, dir)
          .select(col("source"), col("doc_id"), size(col("toks")).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", PackBudget)
      .groupBy("source", "bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("source", "bin_id")

  /** The full curation FUNNEL, per document: language-ID gate → quality
    * gate (≥10 tokens) → exact dedup (min-id survivor per fingerprint,
    * decided among gate survivors only) → deterministic 50% hash sample.
    * One row per doc with the stage that dropped it (or `kept`), so the
    * oracle hash proves every per-document routing decision, not just
    * stage counts. Plan shape at 100 TB: one linear scan computing all
    * per-doc columns, then a single shuffle on the fixed-width
    * fingerprint for the dedup window — the lang/quality/sample stages
    * add no shuffle at all. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val keepWindow = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val h = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100))
    docs(spark, dir)
      .select(
        col("doc_id"),
        Text.langId(col("toks")).as("lang_pred"),
        size(col("toks")).cast("long").as("n_tokens"),
        Text.fingerprint(col("toks")).as("fp"),
        h.as("hh"))
      .withColumn("qualified", col("lang_pred") =!= "und" && col("n_tokens") >= 10)
      .withColumn("keep_id",
        min(when(col("qualified"), col("doc_id"))).over(keepWindow))
      .select(
        col("doc_id"),
        when(col("lang_pred") === "und", "drop_lang")
          .when(col("n_tokens") < 10, "drop_quality")
          .when(col("doc_id") =!= col("keep_id"), "drop_dup")
          .when(col("hh") >= 50, "drop_sample")
          .otherwise("kept").as("decision"))
      .orderBy("doc_id")
  }

  /** PII redaction over a corpus with planted, doc_id-derived PII (the
    * fixture corpus carries none of its own): each doc gains one email,
    * one phone, and one URL in closed form, then the redaction chain
    * scrubs them. Output carries match COUNTS plus the md5 of the
    * redacted text, so the oracle hash proves the rewrites are
    * byte-identical across engines — the regex subset contract in
    * [[Text.emailPattern]] holding is exactly what's under test. */
  def redactQ(spark: SparkSession, dir: String): DataFrame = {
    val enriched = concat(
      col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@ex"), pmod(col("doc_id"), lit(7)).cast("string"), lit(".com call "),
      lpad(pmod(col("doc_id") * 37, lit(1000)).cast("string"), 3, "5"), lit("-"),
      lpad(pmod(col("doc_id") * 91, lit(10000)).cast("string"), 4, "0"),
      lit(" visit https://site"), pmod(col("doc_id"), lit(13)).cast("string"),
      lit(".example/p/"), col("doc_id").cast("string"))
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), enriched.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(Text.emailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("t"), lit(Text.urlPattern), lit(0))).as("n_urls"),
        size(regexp_extract_all(col("t"), lit(Text.phonePattern), lit(0))).as("n_phones"),
        md5(Text.redact(col("t")).cast("binary")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** The curation-funnel oracle, shared by the batch `corpus_curate`
    * query and the streaming replay `stream_curate_replay` (whose
    * id-ordered arrival makes first-qualified-wins ≡ min-id-wins, so
    * the same per-document decisions must fall out of both engines AND
    * both execution modes). */
  private[queries] lazy val curateOracleSql: String = curateOracleSqlOver("")

  /** Same oracle over a restricted document set. The predicate applies to
    * the SOURCE table (inside the first CTE), not the result: a doc's
    * `drop_dup` decision depends on which fingerprint twins are in the
    * curated set, so the streaming replay's capped sample needs the
    * oracle's dedup window computed over exactly the same cap. */
  private[queries] def curateOracleSqlOver(where: String): String = {
    val (cols, caseExpr) = duckLangId
    s"""
      WITH h AS (
        SELECT doc_id,
               $cols,
               CAST(len($duckToks) AS BIGINT) AS n_tokens,
               md5(array_to_string($duckToks, ' ')) AS fp,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS hh
        FROM documents $where),
      scored AS (
        SELECT doc_id, n_tokens, fp, hh,
               $caseExpr AS lang_pred
        FROM h),
      q AS (
        SELECT *,
               min(CASE WHEN lang_pred <> 'und' AND n_tokens >= 10
                        THEN doc_id END) OVER (PARTITION BY fp) AS keep_id
        FROM scored)
      SELECT doc_id,
             CASE WHEN lang_pred = 'und' THEN 'drop_lang'
                  WHEN n_tokens < 10 THEN 'drop_quality'
                  WHEN doc_id <> keep_id THEN 'drop_dup'
                  WHEN hh >= 50 THEN 'drop_sample'
                  ELSE 'kept' END AS decision
      FROM q ORDER BY doc_id"""
  }

  /** JSONL roundtrip gate for [[graft.core.CorpusIO]], the ingest-format
    * reader: the documents table is dumped ONCE as JSONL shards (tmp,
    * keyed by the fixture's (mtime, length) like the ANN index roots, so
    * a regenerated fixture invalidates the dump; `_SUCCESS` is a valid
    * completion gate here because the dump is a single write job), read
    * back through the PERMISSIVE explicit-schema reader, and pinned
    * column by column — text via md5, so the artifact stays small while
    * any mangled byte still flips the hash. The corrupt-capture path is
    * CorpusIOSpec's job (this fixture is clean by construction). */
  /** DOCUMENT CHUNKING: split each document into overlapping
    * fixed-token-count chunks — the step between curation and embedding
    * or context-window packing in an LLM pipeline (chunk size 64, stride
    * 48 → 16-token overlap so no boundary-spanning phrase is lost).
    *
    * Shape: one `posexplode` over `sequence(0, n-1, stride)` gives
    * (chunk_idx, start) pairs, then `slice` cuts each chunk. The token
    * array is materialized behind an explicit `repartition` barrier
    * BEFORE the explode — CollapseProject would otherwise inline the
    * tokenizer regexp into the generator and re-run it per CHUNK (the
    * `Dedup.bandTable` lesson; 8× at sf0.1). Embarrassingly parallel,
    * no shuffle after the barrier; output is ~n/stride rows per doc,
    * each pinned by md5 so the oracle checks every chunk boundary. */
  def chunksQ(spark: SparkSession, dir: String): DataFrame = {
    val (chunk, stride) = (64, 48)
    docs(spark, dir)
      .select(col("doc_id"), col("toks"))
      .where(size(col("toks")) > 0)
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .withColumnRenamed("pos", "chunk_idx")
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("col") + 1, lit(chunk)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        size(col("ctoks")).as("n_tokens"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Scrub gate over deterministically dirtied text (same construction
    * idiom as [[redactQ]]: the fixture corpus is clean, so the query
    * plants the dirt it must clean — tabs, CR/LF, NUL-adjacent control
    * bytes, runs of spaces — all derived from doc_id). */
  def scrubQ(spark: SparkSession, dir: String): DataFrame = {
    // "  <TAB>" ++ text ++ "<CR><LF><BEL> run<5 spaces>tail " — leading
    // junk, a CRLF line ending, a stray control byte, a space run, and a
    // trailing space, all of which scrub must normalize away
    val dirty = concat(
      lit("  \t"), col("text"),
      lit("\r\n\u0007 run     tail "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), dirty.as("t"))
      .select(col("doc_id"),
        length(col("t")).as("len_dirty"),
        length(Text.scrub(col("t"))).as("len_clean"),
        md5(Text.scrub(col("t"))).as("clean_md5"))
      .orderBy("doc_id")
  }

  private def docSchema = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
  }

  /** Fixture-keyed tmp dump path shared by the format-roundtrip gates:
    * keyed by (mtime, length) like the ANN index roots, so a regenerated
    * fixture invalidates the dump; `_SUCCESS` is a valid completion gate
    * here because each dump is a single write job. */
  private def dumpPath(dir: String, kind: String): String = {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/")
    val src = new java.io.File(s"$dir/documents.parquet")
    s"$tmp/graft_$kind/${dir.replaceAll("[^A-Za-z0-9.]+", "_")}" +
      s"_${src.lastModified}_${src.length}"
  }

  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = dumpPath(dir, "jsonl")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      graft.core.CorpusIO.writeJsonl(Tables.documents(spark, dir), path)
    graft.core.CorpusIO.valid(
        graft.core.CorpusIO.readJsonl(spark, path, docSchema))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** CSV roundtrip gate for [[graft.core.CorpusIO.readCsv]]: same shape
    * as [[jsonlRoundtrip]] but through the RFC-4180 writer/reader pair
    * (header + quote-doubling escape). The fixture text is single-line,
    * so the splittable `multiLine=false` default applies — the quoting /
    * corrupt-capture edges are CorpusIOSpec's job. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = dumpPath(dir, "csv")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      graft.core.CorpusIO.writeCsv(Tables.documents(spark, dir), path)
    graft.core.CorpusIO.valid(
        graft.core.CorpusIO.readCsv(spark, path, docSchema))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** ORC roundtrip gate: the second columnar format Spark ships natively.
    * ORC needs no quarantine contract (self-describing schema, like
    * parquet) — the gate proves the writer/reader pair preserves every
    * value, so a corpus already in ORC can feed the engine without a
    * recode pass. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = dumpPath(dir, "orc")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Tables.documents(spark, dir).write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  val queries: Seq[GQuery] = Seq(
    // the JSONL reader must hand back exactly what parquet holds — the
    // oracle reads the parquet table directly, so every value (text
    // md5-pinned) survives the write→parse roundtrip bit-for-bit
    GQuery("corpus_jsonl_roundtrip", jsonlRoundtrip, Some("""
      SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      FROM documents ORDER BY doc_id""")),
    // same oracle, different reader under test: the CSV and ORC gates
    // each pin their format's write→parse path against the parquet truth
    // chunk=64 / stride=48, kept in lockstep with chunksQ's constants;
    // DuckDB range(0,n,s) ≡ Spark sequence(0,n-1,s) and the 1-based
    // inclusive list slice toks[a:b] ≡ slice(toks, a, 64), both clamped
    GQuery("text_chunks", chunksQ, Some(s"""
      WITH t AS (
        SELECT doc_id, $duckToks AS toks FROM documents
        WHERE len($duckToks) > 0),
      u AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM t)
      SELECT doc_id,
             CAST(start // 48 AS INT) AS chunk_idx,
             CAST(least(64, len(toks) - start) AS INT) AS n_tokens,
             md5(array_to_string(toks[start+1 : start+64], ' ')) AS chunk_md5
      FROM u ORDER BY doc_id, chunk_idx""")),
    GQuery("text_scrub", scrubQ, Some("""
      WITH e AS (
        SELECT doc_id,
               '  ' || chr(9) || text || chr(13) || chr(10) || chr(7)
                    || ' run     tail ' AS t
        FROM documents),
      s AS (
        SELECT doc_id, t,
               trim(regexp_replace(regexp_replace(t, '[\x00-\x1f\x7f]', ' ', 'g'),
                                   '\s+', ' ', 'g')) AS clean
        FROM e)
      SELECT doc_id,
             CAST(length(t) AS INT) AS len_dirty,
             CAST(length(clean) AS INT) AS len_clean,
             md5(clean) AS clean_md5
      FROM s ORDER BY doc_id""")),
    GQuery("corpus_csv_roundtrip", csvRoundtrip, Some("""
      SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      FROM documents ORDER BY doc_id""")),
    GQuery("corpus_orc_roundtrip", orcRoundtrip, Some("""
      SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      FROM documents ORDER BY doc_id""")),
    GQuery("text_redact", redactQ, Some(s"""
      WITH e AS (
        SELECT doc_id,
               text || ' contact u' || doc_id::VARCHAR
                    || '@ex' || (doc_id % 7)::VARCHAR || '.com call '
                    || lpad(((doc_id * 37) % 1000)::VARCHAR, 3, '5') || '-'
                    || lpad(((doc_id * 91) % 10000)::VARCHAR, 4, '0')
                    || ' visit https://site' || (doc_id % 13)::VARCHAR
                    || '.example/p/' || doc_id::VARCHAR AS t
        FROM documents WHERE doc_id < 500)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '${Text.emailPattern}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(t, '${Text.urlPattern}')) AS INT) AS n_urls,
             CAST(len(regexp_extract_all(t, '${Text.phonePattern}')) AS INT) AS n_phones,
             md5(regexp_replace(regexp_replace(regexp_replace(t,
               '${Text.emailPattern}', '<EMAIL>', 'g'),
               '${Text.urlPattern}', '<URL>', 'g'),
               '${Text.phonePattern}', '<PHONE>', 'g')) AS redacted_md5
      FROM e ORDER BY doc_id""")),
    GQuery("text_tokens_top", tokensTop, Some(s"""
      SELECT token, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest($duckToks) AS token FROM documents)
      GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""")),
    GQuery("text_bigrams_top", bigramsTop, Some(s"""
      WITH t AS (SELECT $duckToks AS toks FROM documents)
      SELECT bg, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t)
      GROUP BY 1 ORDER BY cnt DESC, bg LIMIT 20""")),
    GQuery("text_lang_stats", langStats, Some(s"""
      WITH t AS (SELECT lang, n_chars, len($duckToks) AS n_toks FROM documents)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
             CAST(sum(n_toks) AS BIGINT) / count(*) AS avg_tokens
      FROM t GROUP BY 1 ORDER BY 1""")),
    GQuery("text_quality", quality, Some(s"""
      WITH t AS (SELECT doc_id,
                        CAST(len($duckToks) AS BIGINT) AS n_tokens,
                        CAST(len(regexp_extract_all(lower(text), '${Text.bpePattern}')) AS BIGINT) AS n_bpe,
                        CAST(len(list_filter($duckToks,
                               t -> list_contains($stopList, t))) AS BIGINT) AS n_stop
                 FROM documents)
      SELECT doc_id, n_tokens, n_bpe, n_stop,
             CASE WHEN n_tokens = 0 THEN 0.0
                  ELSE CAST(n_stop AS DOUBLE) / n_tokens END AS stop_ratio,
             CASE WHEN n_tokens >= 40 AND
                       (CASE WHEN n_tokens = 0 THEN 0.0
                             ELSE CAST(n_stop AS DOUBLE) / n_tokens END) < 0.3
                    THEN 'good'
                  WHEN n_tokens >= 10 THEN 'fair'
                  ELSE 'poor' END AS quality
      FROM t ORDER BY doc_id""")),
    GQuery("text_fingerprint", fingerprintQ, Some(s"""
      SELECT doc_id, md5(array_to_string($duckToks, ' ')) AS fp
      FROM documents ORDER BY doc_id""")),
    GQuery("text_normalize_unicode", normalizeUnicodeQ, Some(s"""
      WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 1 THEN 'Cafe' || chr(769) || ' ' || text
                    WHEN doc_id % 3 = 2 THEN 'Zu' || chr(776) || 'rich ' || text
                    ELSE text END AS t
        FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END AS INT) AS changed,
             md5(nfc_normalize(t)) AS fp
      FROM p ORDER BY doc_id""")),
    GQuery("text_quality_filter", qualityFilterQ, Some(s"""
      WITH t AS (SELECT doc_id, lang,
                        CAST(len($duckToks) AS BIGINT) AS n_tokens,
                        CAST(len(list_filter($duckToks,
                               t -> list_contains($stopList, t))) AS BIGINT) AS n_stop
                 FROM documents),
      s AS (SELECT doc_id, lang,
                   CASE WHEN n_tokens = 0 THEN 0.0
                        ELSE CAST(n_stop AS DOUBLE) / n_tokens END AS score
            FROM t),
      c AS (SELECT lang, ROUND(quantile_cont(score, 0.25), 6) AS cut
            FROM s GROUP BY 1)
      SELECT s.doc_id, s.lang, ROUND(s.score, 6) AS score, c.cut,
             CAST(CASE WHEN ROUND(s.score, 6) >= c.cut THEN 1 ELSE 0 END AS INT) AS kept
      FROM s JOIN c USING (lang) ORDER BY s.doc_id""")),
    // BPE merge learning: every round unrolled — pair counts, argmax
    // with (count desc, pair) tie-break, space-wrapped replace apply
    GQuery("text_bpe_train", bpeTrainQ, Some {
      def round(wIn: String, pr: String, b: String, wOut: String) = s"""
      $pr AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
          SELECT freq, unnest(list_transform(range(1, len(l)),
                   i -> l[i] || ' ' || l[i + 1])) AS pair
          FROM (SELECT freq, string_split(trim(syms), ' ') AS l FROM $wIn))
        GROUP BY 1),
      $b AS (SELECT pair, n FROM $pr ORDER BY n DESC, pair LIMIT 1),
      $wOut AS (SELECT word, freq,
                  replace(syms, ' ' || b.pair || ' ',
                          ' ' || replace(b.pair, ' ', '') || ' ') AS syms
                FROM $wIn, $b b)"""
      val rounds = (1 to BpeMerges)
        .map(r => round(s"w${r - 1}", s"pr$r", s"b$r", s"w$r")).mkString(",")
      val sel = (1 to BpeMerges).map(r =>
        s"SELECT $r AS merge_rank, pair, n FROM b$r").mkString(" UNION ALL ")
      s"""
      WITH w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
                         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g')
                             || '</w> ' AS syms
                  FROM (SELECT unnest($duckToks) AS word FROM documents)
                  GROUP BY word),
      $rounds
      SELECT CAST(merge_rank AS INT) AS merge_rank,
             string_split(pair, ' ')[1] AS left_sym,
             string_split(pair, ' ')[2] AS right_sym,
             n AS pair_count
      FROM ($sel) ORDER BY merge_rank"""
    }),
    // BPE apply: the final merged vocab (w8) segmented — unit counts
    // weighted by word freq, top-20 with (count desc, unit) order.
    // SHARED verbatim by text_bpe_frozen: applying the persisted merge
    // table in rank order replays training's state evolution exactly,
    // so the frozen-model path must hash-match the in-query trainer.
    GQuery("text_bpe_segments", bpeSegmentsQ, Some(bpeSegmentsOracle)),
    GQuery("text_bpe_frozen", bpeSegmentsIndexedQ, Some(bpeSegmentsOracle)),
    GQuery("text_bpe_fertility", bpeFertilityQ, Some(bpeFertilityOracle)),
    // trained quality classifier: exact-integer counts → 6-dp-rounded
    // DECIMAL weights → exact decimal score sums (order-independent);
    // round 14: the weight/prior lns are DetMath signed-ln chains over
    // the shared cross-ratio SQL text — no libm in the hashed path
    GQuery("text_quality_classifier", qualityClassifierQ, Some {
      import graft.functions.DetMath
      val (wCtes, wOut) = DetMath.cteChain(
        s"SELECT token, ${Text.NbWeightRatioSql} AS __r FROM cc, tot",
        DetMath.lnSignedSteps("__r", "__w"), "nbw")
      val (pCtes, pOut) = DetMath.cteChain(
        s"SELECT ${Text.NbPriorRatioSql} AS __r FROM pr0",
        DetMath.lnSignedSteps("__r", "__b"), "nbp")
      s"""
      WITH lab AS (
        SELECT doc_id, $duckToks AS toks,
               CASE WHEN CAST(len($duckToks) AS BIGINT) >= 40 AND
                         (CASE WHEN len($duckToks) = 0 THEN 0.0
                               ELSE CAST(len(list_filter($duckToks,
                                      t -> list_contains($stopList, t))) AS DOUBLE)
                                    / len($duckToks) END) < 0.3
                    THEN 1 ELSE 0 END AS label
        FROM documents),
      tok AS (SELECT doc_id, label, unnest(toks) AS token FROM lab),
      cc AS (SELECT token,
                    CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                    CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn
             FROM tok GROUP BY 1),
      tot AS (SELECT CAST(sum(cp) AS BIGINT) AS tp, CAST(sum(cn) AS BIGINT) AS tn,
                     CAST(count(*) AS BIGINT) AS v
              FROM cc),
      $wCtes,
      w AS (SELECT token, CAST(ROUND(__w, 6) AS DECIMAL(18,6)) AS w
            FROM $wOut),
      pr0 AS (SELECT CAST(sum(label) AS BIGINT) AS np,
                     CAST(sum(1 - label) AS BIGINT) AS nn
              FROM lab),
      $pCtes,
      prior AS (SELECT CAST(ROUND(__b, 6) AS DECIMAL(18,6)) AS b
                FROM $pOut),
      s AS (SELECT t.doc_id, sum(w.w) AS sw FROM tok t JOIN w USING (token) GROUP BY 1)
      SELECT l.doc_id, CAST(l.label AS INT) AS label,
             CAST(coalesce(s.sw, 0) + p.b AS DOUBLE) AS score,
             CAST(CASE WHEN coalesce(s.sw, 0) + p.b >= 0 THEN 1 ELSE 0 END AS INT) AS pred
      FROM lab l LEFT JOIN s ON s.doc_id = l.doc_id CROSS JOIN prior p
      ORDER BY l.doc_id"""
    }),
    // bigram-LM perplexity: all model stats (c2, c1 = Σc2 by head,
    // V = distinct continuations) from ONE bigram groupBy; per-bigram
    // nll at the MODEL table, rounded to 6 dp and summed as exact
    // DECIMAL (order-independent). No libm: ln and exp are DetMath step
    // chains — the IDENTICAL expression strings the engine evaluates,
    // so both sides produce bit-identical doubles by construction
    // (ADVICE r13 #1)
    GQuery("text_lm_score", lmScoreQ, Some {
      import graft.functions.DetMath
      val (lnCtes, lnOut) = DetMath.cteChain(
        s"""SELECT cc.bg, ${Text.LmRatioSql} AS __x
            FROM (SELECT bg, c2 FROM c2) cc
                 JOIN c1 ON c1.w1 = split_part(cc.bg, ' ', 1)
                 CROSS JOIN vv""",
        DetMath.lnSteps("__x", "__nll"), "lma")
      val (expCtes, expOut) = DetMath.cteChain(
        s"""SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   ROUND(CAST(sum(m.nll) AS DOUBLE) / count(*), 6) AS avg_nll
            FROM bgs b JOIN mdl m USING (bg) GROUP BY 1""",
        DetMath.expSteps("avg_nll", "__pexp"), "lmc")
      s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      bgs AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t),
      c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgs GROUP BY 1),
      c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
             FROM c2 GROUP BY 1),
      vv AS (SELECT CAST(count(DISTINCT split_part(bg, ' ', 2)) AS BIGINT) AS v
             FROM c2),
      $lnCtes,
      mdl AS (SELECT bg, CAST(ROUND(__nll, 6) AS DECIMAL(18,6)) AS nll
              FROM $lnOut),
      $expCtes
      SELECT doc_id, n_bigrams, avg_nll, ROUND(__pexp, 4) AS ppl
      FROM $expOut ORDER BY doc_id"""
    }),
    // trigram Kneser-Ney: every model statistic from the trigram TYPE
    // table (N1+ counts are row counts of its re-aggregations); the
    // interpolated-KN probability is Text.KnPSql — the IDENTICAL shared
    // SQL text the engine evaluates — and ln/exp are DetMath chains, so
    // the hashed doubles are bit-identical by construction
    GQuery("text_lm_score_kn", lmScoreKnQ, Some {
      import graft.functions.DetMath
      val (lnCtes, lnOut) = DetMath.cteChain(
        s"""SELECT c.tg, 1.0 / ${Text.KnPSql} AS __x
            FROM c3 c JOIN hi USING (w1, w2) JOIN mn USING (w2, w3)
                 JOIN md USING (w2) JOIN lo USING (w3) CROSS JOIN nb""",
        DetMath.lnSteps("__x", "__nll"), "kna")
      val (expCtes, expOut) = DetMath.cteChain(
        s"""SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                   ROUND(CAST(sum(m.nll) AS DOUBLE) / count(*), 6) AS avg_nll
            FROM tgs g JOIN mdl m USING (tg) GROUP BY 1""",
        DetMath.expSteps("avg_nll", "__pexp"), "knb")
      s"""
      WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
      tgs AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tg
              FROM t),
      c3 AS (SELECT tg, CAST(count(*) AS BIGINT) AS c3,
                    split_part(tg, ' ', 1) AS w1,
                    split_part(tg, ' ', 2) AS w2,
                    split_part(tg, ' ', 3) AS w3
             FROM tgs GROUP BY 1),
      hi AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c12,
                    CAST(count(*) AS BIGINT) AS n1p_mid FROM c3 GROUP BY 1, 2),
      mn AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS n1p_l23
             FROM c3 GROUP BY 1, 2),
      md AS (SELECT w2, CAST(sum(n1p_l23) AS BIGINT) AS n1p_l2d,
                    CAST(count(*) AS BIGINT) AS n1p_2s FROM mn GROUP BY 1),
      lo AS (SELECT w3, CAST(count(*) AS BIGINT) AS n1p_r3 FROM mn GROUP BY 1),
      nb AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM mn),
      $lnCtes,
      mdl AS (SELECT tg, CAST(ROUND(__nll, 6) AS DECIMAL(18,6)) AS nll
              FROM $lnOut),
      $expCtes
      SELECT doc_id, n_trigrams, avg_nll, ROUND(__pexp, 4) AS ppl
      FROM $expOut ORDER BY doc_id"""
    }),
    GQuery("text_lang_id", langIdQ, Some {
      val (cols, caseExpr) = duckLangId
      s"""
      WITH h AS (
        SELECT doc_id,
               $cols
        FROM documents)
      SELECT doc_id,
             $caseExpr AS lang_pred
      FROM h ORDER BY doc_id"""
    }),
    GQuery("text_tfidf", tfidfQ, Some {
      import graft.functions.DetMath
      val (idfCtes, idfOut) = DetMath.cteChain(
        "SELECT token, df, tf, nn.n / df AS __x FROM agg, nn",
        DetMath.lnSteps("__x", "__idf"), "tfi")
      s"""
      WITH per AS (
        SELECT doc_id, token, count(*) AS cnt
        FROM (SELECT doc_id, unnest($duckToks) AS token FROM documents)
        GROUP BY 1, 2),
      agg AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(cnt) AS BIGINT) AS tf
        FROM per GROUP BY 1),
      nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
      $idfCtes
      SELECT token, df, tf, ROUND(__idf, 6) AS idf
      FROM $idfOut
      ORDER BY df DESC, token LIMIT 20"""
    }),
    GQuery("pack_bins", packBinsQ, Some(s"""
      WITH t AS (
        SELECT source, doc_id, CAST(len($duckToks) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT source, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      FROM c GROUP BY 1, 2 ORDER BY 1, 2""")),
    GQuery("text_token_hist", tokenHist, Some(s"""
      WITH t AS (SELECT CAST(len($duckToks) AS BIGINT) AS n FROM documents)
      SELECT CASE WHEN n = 0 THEN '0'
                  WHEN n < 16 THEN 'a_1_15'
                  WHEN n < 32 THEN 'b_16_31'
                  WHEN n < 64 THEN 'c_32_63'
                  WHEN n < 128 THEN 'd_64_127'
                  ELSE 'e_128_plus' END AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS sum_tokens,
             CAST(min(n) AS BIGINT) AS min_tokens,
             CAST(max(n) AS BIGINT) AS max_tokens
      FROM t GROUP BY 1 ORDER BY 1""")),
    GQuery("corpus_curate", curate, Some(curateOracleSql)),
    GQuery("corpus_clean_stats", corpusCleanStats, Some(s"""
      WITH toks AS (
        SELECT doc_id, lang, $duckToks AS t FROM documents),
      scored AS (
        SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tokens,
               md5(array_to_string(t, ' ')) AS fp
        FROM toks WHERE len(t) >= 10),
      survivors AS (
        SELECT * FROM scored
        WHERE doc_id = (SELECT min(s2.doc_id) FROM scored s2 WHERE s2.fp = scored.fp))
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      FROM survivors GROUP BY 1 ORDER BY 1"""))
  )
}
