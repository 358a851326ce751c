package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PERSISTED LEXICAL (BM25) INDEX TIER — the retrieval family's LSM
  * lifecycle (round 14), the [[Dedup]] near-dup band tier's discipline
  * applied to the inverted index: at 100 TB the corpus is tokenized
  * ONCE and every query batch probes the persisted posting lists
  * (bucketed by token at deployment — a co-located join) instead of
  * re-tokenizing the world. Build → marker-gated serve → numbered
  * delta generations per arrival batch → idempotent compaction.
  *
  * Tier content is four append-only tables, all fixed-width and
  * text-free: the two FACT tables `postings` (doc_id, t, tf) and
  * `dlen` (doc_id, dl), plus — round 15 — the per-generation BM25
  * STATISTICS `df` (t, df) and `stats` (sdl, n). Like band rows, a
  * document's postings are immutable once tokenized (re-upserting an
  * id is the caller's bug), so compaction is a REWRITE, not a rebuild.
  * Global statistics FOLD across generations by integer addition
  * (generations index disjoint documents, so doc-frequencies and
  * doc-count/length totals are sums) — bit-identical to a fresh full
  * build's aggregation by construction, which keeps the tier
  * upsert-correct however arrivals were batched (the streaming
  * replay's shared oracle hash-proves exactly this) while a probe
  * batch reads GENS-BOUNDED vocab-sized stat tables instead of
  * re-aggregating the full postings table — the 100 TB
  * scan-per-query killer the round-14 layout had (r14 verdict #3).
  *
  * Scoring is [[bm25Scores]] — ONE implementation shared by the
  * in-query hybrid arm and the tier serve, so the persisted and
  * in-query forms cannot drift. Determinism: idf is deterministic
  * DetMath (native expression twin of the oracle's ln chain), the
  * tf/dl/avgdl arithmetic is shared SQL text, each term quantizes to
  * 12-dp fixed-point micro-units and sums as exact BIGINT —
  * order-independent, no libm. */
object Lex {

  /** BM25 constants (Robertson's k1=1.2, b=0.75 as exact literals) and
    * the scoring expressions as SHARED SQL TEXT — evaluated verbatim
    * by both engines so every IEEE operation happens in the same order
    * on the same inputs. Columns: df/n (token doc-frequency, corpus
    * doc count), tf/dl/avgdl (term frequency, doc length, mean doc
    * length).
    *
    * Terms are quantized to 12-dp FIXED-POINT MICRO-UNITS — one
    * exact-literal multiply and one floor (half-up for the positive
    * range), summed as exact BIGINT — instead of ROUND(x, 12) +
    * DECIMAL(28,12): same order-independence and cross-engine
    * bit-identity (floor and the 1.0E12 multiply are single IEEE ops
    * on identical inputs; integer sums are exact in any order), but
    * Spark implements ROUND-on-double and beyond-long decimals via a
    * per-row BigDecimal allocation — measured 2× the whole probe cost
    * at 9M scored pairs (9.6 s → ~4.5 s, ScaleBench lex_probe 1×).
    * Overflow bound (stated, not assumed — round-15 ADVICE #2): the
    * per-pair sum is over SHARED ADMITTED tokens only, each term
    * ≤ idf·(k1+1) ≤ ~65 score units even at n = 10^12 docs
    * (idf ≤ ln 2n ≈ 29), i.e. ≤ 6.5·10^13 micro-units, so BIGINT's
    * 2^63 ≈ 9.2·10^18 holds until a single (probe, doc) pair shares
    * ~1.4·10^5 DISTINCT admitted tokens — far past any real document's
    * vocabulary, but a SMALLER headroom than DECIMAL(28,12)'s 10^16
    * units, and a different failure mode: Spark's non-ANSI sum(LONG)
    * would wrap silently where the decimal sum nulled loudly (DuckDB
    * promotes to HUGEINT either way). [[Bm25ScoreOf]] is the shared
    * descale text. */
  val Bm25AvgdlSql = "CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)"
  val Bm25IdfArgSql =
    "1.0 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)"
  val Bm25TermSql =
    "CAST(FLOOR((__idf * (CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
      "1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) " +
      "* 1.0E12 + 0.5) AS BIGINT)"
  /** Descale a summed micro-unit column back to a double score. */
  def Bm25ScoreOf(sumSql: String): String =
    s"CAST($sumSql AS DOUBLE) / 1.0E12"

  /** IMPACT-ORDERED CANDIDATE GENERATION (round 15 — the
    * early-termination scale path the max-df cut comments point at):
    * posting-list length under a corpus-relative stopword cut is
    * linear in the corpus, so an exact probe pays Θ(admitted postings
    * per probe token). Real engines bound that with impact ordering
    * (Anh & Moffat 2006) / static index pruning (Carmel et al. 2001):
    * order each posting list by the QUERY-INDEPENDENT part of the BM25
    * term — everything but idf, which is constant within a list — and
    * draw CANDIDATES from a bounded prefix, then score those
    * candidates exactly. (Prefix-only PARTIAL scoring was measured
    * first and rejected: a candidate scored only on the tokens whose
    * prefix it entered ranks by an arbitrary fraction of its true
    * score — recall@10 was 0.0 on the flat-vocabulary fixture.)
    * [[Bm25ImpactSql]] is that static impact, quantized to integer
    * millionths (one exact-literal multiply + one floor — the same
    * fixed-point discipline as the term sum) so both engines rank
    * posting prefixes identically; ties break on smaller doc id. The
    * prefix bound is [[LexPrunedM]]. Pruning is PER-GENERATION (each
    * segment keeps its own top-M, like per-segment Lucene):
    * deterministic for any batching, at the honest cost that the
    * candidate set is APPROXIMATE — `search_pruned_recall` measures
    * exactly how approximate against the exact serve. */
  val LexPrunedM = 32
  val Bm25ImpactSql =
    "CAST(FLOOR(((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
      "1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) " +
      "* 1.0E6 + 0.5) AS BIGINT)"

  /** Tokenize a (idCol, textCol) frame into the tier's two fact
    * tables: postings (idCol, t, tf) and dlen (idCol, dl). */
  def factTables(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("t"))
    (toks.groupBy(idCol, "t").agg(count(lit(1)).as("tf")),
      toks.groupBy(idCol).agg(count(lit(1)).as("dl")))
  }

  /** The (t, df) and 1-row (sdl, n) statistic tables of a fact-table
    * pair — what [[buildLexIndex]]/[[upsertLexIndex]] persist per
    * generation and [[bm25Scores]] consumes. */
  def statTables(postings: DataFrame, dlen: DataFrame): (DataFrame, DataFrame) =
    (postings.groupBy("t").agg(count(lit(1)).as("df")),
      dlen.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("n")))

  /** BM25 scores of every probe token-set against the indexed corpus:
    * `postings`/`dlen` are the fact tables (from [[factTables]] or the
    * persisted tier), `probeTok` is (probe_id, t) DISTINCT query
    * tokens; `dfStats`, when given (the persisted-tier path), is the
    * pre-aggregated ([[statTables]]-shaped, possibly gens-folded)
    * (df, stats) pair — otherwise both aggregate from the fact tables
    * in-query.
    *
    * The stopword cut is CORPUS-RELATIVE (round-15 verdict #1): tokens
    * in more than `maxDfPct`% of documents drop — the `max_df`
    * convention, compared in exact integers (`df·100 ≤ pct·n`) so both
    * engines make the identical cut. The round-14 ABSOLUTE cap was the
    * vacuity bug: any fixed count is "everything" on a small corpus
    * and "nothing" on a big one — a fraction of the corpus is the
    * only df that means the same thing at every scale.
    *
    * Join order is the 100 TB shape (round-15 verdict #4): the
    * postings scan meets the BROADCAST PROBE TOKENS FIRST — the only
    * join that prunes corpus-sized data — then the (probe-pruned,
    * vocab-bounded, broadcast) idf table, then doc lengths, then the
    * 1-row stats. When `postings` already CARRIES a `dl` column (the
    * persisted tier denormalizes it at write time — the Lucene
    * per-doc-norm layout), the doc-length join disappears entirely and
    * the probe plan's ONLY exchange is the final (probe, cand)
    * aggregation: everything upstream is broadcast-joined map-side.
    * Candidates never include the probe itself; when `candidates`
    * (probe_id, idCol) is given, scoring restricts to those pairs —
    * the impact-prefix serving path, where the pair set is bounded by
    * M·|probe tokens| per probe. Returns (probe_id, cand_id, __score
    * DOUBLE) — the exact-decimal per-pair sum surfaced as a double. */
  def bm25Scores(postings: DataFrame, dlen: DataFrame, probeTok: DataFrame,
                 maxDfPct: Int, idCol: String = "doc_id",
                 dfStats: Option[(DataFrame, DataFrame)] = None,
                 candidates: Option[DataFrame] = None): DataFrame = {
    val (dfT, stats0) = dfStats.getOrElse(statTables(postings, dlen))
    val stats = stats0.withColumn("avgdl", expr(Bm25AvgdlSql))
    val ptok = probeTok.select(col("probe_id"), col("t"))
    // idf only for tokens the probes actually use (bounded by the probe
    // batch's vocabulary) that survive the relative cut; the ln is the
    // native DetMath expression — the bit-identical twin of the chain
    // the oracle evaluates
    val idf = dfT.join(broadcast(ptok.select("t").distinct()), "t")
      .crossJoin(broadcast(stats.select("n")))
      .filter(expr(s"df * 100 <= $maxDfPct * n"))
      .withColumn("__x", expr(Bm25IdfArgSql))
      .withColumn("__idf", graft.functions.DetMathExpr.detLn(col("__x")))
      .select(col("t"), col("__idf"))
    val pruned0 = postings
      .join(broadcast(ptok), "t")
      .filter(col(idCol) =!= col("probe_id"))
      .join(broadcast(idf), "t")
    val pruned = candidates
      .map(c => pruned0.join(broadcast(c), Seq("probe_id", idCol)))
      .getOrElse(pruned0)
    val withDl =
      if (postings.columns.contains("dl")) pruned
      else pruned.join(dlen, idCol)
    withDl
      .crossJoin(broadcast(stats.select("avgdl")))
      .withColumn("__term", expr(Bm25TermSql))
      .groupBy(col("probe_id"), col(idCol).as("cand_id"))
      .agg(sum(col("__term")).as("__micro"))
      .select(col("probe_id"), col("cand_id"),
        expr(Bm25ScoreOf("__micro")).as("__score"))
  }

  // ------------------------------------------------------------------ //
  //  Tier lifecycle (the near-dup band tier's marker discipline)        //
  // ------------------------------------------------------------------ //

  /** Completion marker; CONTENT is the tokenizer fingerprint
    * ([[Markers]]) — a re-cut tokenizer reads as "no tier", never
    * serves postings cut the old way. */
  val LexCompleteMarker = "_GRAFT_LEX_COMPLETE"

  /** Per-generation marker, written strictly LAST. */
  val LexDeltaMarker = "_GRAFT_LEX_DELTA_COMPLETE"

  private def deltaRoot(path: String) = s"$path/lex_delta"
  private def genPath(path: String, gen: Int) =
    DeltaGens.genPath(deltaRoot(path), gen)

  private def completedGens(spark: org.apache.spark.sql.SparkSession,
                            path: String): Seq[Int] =
    DeltaGens.completed(spark, deltaRoot(path), LexDeltaMarker)

  def lexServes(spark: org.apache.spark.sql.SparkSession, path: String,
                fingerprint: String): Boolean =
    Markers.matches(spark, s"$path/$LexCompleteMarker", fingerprint)

  /** Write one generation's four tables (facts + statistics) under
    * `dir`. The facts are materialized once (localCheckpoint) so the
    * df/stats aggregations don't re-tokenize the documents. The
    * persisted postings DENORMALIZE the doc length (`dl`) into every
    * row — the Lucene per-doc-norm layout, +8 bytes/row paid once per
    * generation so probe plans never shuffle corpus-sized data to a
    * doc-length join (measured: the lex_probe ScaleBench join was the
    * dominant probe cost once the max-df cut admitted real posting
    * lists). */
  /** Materialize the TWO frames every generation write derives from:
    * `d` (doc lengths — dlen + stats + the dl join) and `joined`
    * (dl-denormalized postings — postings + pruned prefix + df, whose
    * (doc, t) row set equals the raw postings', so df aggregated there
    * is identical to statTables' form). Exposed separately from
    * [[writeGenTablesFrom]] so compaction can materialize BEFORE
    * retracting the serving marker (r15 second-pass review: a
    * transient checkpoint failure must not strand a healthy tier
    * behind a deleted marker) while still holding only one merged
    * copy at a time. */
  private def genTableFrames(postings: DataFrame,
                             dlen: DataFrame): (DataFrame, DataFrame) = {
    val d = dlen.localCheckpoint(true)
    val idc = postings.columns.head // factTables puts idCol first
    val joined = postings.drop("dl").join(d.select(col(idc), col("dl")), idc)
      .localCheckpoint(true)
    (d, joined)
  }

  private def writeGenTables(dir: String, postings: DataFrame,
                             dlen: DataFrame): Unit = {
    val (d, joined) = genTableFrames(postings, dlen)
    writeGenTablesFrom(dir, d, joined)
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(d)
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(joined)
  }

  /** Write one generation's five tables from the [[genTableFrames]]
    * pair (does NOT unpersist — callers own the checkpoints). */
  private def writeGenTablesFrom(dir: String, d: DataFrame,
                                 joined: DataFrame): Unit = {
    val idc = joined.columns.head
    val dfT = joined.groupBy("t").agg(count(lit(1)).as("df"))
    val stats = d.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("n"))
    joined.write.mode("overwrite").parquet(s"$dir/postings")
    // impact-ordered top-[[LexPrunedM]] prefix of every posting list —
    // the one per-token sort, paid at WRITE time once per generation
    // (this generation's avgdl: pruning is per-segment, so it never
    // depends on what other generations exist)
    val avgdlF = stats.withColumn("avgdl", expr(Bm25AvgdlSql)).select("avgdl")
    joined.crossJoin(broadcast(avgdlF))
      .withColumn("__imp", expr(Bm25ImpactSql))
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("t").orderBy(col("__imp").desc, col(idc))))
      .filter(col("__rk") <= LexPrunedM)
      .select(joined.columns.map(col): _*)
      .write.mode("overwrite").parquet(s"$dir/postings_pruned")
    d.write.mode("overwrite").parquet(s"$dir/dlen")
    dfT.write.mode("overwrite").parquet(s"$dir/df")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Persist the base tier. Drops live deltas (they tokenized against
    * a base this write replaces); fingerprint marker strictly last. */
  def buildLexIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    docs: DataFrame, fingerprint: String,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Markers.delete(spark, s"$path/$LexCompleteMarker")
    DeltaGens.drop(spark, deltaRoot(path))
    val (postings, dlen) = factTables(docs, idCol, textCol)
    writeGenTables(path, postings, dlen)
    Markers.write(spark, s"$path/$LexCompleteMarker", fingerprint)
  }

  /** Drop all delta generations (replay idempotence). */
  def dropLexDeltas(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    DeltaGens.drop(spark, deltaRoot(path))

  /** Append one arrival batch as a new numbered generation —
    * tokenization is per-document, and global stats are recomputed at
    * query time from the merged tier, so the served scores are
    * IDENTICAL however arrivals are micro-batched. */
  def upsertLexIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     batch: DataFrame, fingerprint: String,
                     idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(lexServes(spark, path, fingerprint),
      s"upsertLexIndex: no serving lexical tier at $path for this tokenizer")
    val gen = genPath(path,
      DeltaGens.next(spark, deltaRoot(path), LexDeltaMarker))
    val (postings, dlen) = factTables(batch, idCol, textCol)
    writeGenTables(gen, postings, dlen)
    DeltaGens.markComplete(spark, gen, LexDeltaMarker)
  }

  /** The merged fact tables: base plus every completed generation.
    * SNAPSHOT DISCIPLINE (round-15 review): a query must list the
    * completed generations ONCE and thread that list through every
    * table it reads — listing per table would let a concurrently
    * completing upsert split one probe across two tier states (stats
    * counting documents whose postings are never scanned). */
  def lexTierTables(spark: org.apache.spark.sql.SparkSession, path: String):
      (DataFrame, DataFrame) =
    lexTierTablesAt(spark, path, completedGens(spark, path))

  private def lexTierTablesAt(spark: org.apache.spark.sql.SparkSession,
                              path: String, gens: Seq[Int]):
      (DataFrame, DataFrame) =
    (gens.map(g => spark.read.parquet(s"${genPath(path, g)}/postings"))
       .foldLeft(spark.read.parquet(s"$path/postings"))(_ unionByName _),
      gens.map(g => spark.read.parquet(s"${genPath(path, g)}/dlen"))
        .foldLeft(spark.read.parquet(s"$path/dlen"))(_ unionByName _))

  /** The tier's FOLDED statistics — (t, df) and 1-row (sdl, n) —
    * summed over base + every completed generation (round 15):
    * generations index disjoint documents, so the per-generation
    * doc-frequencies and doc-count/length totals add EXACTLY (integer
    * arithmetic — bit-identical to a fresh full build's aggregation,
    * in any fold order). A probe batch reads these gens-bounded
    * vocab-sized tables instead of aggregating the full postings
    * table — at 100 TB that aggregation was a corpus scan per query. */
  def lexTierStats(spark: org.apache.spark.sql.SparkSession, path: String):
      (DataFrame, DataFrame) =
    lexTierStatsAt(spark, path, completedGens(spark, path))

  private def lexTierStatsAt(spark: org.apache.spark.sql.SparkSession,
                             path: String, gens: Seq[Int]):
      (DataFrame, DataFrame) = {
    val dfT = gens.map(g => spark.read.parquet(s"${genPath(path, g)}/df"))
      .foldLeft(spark.read.parquet(s"$path/df"))(_ unionByName _)
      .groupBy("t").agg(sum(col("df")).as("df"))
    val stats = gens.map(g => spark.read.parquet(s"${genPath(path, g)}/stats"))
      .foldLeft(spark.read.parquet(s"$path/stats"))(_ unionByName _)
      .agg(sum(col("sdl")).as("sdl"), sum(col("n")).as("n"))
    (dfT, stats)
  }

  /** Probe the tier: BM25 top candidates for each probe document,
    * scored against EVERYTHING indexed (base ∪ deltas), global stats
    * FOLDED from the persisted per-generation tables ([[lexTierStats]]
    * — never a full-postings aggregation). Probes are tokenized
    * in-query (tiny — an arrival batch). */
  def queryLexIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    probeDocs: DataFrame, maxDfPct: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val gens = completedGens(spark, path) // ONE snapshot for all tables
    val (postings, dlen) = lexTierTablesAt(spark, path, gens)
    val ptok = probeDocs
      .select(col(idCol).as("probe_id"), explode(Text.tokens(col(textCol))).as("t"))
      .distinct()
    bm25Scores(postings, dlen, ptok, maxDfPct, idCol,
      dfStats = Some(lexTierStatsAt(spark, path, gens)))
  }

  /** [[queryLexIndex]]'s APPROXIMATE twin — the two-phase
    * impact-prefix serve: CANDIDATES are every doc appearing in the
    * top-[[LexPrunedM]] impact prefix of any probe token's posting
    * list (per generation — ≤ M·|probe tokens|·gens pairs per probe,
    * BOUNDED regardless of corpus size), then those candidates are
    * scored EXACTLY — full per-pair BM25 over all shared admitted
    * tokens with the full tier's statistics, so a served score equals
    * the exact serve's and only the candidate set approximates.
    * `search_pruned_recall` grades that approximation. */
  def queryLexIndexPruned(spark: org.apache.spark.sql.SparkSession, path: String,
                          probeDocs: DataFrame, maxDfPct: Int,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val gens = completedGens(spark, path) // ONE snapshot for all tables
    val prefix = gens
      .map(g => spark.read.parquet(s"${genPath(path, g)}/postings_pruned"))
      .foldLeft(spark.read.parquet(s"$path/postings_pruned"))(_ unionByName _)
    val ptok = probeDocs
      .select(col(idCol).as("probe_id"), explode(Text.tokens(col(textCol))).as("t"))
      .distinct()
    val cands = prefix.join(broadcast(ptok), "t")
      .filter(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol))
      .distinct()
    val (postings, dlen) = lexTierTablesAt(spark, path, gens)
    bm25Scores(postings, dlen, ptok, maxDfPct, idCol,
      dfStats = Some(lexTierStatsAt(spark, path, gens)), candidates = Some(cands))
  }

  /** COMPACT: fold generations into the base tables and drop them.
    * Postings are immutable facts, so like the band tier this is a
    * rewrite, not a rebuild — and IDEMPOTENT against the crash window
    * between rewrite and generation drop ONLY at the table level
    * (duplicate (doc, t) posting rows would double-count tf), which is
    * why the marker is removed during the rewrite: a crash mid-compact
    * reads as "no tier" and the next build starts clean, never serving
    * doubled postings. */
  def compactLexIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      fingerprint: String): Unit = {
    require(lexServes(spark, path, fingerprint),
      s"compactLexIndex: no serving lexical tier at $path for this tokenizer")
    val gens = completedGens(spark, path)
    if (gens.isEmpty) return
    val (postings, dlen) = lexTierTablesAt(spark, path, gens)
    // materialize the merged plans BEFORE retracting the marker (they
    // reference the very files the rewrite overwrites, AND a transient
    // checkpoint failure here must leave a still-serving tier, not a
    // healthy tier stranded behind a deleted marker — r15 second-pass
    // review); exactly ONE merged copy exists at a time
    val (d, joined) = genTableFrames(postings, dlen)
    Markers.delete(spark, s"$path/$LexCompleteMarker")
    // statistics are REAGGREGATED from the merged facts (one extra
    // shuffle over data compaction rewrites anyway) — exact integers,
    // so this equals the generation fold bit-for-bit
    writeGenTablesFrom(path, d, joined)
    dropLexDeltas(spark, path)
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(d)
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(joined)
    Markers.write(spark, s"$path/$LexCompleteMarker", fingerprint)
  }

  /** Auto-compaction policy (the [[Dedup.maybeCompactNearDupIndex]]
    * twin): fire at `maxGens` generations or delta/base posting-row
    * ratio ≥ `maxRatio`. Returns whether it fired. */
  def maybeCompactLexIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, fingerprint: String,
                           maxGens: Int = 4, maxRatio: Double = 0.25): Boolean = {
    val gens = completedGens(spark, path)
    val fire = DeltaGens.shouldCompact(gens, maxGens, maxRatio) {
      val nDelta = gens.map(g => spark.read
        .parquet(s"${genPath(path, g)}/postings").count()).sum
      val nBase = spark.read.parquet(s"$path/postings").count()
      if (nBase == 0) Double.MaxValue else nDelta.toDouble / nBase
    }
    if (fire) compactLexIndex(spark, path, fingerprint)
    fire
  }

  /** Test-only: completed generation numbers at `path`. */
  private[graft] def lexGensForTest(spark: org.apache.spark.sql.SparkSession,
                                    path: String): Seq[Int] =
    completedGens(spark, path)
}
