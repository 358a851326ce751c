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
  * Tier content is two append-only FACT tables, both fixed-width and
  * text-free: `postings` (doc_id, t, tf) and `dlen` (doc_id, dl).
  * Like band rows, a document's postings are immutable once tokenized
  * (re-upserting an id is the caller's bug), so compaction is a
  * REWRITE, not a rebuild. Global BM25 statistics (df, N, avgdl) are
  * NOT persisted: they are recomputed per query from the merged tier
  * by vocab-bounded aggregations — which is what makes the tier
  * upsert-correct by construction: a served score after N upserts is
  * bit-identical to the score a fresh full build would produce,
  * however arrivals were batched (the streaming replay's shared oracle
  * hash-proves exactly this).
  *
  * Scoring is [[bm25Scores]] — ONE implementation shared by the
  * in-query hybrid arm and the tier serve, so the persisted and
  * in-query forms cannot drift. Determinism: idf is a
  * [[graft.functions.DetMath]] ln chain, the tf/dl/avgdl arithmetic is
  * shared SQL text, each term rounds to 12 dp and sums as exact
  * DECIMAL(28,12) — order-independent, no libm. */
object Lex {

  /** BM25 constants (Robertson's k1=1.2, b=0.75 as exact literals) and
    * the scoring expressions as SHARED SQL TEXT — evaluated verbatim
    * by both engines so every IEEE operation happens in the same order
    * on the same inputs. Columns: df/n (token doc-frequency, corpus
    * doc count), tf/dl/avgdl (term frequency, doc length, mean doc
    * length). */
  val Bm25AvgdlSql = "CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)"
  val Bm25IdfArgSql =
    "1.0 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)"
  val Bm25TermSql =
    "ROUND(__idf * (CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
      "1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))), 12)"

  /** Tokenize a (idCol, textCol) frame into the tier's two fact
    * tables: postings (idCol, t, tf) and dlen (idCol, dl). */
  def factTables(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("t"))
    (toks.groupBy(idCol, "t").agg(count(lit(1)).as("tf")),
      toks.groupBy(idCol).agg(count(lit(1)).as("dl")))
  }

  /** BM25 scores of every probe token-set against the indexed corpus:
    * `postings`/`dlen` are the fact tables (from [[factTables]] or the
    * persisted tier), `probeTok` is (probe_id, t) DISTINCT query
    * tokens. Tokens with df > `dfCap` drop (the posting-list cap — the
    * lexical twin of the LSH bucket cap); candidates never include the
    * probe itself. Returns (probe_id, cand_id, __score DOUBLE) — the
    * exact-decimal per-pair sum surfaced as a double. */
  def bm25Scores(postings: DataFrame, dlen: DataFrame, probeTok: DataFrame,
                 dfCap: Long, idCol: String = "doc_id"): DataFrame = {
    import graft.functions.DetMath
    val stats = dlen.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("n"))
      .withColumn("avgdl", expr(Bm25AvgdlSql))
    val dfT = postings.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val idf = DetMath.withSteps(
        dfT.crossJoin(broadcast(stats.select("n")))
          .withColumn("__x", expr(Bm25IdfArgSql)),
        DetMath.lnSteps("__x", "__idf"))
      .select(col("t"), col("__idf"))
    postings
      .join(idf, "t")
      .join(broadcast(probeTok.select(col("probe_id"), col("t"))), "t")
      .filter(col(idCol) =!= col("probe_id"))
      .join(dlen, idCol)
      .crossJoin(broadcast(stats.select("avgdl")))
      .withColumn("__term", expr(Bm25TermSql).cast("decimal(28,12)"))
      .groupBy(col("probe_id"), col(idCol).as("cand_id"))
      .agg(sum(col("__term")).cast("double").as("__score"))
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

  /** Persist the base tier. Drops live deltas (they tokenized against
    * a base this write replaces); fingerprint marker strictly last. */
  def buildLexIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    docs: DataFrame, fingerprint: String,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Markers.delete(spark, s"$path/$LexCompleteMarker")
    DeltaGens.drop(spark, deltaRoot(path))
    val (postings, dlen) = factTables(docs, idCol, textCol)
    postings.write.mode("overwrite").parquet(s"$path/postings")
    dlen.write.mode("overwrite").parquet(s"$path/dlen")
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
    postings.write.mode("overwrite").parquet(s"$gen/postings")
    dlen.write.mode("overwrite").parquet(s"$gen/dlen")
    DeltaGens.markComplete(spark, gen, LexDeltaMarker)
  }

  /** The merged fact tables: base plus every completed generation. */
  def lexTierTables(spark: org.apache.spark.sql.SparkSession, path: String):
      (DataFrame, DataFrame) = {
    val gens = completedGens(spark, path)
    (gens.map(g => spark.read.parquet(s"${genPath(path, g)}/postings"))
       .foldLeft(spark.read.parquet(s"$path/postings"))(_ unionByName _),
      gens.map(g => spark.read.parquet(s"${genPath(path, g)}/dlen"))
        .foldLeft(spark.read.parquet(s"$path/dlen"))(_ unionByName _))
  }

  /** Probe the tier: BM25 top candidates for each probe document,
    * scored against EVERYTHING indexed (base ∪ deltas), global stats
    * recomputed from the merged tier. Probes are tokenized in-query
    * (tiny — an arrival batch). */
  def queryLexIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    probeDocs: DataFrame, dfCap: Long,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (postings, dlen) = lexTierTables(spark, path)
    val ptok = probeDocs
      .select(col(idCol).as("probe_id"), explode(Text.tokens(col(textCol))).as("t"))
      .distinct()
    bm25Scores(postings, dlen, ptok, dfCap, idCol)
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
    if (completedGens(spark, path).isEmpty) return
    val (postings, dlen) = lexTierTables(spark, path)
    val allP = postings.localCheckpoint(true)
    val allD = dlen.localCheckpoint(true)
    Markers.delete(spark, s"$path/$LexCompleteMarker")
    allP.write.mode("overwrite").parquet(s"$path/postings")
    allD.write.mode("overwrite").parquet(s"$path/dlen")
    dropLexDeltas(spark, path)
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(allP)
    org.apache.spark.sql.GraftColumnBridge.unpersistLocalCheckpoint(allD)
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
