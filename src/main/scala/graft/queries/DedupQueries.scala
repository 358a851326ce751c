package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Dedup, Text}

/** Dedup queries over `documents`. The MinHash/SimHash signatures use
  * Spark's murmur3/xxhash64 — no DuckDB twin exists, so those queries are
  * rows-only and their semantics are gated by DedupSpec's planted
  * near-duplicates; the exact-dedup and n-gram-Jaccard queries are fully
  * oracle-checked. */
object DedupQueries {

  private val duckToks = s"regexp_extract_all(lower(text), '${Text.tokenPattern}')"

  /** Exact dedup groups (md5 of normalized token stream, min doc_id kept). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(spark, dir))
      .orderBy("fp")

  /** Same-source n-gram Jaccard: top-20 most similar in-bucket pairs over
    * a deterministic 1-in-10 document sample. Bucketing by `source` stands
    * in for the LSH bucket at oracle scale — the pair join is equi-keyed,
    * never a cross product — and the sample keeps the demonstration
    * query's in-bucket pair count bounded as sf grows (the production
    * path, `Dedup.nearDupPairs`, only ever scores LSH candidates). */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("source"),
        array_distinct(Text.ngrams(Text.tokens(col("text")), 3)).as("sh"))
    d.as("x").join(d.as("y"),
        col("x.source") === col("y.source") && col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        Dedup.jaccard(col("x.sh"), col("y.sh")).as("jaccard"))
      .filter(col("jaccard").isNotNull)
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .limit(20)
  }

  /** Per-doc MinHash-LSH candidate degree (how many other docs share ≥1
    * band bucket). Rows-only: every doc gets a row, zero-filled. */
  def nearCandidates(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.candidatePairs(docs)
    // one traversal of the pair subtree: explode both endpoints rather
    // than unioning two projections of the (expensive) LSH plan
    val degree = pairs
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    docs.select("doc_id").join(degree, Seq("doc_id"), "left")
      .na.fill(0, Seq("n_candidates"))
      .orderBy("doc_id")
  }

  /** Per-doc 64-bit SimHash fingerprint. Rows-only (Spark-specific hash). */
  def simhashQ(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("__th", Dedup.tokenHashes(Text.tokens(col("text"))))
      .select(col("doc_id"), Dedup.simhash64(col("__th")).as("simhash"))
      .orderBy("doc_id")

  val queries: Seq[GQuery] = Seq(
    GQuery("dedup_exact", exact, Some(s"""
      SELECT md5(array_to_string($duckToks, ' ')) AS fp,
             CAST(min(doc_id) AS BIGINT) AS keep_id,
             CAST(count(*) AS BIGINT) AS n_dups
      FROM documents GROUP BY 1 ORDER BY 1""")),
    GQuery("dedup_jaccard_pairs", jaccardPairs, Some(s"""
      WITH d AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM (SELECT doc_id, source, $duckToks AS toks FROM documents
              WHERE doc_id % 10 = 0))
      SELECT x.doc_id AS a_id, y.doc_id AS b_id,
             CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
                  ELSE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                       / len(list_distinct(list_concat(x.sh, y.sh))) END AS jaccard
      FROM d x JOIN d y ON x.source = y.source AND x.doc_id < y.doc_id
      ORDER BY jaccard DESC, a_id, b_id LIMIT 20""")),
    GQuery("dedup_near_candidates", nearCandidates, None),
    GQuery("dedup_simhash", simhashQ, None)
  )
}
