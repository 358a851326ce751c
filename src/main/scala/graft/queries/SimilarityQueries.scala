package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Similarity

/** Similarity-search queries over `embeddings`. The exact-kNN oracle is
  * DuckDB `list_cosine_similarity` on `::DOUBLE[]` casts — both engines
  * compute double-precision cosine and the outputs are rounded to 6
  * decimals, so the hash compare is stable while ranks use full
  * precision. */
object SimilarityQueries {

  private val K = 10
  private val NProbes = 5

  private def probes(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < NProbes)

  private def finish(knn: DataFrame): DataFrame =
    knn.select(col("probe_id"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id"))

  /** Brute-force exact kNN (window-ranked baseline). */
  def knnExact(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    finish(Similarity.knnExact(e, probes(spark, dir), K))
  }

  /** Same answer through the bounded-heap TypedImperativeAggregate — the
    * scale path (shuffle carries ≤ k rows per probe). Shares the exact-kNN
    * oracle: equivalence is hash-proved every round. */
  def knnTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    finish(Similarity.knnTopKAgg(e, probes(spark, dir), K))
  }

  /** SRP-LSH approximate kNN: bucket-pruned candidates, exact cosine
    * within the bucket. Spark-hash bucketing → rows-only; recall is gated
    * by SimilaritySpec's planted clusters. */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    finish(Similarity.knnLsh(e, probes(spark, dir), K))
  }

  /** SRP bucket occupancy — the partition-pruning histogram an operator
    * would use to pick nPlanes at scale. Rows-only. */
  def bucketStats(spark: SparkSession, dir: String): DataFrame = {
    val planes = Similarity.srpPlanes(nPlanes = 4, dim = 64)
    Tables.embeddings(spark, dir)
      .select(Similarity.srpBucket(col("embedding"), planes).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vectors"))
      .orderBy("bucket")
  }

  /** Per-label vector stats: count + exact-decimal sum of L2 norms (norms
    * are per-row IEEE doubles, identical in both engines; the cross-row
    * sum goes through DECIMAL so aggregation order can't perturb it). */
  def normStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.embeddings(spark, dir)
      .select(col("label"),
        Similarity.norm(col("embedding")).cast(DecimalType(18, 6)).as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(col("nrm")).cast("double").as("sum_norm"))
      .orderBy("label")
  }

  /** DuckDB twin of [[Similarity.srpBucket]]: the hyperplanes are literal
    * doubles (Scala's shortest-roundtrip toString → DuckDB parses back the
    * identical bits), the dot is double arithmetic — so the bucket
    * assignment itself is oracle-checkable, unlike hash-based LSH. */
  private def duckDot(vecExpr: String, plane: Seq[Double]): String = {
    val lst = plane.map(_.toString).mkString("[", ", ", "]")
    s"list_sum(list_transform(range(1, ${plane.size + 1}), i -> $vecExpr[i]::DOUBLE * ($lst)[i]))"
  }

  private def duckBucket(vecExpr: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, r) =>
      s"(CASE WHEN ${duckDot(vecExpr, p)} >= 0 THEN ${1 << r} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val knnOracle: String = s"""
      WITH p AS (SELECT vec_id AS probe_id, embedding AS pv
                 FROM embeddings WHERE vec_id < $NProbes)
      SELECT probe_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding::DOUBLE[], p.pv::DOUBLE[]) AS cos_sim,
               row_number() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.pv::DOUBLE[]) DESC,
                          e.vec_id) AS rk
        FROM embeddings e, p
        WHERE e.vec_id <> p.probe_id)
      WHERE rk <= $K
      ORDER BY probe_id, cos_sim DESC, neighbor_id"""

  val queries: Seq[GQuery] = Seq(
    GQuery("knn_exact", knnExact, Some(knnOracle)),
    GQuery("knn_topk_agg", knnTopK, Some(knnOracle)),
    GQuery("knn_lsh", knnLsh, Some {
      val planes = Similarity.srpPlanes(nPlanes = 4, dim = 64)
      s"""
      WITH b AS (SELECT vec_id, embedding,
                        ${duckBucket("embedding", planes)} AS bucket
                 FROM embeddings),
      p AS (SELECT vec_id AS probe_id, embedding AS pv, bucket
            FROM b WHERE vec_id < $NProbes)
      SELECT probe_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim FROM (
        SELECT p.probe_id, b.vec_id AS neighbor_id,
               list_cosine_similarity(b.embedding::DOUBLE[], p.pv::DOUBLE[]) AS cos_sim,
               row_number() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], p.pv::DOUBLE[]) DESC,
                          b.vec_id) AS rk
        FROM b JOIN p ON b.bucket = p.bucket AND b.vec_id <> p.probe_id)
      WHERE rk <= $K
      ORDER BY probe_id, cos_sim DESC, neighbor_id"""
    }),
    GQuery("emb_bucket_stats", bucketStats, Some {
      val planes = Similarity.srpPlanes(nPlanes = 4, dim = 64)
      s"""
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors
      FROM (SELECT ${duckBucket("embedding", planes)} AS bucket FROM embeddings)
      GROUP BY 1 ORDER BY 1"""
    }),
    GQuery("emb_norm_stats", normStats, Some("""
      SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(sum(CAST(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
                           AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm
      FROM embeddings GROUP BY 1 ORDER BY 1"""))
  )
}
