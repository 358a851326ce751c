package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Multimodal

/** Multimodal queries: the binary-column pipeline over `documents`
  * payloads. Metadata stats are oracle-checked; the decode-stub features
  * are Spark-side-deterministic but not SQL-expressible → rows-only,
  * gated by MultimodalSpec. */
object MultimodalQueries {

  /** Per-modality payload stats over the typed media frame. */
  def metaStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.asMedia(Tables.documents(spark, dir))
      .groupBy(col("kind"), col("mime"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("sum_bytes"),
        (sum(col("n_bytes")) / count(lit(1))).as("avg_bytes"))
      .orderBy("kind")

  /** Full decode pipeline: batched decode → resize to 64 → frame-sample
    * stride 4, per-media feature rows. */
  def featuresQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Multimodal.asMedia(Tables.documents(spark, dir)).as[Multimodal.MediaRecord])
    Multimodal.frameSample(Multimodal.resize(feats, maxDim = 64), stride = 4)
      .toDF()
      .orderBy("media_id")
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("mm_meta_stats", metaStats, Some("""
      WITH m AS (SELECT doc_id,
                        ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                        ['image/png','audio/wav','video/mp4'][(doc_id % 3) + 1] AS mime,
                        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                 FROM documents)
      SELECT kind, mime,
             CAST(count(*) AS BIGINT) AS n_media,
             CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
             CAST(sum(n_bytes) AS BIGINT) / count(*) AS avg_bytes
      FROM m GROUP BY 1, 2 ORDER BY 1""")),
    GQuery("mm_features", featuresQ, None)
  )
}
