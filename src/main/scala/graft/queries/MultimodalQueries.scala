package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Multimodal

/** Multimodal queries: the binary-column pipeline over `documents`
  * payloads. Both metadata stats AND the full decode→resize→frame-sample
  * feature pipeline are oracle-checked: the stub's arithmetic is
  * deterministic byte math, and the corpus is pure ASCII, so DuckDB can
  * recompute every feature from the text bytes — proving the
  * mapPartitions plumbing delivers exact per-row transforms. */
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

  /** REAL-codec round-trip: deterministic PNG / WAV payloads are encoded
    * with the JDK encoders on the executors, then decoded back through
    * [[graft.ext.MultimodalStub.decodeBatch]]'s ImageIO / javax.sound
    * path. Because the pixel/sample patterns are closed-form in `doc_id`
    * and both codecs are lossless, DuckDB recomputes every decoded
    * feature exactly — a hash-green proof that the codec path is real,
    * not byte math. */
  def decodeReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .filter(col("doc_id") < RealCap)
      .select("doc_id").as[Long]
      .map { d =>
        if (d % 2 == 0) {
          val (w, h) = (4 + (d % 5).toInt, 3 + (d % 7).toInt)
          val p = graft.ext.MultimodalSynth.pngPayload(d, w, h)
          Multimodal.MediaRecord(d, "image", "image/png", p.length.toLong, p)
        } else {
          val (rate, frames) = (8000 + (d % 4).toInt * 2000, 50 + (d % 20).toInt)
          val p = graft.ext.MultimodalSynth.wavPayload(d, rate, frames)
          Multimodal.MediaRecord(d, "audio", "audio/wav", p.length.toLong, p)
        }
      }
    Multimodal.decodeFeatures(media)
      .toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_frames"), round(col("mean_intensity"), 6).as("mean_intensity"))
      .orderBy("media_id")
  }

  private val RealCap = 120

  /** 96 planted images in 24 four-copy families: every copy shares its
    * family's 8×8 pattern with pixel (0,0) bumped by the copy index, so
    * payload BYTES differ per copy while the average-hash (usually)
    * does not — the image-dedup shape where binary-identical dedup
    * fails and perceptual dedup works. */
  private val PhashCap = 96
  private val PhashFamilies = 24

  /** IMAGE PERCEPTUAL DEDUP (round 10): the multimodal member of the
    * dedup family — byte-distinct near-copies of the same picture
    * grouped by average-hash over the REAL decoded pixels
    * ([[graft.ext.MultimodalStub.imageAHash]]: ImageIO decode → 8×8
    * pool → threshold against the exact cell mean), then the standard
    * min-id canonical per hash. The hash is 8 bytes per image, so the
    * grouping shuffle carries fixed-width keys no matter the image
    * sizes — exactly the exactGroups scale shape with the codec in
    * front. Fully hash-checked: the planted pixel patterns are
    * closed-form in doc_id, PNG is lossless, and the cell mean is a
    * power-of-two division of an integer sum (bit-exact in both
    * engines), so DuckDB recomputes every aHash bit and every group
    * decision. */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("ahash")
    Tables.documents(spark, dir)
      .filter(col("doc_id") < PhashCap)
      .select("doc_id").as[Long]
      .map { d =>
        val p = graft.ext.MultimodalSynth.pngPayloadBumped(
          d % PhashFamilies, 8, 8, (d / PhashFamilies).toInt)
        (d, graft.ext.MultimodalStub.imageAHash(p).get)
      }
      .toDF("media_id", "ahash")
      .withColumn("canonical_id", min("media_id").over(w))
      .withColumn("n_same", count(lit(1)).over(w))
      .select(col("media_id"), col("ahash"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).cast("int").as("is_dup"),
        col("n_same"))
      .orderBy("media_id")
  }

  /** Audio twin of the perceptual-dedup planting: 96 WAVs in 24
    * four-copy families, 64 frames each, sample 0 bumped per copy. 64
    * frames / 16 windows of 4 keeps every window mean a power-of-two
    * division — bit-exact cross-engine. */
  private val AudioCap = 96
  private val AudioFamilies = 24
  private val AudioFrames = 64

  /** AUDIO PERCEPTUAL DEDUP (round 10): byte-distinct near-copies of
    * the same clip grouped by the energy-profile fingerprint computed
    * through the REAL javax.sound decode path
    * ([[graft.ext.MultimodalStub.audioEnergyFp]]) — with
    * [[phashDedup]], this makes the dedup family genuinely
    * multimodal (text, embeddings, images, audio), all sharing the
    * fixed-width-key grouping shuffle shape. Fully hash-checked: the
    * planted PCM patterns are closed-form in doc_id, 8-bit WAV is
    * lossless, and every mean in the fingerprint is a power-of-two
    * division of an integer sum. */
  def audioDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    Tables.documents(spark, dir)
      .filter(col("doc_id") < AudioCap)
      .select("doc_id").as[Long]
      .map { d =>
        val p = graft.ext.MultimodalSynth.wavPayloadBumped(
          d % AudioFamilies, 8000, AudioFrames, (d / AudioFamilies).toInt)
        (d, graft.ext.MultimodalStub.audioEnergyFp(p).get)
      }
      .toDF("media_id", "fp")
      .withColumn("canonical_id", min("media_id").over(w))
      .withColumn("n_same", count(lit(1)).over(w))
      .select(col("media_id"), col("fp"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).cast("int").as("is_dup"),
        col("n_same"))
      .orderBy("media_id")
  }

  /** VIDEO CONTAINER METADATA (round 11 — closes the video third of the
    * multimodal metadata family): deterministic MP4 payloads are
    * synthesized on the executors ([[graft.ext.MultimodalSynth
    * .mp4Payload]] — real ISO 14496-12 box structure, closed-form in
    * doc_id) and parsed back through the pure-byte-math box walk
    * ([[graft.ext.MultimodalStub.mp4Meta]]): mvhd duration+timescale,
    * tkhd 16.16 dims, stsd codec fourcc. Every 7th doc (d % 7 == 3)
    * carries a junk payload that MUST quarantine (ok=false, zeroed
    * fields) — the parse-or-quarantine contract of the ingest family.
    * Fully hash-checked: the oracle recomputes each field from the
    * closed form, proving the synth→parse round trip is exact. The
    * per-row work is a narrow batched map — no shuffle; at 100 TB this
    * runs beside the scan like every decode operator here. */
  def videoMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") < VideoCap)
      .select("doc_id").as[Long]
      .map { d =>
        val p =
          if (d % 7 == 3) s"junk payload $d not an iso container".getBytes("UTF-8")
          else graft.ext.MultimodalSynth.mp4Payload(
            600 + (d % 5).toInt * 100, 1200L + d * 30L,
            320 + (d % 4).toInt * 160, 240 + (d % 4).toInt * 120,
            VideoCodecs((d % 3).toInt))
        graft.ext.MultimodalStub.mp4Meta(p) match {
          case Some(v) => (d, true, v.timescale.toLong, v.durationTicks,
            v.durationTicks * 1000L / v.timescale,
            v.width.toLong, v.height.toLong, v.codec)
          case None => (d, false, 0L, 0L, 0L, 0L, 0L, "")
        }
      }
      .toDF("media_id", "ok", "timescale", "duration_ticks", "duration_ms",
        "width", "height", "codec")
      .orderBy("media_id")
  }

  private val VideoCap = 140
  private val VideoCodecs = Seq("avc1", "hev1", "av01")

  val queries: Seq[GQuery] = Seq(
    GQuery("mm_video_meta", videoMeta, Some(s"""
      SELECT doc_id AS media_id,
             (doc_id % 7 <> 3) AS ok,
             CAST(CASE WHEN doc_id % 7 <> 3
                  THEN 600 + (doc_id % 5) * 100 ELSE 0 END AS BIGINT) AS timescale,
             CAST(CASE WHEN doc_id % 7 <> 3
                  THEN 1200 + doc_id * 30 ELSE 0 END AS BIGINT) AS duration_ticks,
             CAST(CASE WHEN doc_id % 7 <> 3
                  THEN ((1200 + doc_id * 30) * 1000) // (600 + (doc_id % 5) * 100)
                  ELSE 0 END AS BIGINT) AS duration_ms,
             CAST(CASE WHEN doc_id % 7 <> 3
                  THEN 320 + (doc_id % 4) * 160 ELSE 0 END AS BIGINT) AS width,
             CAST(CASE WHEN doc_id % 7 <> 3
                  THEN 240 + (doc_id % 4) * 120 ELSE 0 END AS BIGINT) AS height,
             CASE WHEN doc_id % 7 <> 3
                  THEN ['avc1','hev1','av01'][CAST(doc_id % 3 AS INT) + 1]
                  ELSE '' END AS codec
      FROM documents WHERE doc_id < $VideoCap ORDER BY doc_id""")),
    GQuery("mm_audio_dedup", audioDedup, Some(s"""
      WITH d AS (SELECT doc_id FROM documents WHERE doc_id < $AudioCap),
      sm AS (
        SELECT doc_id,
               list_transform(range(0, $AudioFrames), i ->
                 CAST(((doc_id % $AudioFamilies) * 7 + i * 17
                       + CASE WHEN i = 0
                              THEN doc_id // $AudioFamilies ELSE 0 END)
                      % 256 AS DOUBLE)) AS samples
        FROM d),
      wn AS (
        SELECT doc_id,
               list_transform(range(0, 16), wi ->
                 list_sum(samples[wi * 4 + 1 : wi * 4 + 4]) / 4) AS wins
        FROM sm),
      fx AS (
        SELECT doc_id AS media_id,
               array_to_string(list_transform(wins,
                 v -> CASE WHEN v > list_sum(wins) / 16 THEN '1' ELSE '0' END),
                 '') AS fp
        FROM wn)
      SELECT media_id, fp,
             min(media_id) OVER (PARTITION BY fp) AS canonical_id,
             CAST(media_id <> min(media_id) OVER (PARTITION BY fp)
                  AS INT) AS is_dup,
             count(*) OVER (PARTITION BY fp) AS n_same
      FROM fx ORDER BY media_id""")),
    GQuery("mm_phash_dedup", phashDedup, Some(s"""
      WITH d AS (SELECT doc_id FROM documents WHERE doc_id < $PhashCap),
      px AS (
        SELECT doc_id,
               flatten(list_transform(range(0, 8), y ->
                 list_transform(range(0, 8), x ->
                   CAST(((doc_id % $PhashFamilies) * 31 + x * 7 + y * 13
                         + CASE WHEN x = 0 AND y = 0
                                THEN doc_id // $PhashFamilies ELSE 0 END)
                        % 256 AS DOUBLE)))) AS cells
        FROM d),
      hx AS (
        SELECT doc_id AS media_id,
               array_to_string(list_transform(cells,
                 v -> CASE WHEN v > list_sum(cells) / 64 THEN '1' ELSE '0' END),
                 '') AS ahash
        FROM px)
      SELECT media_id, ahash,
             min(media_id) OVER (PARTITION BY ahash) AS canonical_id,
             CAST(media_id <> min(media_id) OVER (PARTITION BY ahash)
                  AS INT) AS is_dup,
             count(*) OVER (PARTITION BY ahash) AS n_same
      FROM hx ORDER BY media_id""")),
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
    GQuery("mm_features", featuresQ, Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
               ['image','audio','video'][(doc_id % 3) + 1] AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               greatest(1, CAST(floor(sqrt(octet_length(encode(text)))) AS INT)) AS side,
               list_sum(list_transform(range(1, length(text) + 1),
                                       i -> ord(text[i]))) AS bsum
        FROM documents),
      d AS (
        SELECT media_id, kind, n_bytes,
               CASE kind WHEN 'audio' THEN 16000 ELSE side END AS w,
               CASE kind WHEN 'audio' THEN 1 ELSE side END AS h,
               CASE WHEN kind = 'video' THEN greatest(1, CAST(n_bytes // 64 AS INT))
                    ELSE 1 END AS nf,
               CAST(bsum AS DOUBLE) / n_bytes AS mean_intensity
        FROM m),
      r AS (
        SELECT media_id, kind, n_bytes,
               CASE WHEN greatest(w, h) <= 64 THEN w
                    ELSE greatest(1, CAST(trunc(w * (64.0 / greatest(w, h))) AS INT))
                    END AS width,
               CASE WHEN greatest(w, h) <= 64 THEN h
                    ELSE greatest(1, CAST(trunc(h * (64.0 / greatest(w, h))) AS INT))
                    END AS height,
               CASE WHEN kind = 'video' AND nf > 1 THEN (nf + 3) // 4
                    ELSE nf END AS n_frames,
               mean_intensity
        FROM d)
      SELECT media_id, kind, n_bytes,
             CAST(width AS INT) AS width, CAST(height AS INT) AS height,
             CAST(n_frames AS INT) AS n_frames, mean_intensity
      FROM r ORDER BY media_id""")),
    GQuery("mm_decode_real", decodeReal, Some(s"""
      WITH d AS (SELECT doc_id FROM documents WHERE doc_id < $RealCap),
      img AS (
        SELECT doc_id AS media_id, 'image' AS kind,
               4 + doc_id % 5 AS width, 3 + doc_id % 7 AS height,
               1 AS n_frames,
               list_aggregate(flatten(list_transform(range(0, 3 + doc_id % 7), y ->
                 list_transform(range(0, 4 + doc_id % 5), x ->
                   CAST((doc_id * 31 + x * 7 + y * 13) % 256 AS DOUBLE)))),
                 'avg') AS m
        FROM d WHERE doc_id % 2 = 0),
      aud AS (
        SELECT doc_id AS media_id, 'audio' AS kind,
               8000 + (doc_id % 4) * 2000 AS width, 1 AS height,
               50 + doc_id % 20 AS n_frames,
               list_aggregate(list_transform(range(0, 50 + doc_id % 20),
                 i -> CAST((doc_id * 7 + i * 17) % 256 AS DOUBLE)), 'avg') AS m
        FROM d WHERE doc_id % 2 = 1),
      u AS (SELECT * FROM img UNION ALL SELECT * FROM aud)
      SELECT media_id, kind, CAST(width AS INT) AS width,
             CAST(height AS INT) AS height, CAST(n_frames AS INT) AS n_frames,
             ROUND(m, 6) AS mean_intensity
      FROM u ORDER BY media_id"""))
  )
}
