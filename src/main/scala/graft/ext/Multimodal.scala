package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * `binary` payloads with a typed metadata struct, and batched
  * decode/feature-extract/resize/frame-sample operators.
  *
  * The Spark-side shape is real and tested: schema, partition-preserving
  * `mapPartitions` with explicit micro-batching (the JVM twin of
  * `mapInPandas` Arrow batches), and deterministic outputs. The pixel/PCM
  * decode itself is a STUB — this container has no image/audio codecs —
  * marked in [[MultimodalStub.decodeBatch]]; a real deployment swaps that
  * one function for a codec call and nothing else changes.
  *
  * Scale notes: decode is a narrow map — no shuffle; batching bounds peak
  * memory per task (`batchSize` payloads at once, mirroring
  * `spark.sql.execution.arrow.maxRecordsPerBatch`); payload bytes never
  * hit the driver.
  */
object Multimodal {

  /** Typed record for the media frame. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,       // image | audio | video
      mime: String,
      n_bytes: Long,
      payload: Array[Byte])

  /** Extracted features (the decode output contract): fixed-width,
    * codec-agnostic. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,         // image/video: pixel dims; audio: sample rate / 1
      height: Int,
      n_frames: Int,      // 1 for stills
      mean_intensity: Double)

  /** Build the media frame from `documents`: payload = utf-8 bytes of the
    * text (the only bytes in the testdata), kind assigned round-robin by
    * doc_id so all three modalities exercise the same code path. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"), // BYTES, = payload length
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode + feature extraction: partition-preserving, processes
    * `batchSize` payloads per inner batch. */
  def decodeFeatures(media: Dataset[MediaRecord],
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(MultimodalStub.decodeBatch)
    }
  }

  /** "Resize": deterministic dimension rescale on the decoded features —
    * the post-decode transform is plain columnar math. */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = if (math.max(f.width, f.height) <= maxDim) 1.0
                  else maxDim.toDouble / math.max(f.width, f.height)
      f.copy(width = math.max(1, (f.width * scale).toInt),
             height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame sampling for video rows: keep every `stride`-th frame. */
  def frameSample(features: Dataset[MediaFeatures], stride: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      if (f.kind == "video" && f.n_frames > 1)
        f.copy(n_frames = (f.n_frames + stride - 1) / stride)
      else f
    }
  }

  /** DataFrame convenience wrapper over the typed pipeline. */
  def features(spark: SparkSession, docs: DataFrame, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    decodeFeatures(asMedia(docs).as[MediaRecord], batchSize).toDF()
  }
}

/** The codec boundary. Everything above this object is production-shaped;
  * this object is the ONLY stub. */
object MultimodalStub {
  import Multimodal._

  /** STUB decode: no image/audio libraries exist in this container, so
    * "decoding" derives deterministic pseudo-features from the payload
    * bytes (size-derived dims, byte-mean intensity). A real deployment
    * replaces the body with e.g. ImageIO/ffmpeg calls per batch — the
    * signature (Seq in → Iterator out, one batch at a time) is the real
    * contract. */
  def decodeBatch(batch: Seq[MediaRecord]): Iterator[MediaFeatures] =
    batch.iterator.map { m =>
      val n = m.payload.length
      val side = math.max(1, math.sqrt(n.toDouble).toInt)
      val mean =
        if (n == 0) 0.0
        else m.payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
      m.kind match {
        case "image" => MediaFeatures(m.media_id, m.kind, m.n_bytes, side, side, 1, mean)
        case "audio" => MediaFeatures(m.media_id, m.kind, m.n_bytes, 16000, 1, 1, mean)
        case _       => MediaFeatures(m.media_id, m.kind, m.n_bytes, side, side,
                          math.max(1, n / 64), mean)
      }
    }
}
