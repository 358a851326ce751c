package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * `binary` payloads with a typed metadata struct, and batched
  * decode/feature-extract/resize/frame-sample operators.
  *
  * The Spark-side shape is real and tested: schema, partition-preserving
  * `mapPartitions` with explicit micro-batching (the JVM twin of
  * `mapInPandas` Arrow batches), and deterministic outputs. Image and WAV
  * decode are REAL (JDK ImageIO / javax.sound — see
  * [[MultimodalStub.decodeBatch]]); video CONTAINER metadata is REAL
  * since round 11 ([[MultimodalStub.mp4Meta]] walks the ISO 14496-12
  * box structure in pure byte math — only per-FRAME decode remains
  * env-blocked, as the JDK ships no demuxer). Undecodable payloads fall
  * back to deterministic byte math, so a corrupt record never fails a
  * batch.
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

/** Deterministic synthetic payload builders (JDK encoders). Render →
  * encode → decode round-trips exercise the REAL codec path without any
  * external media: the pixel/sample patterns are closed-form functions of
  * the seed, so an oracle can recompute the decoded features exactly
  * (PNG and 8-bit PCM WAV are lossless). */
object MultimodalSynth {

  /** Grayscale PNG, pixel(x, y) = (seed·31 + x·7 + y·13) mod 256 in all
    * three channels. */
  def pngPayload(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[pngPayload]] with pixel (0, 0) offset by `bump` (mod 256) — the
    * near-duplicate twin generator for perceptual-hash tests: same
    * pattern, one perturbed pixel, so the encoded bytes differ while
    * the average-hash usually does not. */
  def pngPayloadBumped(seed: Long, w: Int, h: Int, bump: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (seed * 31 + x * 7 + y * 13) % 256
        val v = ((base + (if (x == 0 && y == 0) bump else 0)) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[wavPayload]] with sample 0 offset by `bump` (mod 256) — the
    * audio near-duplicate twin generator, mirroring
    * [[pngPayloadBumped]]. */
  def wavPayloadBumped(seed: Long, sampleRate: Int, nFrames: Int,
                       bump: Int): Array[Byte] = {
    val data = Array.tabulate[Byte](nFrames) { i =>
      (((seed * 7 + i * 17) + (if (i == 0) bump else 0)) % 256).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Minimal valid MP4 container in pure byte math — `ftyp` +
    * `moov(mvhd, trak(tkhd, mdia(minf(stbl(stsd)))))`, every box a
    * big-endian [size:4][type:4][payload] frame per ISO 14496-12. No
    * media samples (no `mdat`): this is the CONTAINER-metadata surface —
    * duration/timescale (mvhd), track dims as 16.16 fixed point (tkhd),
    * codec fourcc (stsd sample entry) — which is all that is parseable
    * without a demuxer and exactly what [[MultimodalStub.mp4Meta]]
    * extracts. Deterministic: the bytes are a closed-form function of
    * the arguments, so an oracle recomputes every parsed field. */
  def mp4Payload(timescale: Int, duration: Long, w: Int, h: Int,
                 fourcc: String): Array[Byte] = {
    require(fourcc.length == 4, s"fourcc must be 4 chars: $fourcc")
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(tpe.getBytes("US-ASCII"))
      bb.put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // version-0 layout
      bb.putInt(0)                    // version + flags
      bb.putInt(0).putInt(0)          // creation, modification
      bb.putInt(timescale)
      bb.putInt(duration.toInt)
      bb.putInt(0x00010000)           // rate 1.0
      bb.putShort(0x0100.toShort)     // volume 1.0
      bb.position(36)                 // reserved(10) skipped
      // identity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.position(96)                 // pre_defined(24) skipped
      bb.putInt(2)                    // next_track_ID
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84) // version-0 layout
      bb.putInt(7)                    // version 0, flags: enabled|in-movie|in-preview
      bb.putInt(0).putInt(0)          // creation, modification
      bb.putInt(1)                    // track_ID
      bb.putInt(0)                    // reserved
      bb.putInt(duration.toInt)
      bb.position(40)                 // reserved(8)+layer+alt+volume+reserved skipped
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.putInt(w << 16)              // width, 16.16 fixed
      bb.putInt(h << 16)              // height, 16.16 fixed
      box("tkhd", bb.array())
    }
    val stsd = {
      val entry = java.nio.ByteBuffer.allocate(16)
      entry.putInt(16)
      entry.put(fourcc.getBytes("US-ASCII"))
      entry.position(14)              // reserved(6) skipped
      entry.putShort(1)               // data_reference_index
      val bb = java.nio.ByteBuffer.allocate(8 + 16)
      bb.putInt(0)                    // version + flags
      bb.putInt(1)                    // entry_count
      bb.put(entry.array())
      box("stsd", bb.array())
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isommp41".getBytes("US-ASCII"))
    val moov = box("moov", mvhd ++ box("trak",
      tkhd ++ box("mdia", box("minf", box("stbl", stsd)))))
    ftyp ++ moov
  }

  /** Mono 8-bit unsigned PCM WAV, sample(i) = (seed·7 + i·17) mod 256. */
  def wavPayload(seed: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
    val data = Array.tabulate[Byte](nFrames)(i => ((seed * 7 + i * 17) % 256).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 8, 1, false, false) // 8-bit WAV PCM is unsigned
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}

/** The codec boundary. Image (PNG/BMP/GIF — whatever `javax.imageio`
  * registers) and WAV audio decode are REAL, using only JDK built-ins;
  * payloads the codecs reject fall back to deterministic byte-math
  * pseudo-features so a mixed/corrupt corpus still yields a row per
  * record (production behaviour: quarantine-by-feature, never
  * fail-the-batch). Video container METADATA is real too ([[mp4Meta]],
  * round 11: pure byte math over the box structure); only per-frame
  * decode needs a demuxer the JDK does not ship — swapping in an
  * ffmpeg JNI call touches only this object. */
object MultimodalStub {
  import Multimodal._

  /** Decode one micro-batch. Real codec first, byte-math fallback:
    *  - image: `ImageIO.read` → true width/height + mean pixel
    *    intensity (grayscale, 0-255) over all bands;
    *  - audio/wav: `javax.sound.sampled` → sample rate as `width`,
    *    channels as `height`, PCM frame count as `n_frames`, mean
    *    unsigned PCM byte as intensity;
    *  - video and undecodable payloads: size-derived dims + byte mean
    *    (deterministic, flagged by nothing but their kind — callers that
    *    must distinguish real-decoded rows filter on kind).
    * The signature (Seq in → Iterator out) is the batch contract the
    * Spark plumbing relies on; swapping in an ffmpeg JNI call for video
    * touches only this object. */
  def decodeBatch(batch: Seq[MediaRecord]): Iterator[MediaFeatures] =
    batch.iterator.map { m =>
      (m.kind match {
        case "image" => decodeImage(m)
        case "audio" => decodeWav(m)
        case "video" => decodeVideoMeta(m) // container metadata (round 11)
        case _       => None
      }).getOrElse(pseudoFeatures(m))
    }

  /** Video rows through the REAL mp4 container parse ([[mp4Meta]]):
    * true track dims from tkhd, `n_frames` = mvhd duration in timescale
    * ticks (the honest container-level time axis — per-frame counts
    * need a demuxer the JDK does not ship), mean = payload byte mean.
    * Non-mp4 payloads fall through to [[pseudoFeatures]] as before. */
  private def decodeVideoMeta(m: MediaRecord): Option[MediaFeatures] =
    mp4Meta(m.payload).map { v =>
      val mean =
        if (m.payload.isEmpty) 0.0
        else m.payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / m.payload.length
      MediaFeatures(m.media_id, m.kind, m.n_bytes, v.width, v.height,
        math.max(1, v.durationTicks.toInt), mean)
    }

  /** Average-hash (aHash) of an image payload through the REAL codec:
    * decode with ImageIO, average-pool the pixel grid (per-pixel band
    * mean) into 8×8 cells on integer block boundaries, threshold every
    * cell against the global cell mean, and emit the 64 bits row-major
    * as a '0'/'1' string — portable across engines with no sign games
    * on bit 63. For an 8×8 input the pooling is the identity and the
    * global mean is sum/64 (a power-of-two division of an integer sum:
    * EXACT in IEEE double, so the strict `>` threshold is
    * engine-independent — the property the oracle leans on); images
    * smaller than 8 on a side pool overlapping 1-pixel blocks, larger
    * ones average true blocks. Returns None when the codec rejects the
    * payload (callers quarantine, never crash — same contract as
    * [[decodeBatch]]). */
  def imageAHash(payload: Array[Byte]): Option[String] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      Option(img).map { i =>
        val raster = i.getRaster
        val (w, h, bands) = (i.getWidth, i.getHeight, raster.getNumBands)
        val cells = new Array[Double](64)
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
            val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
            var sum = 0.0
            var n = 0
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                var b = 0
                var px = 0.0
                while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
                sum += px / bands; n += 1
                x += 1
              }
              y += 1
            }
            cells(by * 8 + bx) = if (n == 0) 0.0 else sum / n
            bx += 1
          }
          by += 1
        }
        val mean = cells.sum / 64
        cells.map(v => if (v > mean) '1' else '0').mkString
      }
    } catch { case _: Exception => None }

  /** Energy-profile fingerprint of a WAV payload through the REAL
    * javax.sound decode path — the audio sibling of [[imageAHash]]:
    * the unsigned PCM samples split into `nWindows` contiguous windows
    * (integer block boundaries), each window's mean amplitude
    * thresholded against the global mean, bits emitted in window order
    * as a '0'/'1' string. When the frame count divides evenly into
    * windows whose sizes are powers of two (the planted corpus: 64
    * frames / 16 windows of 4), every mean is a power-of-two division
    * of an integer sum — bit-exact in IEEE double in any engine, which
    * is what the oracle leans on. None when the payload is not
    * decodable audio. */
  def audioEnergyFp(payload: Array[Byte], nWindows: Int = 16): Option[String] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val pcm = in.readAllBytes()
        if (pcm.isEmpty) None
        else {
          val n = pcm.length
          val wins = Array.tabulate(nWindows) { wi =>
            val i0 = wi * n / nWindows
            val i1 = math.max(i0 + 1, (wi + 1) * n / nWindows)
            var sum = 0L
            var i = i0
            while (i < math.min(i1, n)) { sum += (pcm(i) & 0xff); i += 1 }
            sum.toDouble / (math.min(i1, n) - i0)
          }
          val mean = wins.sum / nWindows
          Some(wins.map(v => if (v > mean) '1' else '0').mkString)
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Parsed MP4 container metadata (no demuxer required — pure byte
    * math over the ISO 14496-12 box structure). */
  final case class VideoMeta(
      timescale: Int, durationTicks: Long, width: Int, height: Int,
      codec: String)

  /** MP4 box walk: top-level scan for `moov`, then `mvhd`
    * (duration + timescale), `trak`→`tkhd` (16.16 fixed-point dims) and
    * `trak`→`mdia`→`minf`→`stbl`→`stsd` (first sample entry's fourcc).
    * Handles version-0 AND version-1 (64-bit time) mvhd/tkhd layouts,
    * `size == 1` largesize boxes, and `size == 0` extend-to-end boxes;
    * any structural violation (truncated box, missing moov/mvhd/tkhd/
    * stsd, size under 8) returns None — callers quarantine, never
    * crash, the same contract as [[decodeBatch]]. This closes the video
    * third of the metadata family: the JDK ships no mp4 DEMUXER (frame
    * decode stays env-blocked like the Kafka jar), but the container
    * metadata is deterministic byte math, the same shape the PNG/WAV
    * work proved through real codecs. */
  def mp4Meta(payload: Array[Byte]): Option[VideoMeta] = {
    def u32(o: Int): Long =
      if (o + 4 > payload.length) -1L
      else ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def u64(o: Int): Long =
      if (o + 8 > payload.length) -1L else (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String =
      if (o + 4 > payload.length) ""
      else new String(payload, o, 4, "US-ASCII")
    // find the first child box of `tpe` in [from, until); returns
    // (payloadStart, payloadEnd) of the box body
    def find(tpe: String, from: Int, until: Int): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= until) {
        val size = u32(o)
        val t = fourcc(o + 4)
        val (bodyStart, boxEnd) =
          if (size == 1L) (o + 16, o + u64(o + 8)) // largesize
          else if (size == 0L) (o + 8, until.toLong) // to end of enclosing
          else (o + 8, o + size)
        if (size != 0L && (boxEnd < bodyStart || boxEnd > until)) return None
        if (t == tpe) return Some((bodyStart, boxEnd.toInt))
        if (boxEnd <= o) return None // non-advancing box: corrupt
        o = boxEnd.toInt
      }
      None
    }
    try {
      for {
        (moovS, moovE) <- find("moov", 0, payload.length)
        (mvhdS, _) <- find("mvhd", moovS, moovE)
        (trakS, trakE) <- find("trak", moovS, moovE)
        (tkhdS, _) <- find("tkhd", trakS, trakE)
        (mdiaS, mdiaE) <- find("mdia", trakS, trakE)
        (minfS, minfE) <- find("minf", mdiaS, mdiaE)
        (stblS, stblE) <- find("stbl", minfS, minfE)
        (stsdS, _) <- find("stsd", stblS, stblE)
        mvhdV = payload(mvhdS) & 0xff
        ts = if (mvhdV == 1) u32(mvhdS + 20) else u32(mvhdS + 12)
        dur = if (mvhdV == 1) u64(mvhdS + 24) else u32(mvhdS + 16)
        tkhdV = payload(tkhdS) & 0xff
        dimOff = if (tkhdV == 1) tkhdS + 88 else tkhdS + 76
        w = u32(dimOff) >> 16
        h = u32(dimOff + 4) >> 16
        cc = fourcc(stsdS + 12) // v+flags(4), entry_count(4), entry size(4)
        if ts > 0 && dur >= 0 && w >= 0 && h >= 0 && cc.length == 4
      } yield VideoMeta(ts.toInt, dur, w.toInt, h.toInt, cc)
    } catch { case _: Exception => None }
  }

  private def decodeImage(m: MediaRecord): Option[MediaFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      Option(img).map { i =>
        val raster = i.getRaster
        val (w, h, bands) = (i.getWidth, i.getHeight, raster.getNumBands)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            var px = 0.0
            while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
            sum += px / bands
            x += 1
          }
          y += 1
        }
        MediaFeatures(m.media_id, m.kind, m.n_bytes, w, h, 1,
          if (w * h == 0) 0.0 else sum / (w.toLong * h))
      }
    } catch { case _: Exception => None }

  private def decodeWav(m: MediaRecord): Option[MediaFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val pcm = in.readAllBytes()
        val mean =
          if (pcm.isEmpty) 0.0
          else pcm.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / pcm.length
        Some(MediaFeatures(m.media_id, m.kind, m.n_bytes,
          fmt.getSampleRate.toInt, fmt.getChannels,
          math.max(1, frames.toInt), mean))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic byte-math features — the pre-codec behaviour, kept as
    * the fallback so undecodable payloads (and the video stub) still
    * produce stable, oracle-checkable rows. */
  private def pseudoFeatures(m: MediaRecord): MediaFeatures = {
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
