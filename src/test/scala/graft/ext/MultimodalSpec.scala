package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Multimodal._

/** The multimodal pipeline's Spark-side contract: schema, batch shape,
  * determinism, resize/frame-sample math — plus the REAL codec path
  * (JDK ImageIO PNG, javax.sound WAV) round-tripped on generated
  * fixtures. Video decode remains the one stubbed modality (no JDK
  * demuxer); undecodable payloads fall back to byte math. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "a" * 100),
    (2L, "short"),
    (3L, "x" * 4096)
  ).toDF("doc_id", "text")

  test("asMedia: typed schema with binary payload and round-robin kinds") {
    val m = asMedia(docsDf)
    m.schema("payload").dataType.typeName shouldBe "binary"
    val kinds = m.select("media_id", "kind").as[(Long, String)].collect().toMap
    kinds(0L) shouldBe "image"
    kinds(1L) shouldBe "audio"
    kinds(2L) shouldBe "video"
    kinds(3L) shouldBe "image"
  }

  test("decodeFeatures: one feature row per media, payload-derived values") {
    val f = decodeFeatures(asMedia(docsDf).as[MediaRecord], batchSize = 2)
      .collect().map(x => x.media_id -> x).toMap
    f should have size 4
    f(3L).width shouldBe 64 // sqrt(4096)
    f(3L).mean_intensity shouldBe 'x'.toDouble
    f(1L).kind shouldBe "audio"
    f(1L).width shouldBe 16000
  }

  test("decodeFeatures: batch size does not change results (shape-only knob)") {
    val a = decodeFeatures(asMedia(docsDf).as[MediaRecord], batchSize = 1)
      .collect().sortBy(_.media_id).toSeq
    val b = decodeFeatures(asMedia(docsDf).as[MediaRecord], batchSize = 100)
      .collect().sortBy(_.media_id).toSeq
    a shouldBe b
  }

  test("resize caps the longest side, preserving at least 1px") {
    val f = resize(decodeFeatures(asMedia(docsDf).as[MediaRecord]), maxDim = 10)
      .collect().map(x => x.media_id -> x).toMap
    f(3L).width shouldBe 10
    f(3L).height shouldBe 10
    f(1L).width shouldBe 10 // audio 16000 → capped too (width=sample rate)
  }

  test("real codec: PNG round-trip decodes true dims and exact mean pixel") {
    val (seed, w, h) = (9L, 5, 3)
    val p = MultimodalSynth.pngPayload(seed, w, h)
    val f = decodeFeatures(
      Seq(MediaRecord(seed, "image", "image/png", p.length.toLong, p)).toDS()
    ).collect().head
    f.width shouldBe w
    f.height shouldBe h
    f.n_frames shouldBe 1
    // PNG is lossless and the sums are integer-exact in doubles, so the
    // decoded mean must equal the closed form BIT FOR BIT (the
    // mm_decode_real oracle depends on this)
    val expect = (for { y <- 0 until h; x <- 0 until w }
      yield ((seed * 31 + x * 7 + y * 13) % 256).toDouble).sum / (w * h)
    f.mean_intensity shouldBe expect
  }

  test("real codec: WAV round-trip decodes rate, channels, frames, mean sample") {
    val (seed, rate, frames) = (4L, 12000, 37)
    val p = MultimodalSynth.wavPayload(seed, rate, frames)
    val f = decodeFeatures(
      Seq(MediaRecord(seed, "audio", "audio/wav", p.length.toLong, p)).toDS()
    ).collect().head
    f.width shouldBe rate
    f.height shouldBe 1 // mono
    f.n_frames shouldBe frames
    val expect = (0 until frames).map(i => ((seed * 7 + i * 17) % 256).toDouble).sum / frames
    f.mean_intensity shouldBe expect
  }

  test("imageAHash: codec path reproduces the closed-form hash; bumped twin usually matches, junk is None") {
    val seed = 5L
    // closed-form aHash of the planted 8x8 pattern (identity pooling,
    // exact power-of-two mean) — what the decode path must reproduce
    def expectHash(bump: Int): String = {
      val cells = for { y <- 0 until 8; x <- 0 until 8 } yield
        ((seed * 31 + x * 7 + y * 13 +
          (if (x == 0 && y == 0) bump else 0)) % 256).toDouble
      val mean = cells.sum / 64
      cells.map(v => if (v > mean) '1' else '0').mkString
    }
    val base = MultimodalStub.imageAHash(
      MultimodalSynth.pngPayloadBumped(seed, 8, 8, 0)).get
    base shouldBe expectHash(0)
    base should have length 64
    // the bumped copy has DIFFERENT payload bytes but the same planted
    // pattern bar one pixel — hash per the closed form (equal here)
    val bumped = MultimodalSynth.pngPayloadBumped(seed, 8, 8, 2)
    bumped should not equal MultimodalSynth.pngPayloadBumped(seed, 8, 8, 0)
    MultimodalStub.imageAHash(bumped).get shouldBe expectHash(2)
    // non-images quarantine as None, never throw
    MultimodalStub.imageAHash(Array.fill(50)('x'.toByte)) shouldBe None
  }

  test("imageAHash: invariant under global brightness shift without wraparound") {
    // the defining perceptual property: adding a constant to every
    // pixel moves each cell and the mean together, so no threshold
    // decision can flip (values capped so +40 never wraps mod 256)
    val rng = new scala.util.Random(31)
    (1 to 5).foreach { _ =>
      val px = Array.fill(64)(rng.nextInt(200))
      def payload(offset: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        for (y <- 0 until 8; x <- 0 until 8) {
          val v = px(y * 8 + x) + offset
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      MultimodalStub.imageAHash(payload(40)).get shouldBe
        MultimodalStub.imageAHash(payload(0)).get
    }
  }

  test("audioEnergyFp: codec path reproduces the closed-form fingerprint; junk is None") {
    val seed = 11L
    def expectFp(bump: Int): String = {
      val samples = Array.tabulate(64)(i =>
        ((seed * 7 + i * 17 + (if (i == 0) bump else 0)) % 256).toDouble)
      val wins = Array.tabulate(16)(wi => samples.slice(wi * 4, wi * 4 + 4).sum / 4)
      val mean = wins.sum / 16
      wins.map(v => if (v > mean) '1' else '0').mkString
    }
    val base = MultimodalStub.audioEnergyFp(
      MultimodalSynth.wavPayloadBumped(seed, 8000, 64, 0)).get
    base shouldBe expectFp(0)
    base should have length 16
    val bumped = MultimodalSynth.wavPayloadBumped(seed, 8000, 64, 3)
    bumped should not equal MultimodalSynth.wavPayloadBumped(seed, 8000, 64, 0)
    MultimodalStub.audioEnergyFp(bumped).get shouldBe expectFp(3)
    MultimodalStub.audioEnergyFp(Array.fill(40)('z'.toByte)) shouldBe None
  }

  test("real codec: undecodable payloads fall back to byte-math features") {
    val junk = Array.fill(100)('A'.toByte) // not a PNG
    val f = decodeFeatures(
      Seq(MediaRecord(7L, "image", "image/png", 100L, junk)).toDS()
    ).collect().head
    f.width shouldBe 10 // sqrt(100): the pseudo path
    f.height shouldBe 10
    f.mean_intensity shouldBe 65.0
  }

  test("mp4Meta: synth round-trip exact; junk/truncated/empty quarantine to None") {
    for ((ts, dur, w, h, cc) <- Seq(
        (600, 1200L, 320, 240, "avc1"),
        (1000, 90000L, 1920, 1080, "hev1"),
        (700, 1230L, 480, 360, "av01"))) {
      val p = MultimodalSynth.mp4Payload(ts, dur, w, h, cc)
      MultimodalStub.mp4Meta(p) shouldBe
        Some(MultimodalStub.VideoMeta(ts, dur, w, h, cc))
    }
    MultimodalStub.mp4Meta("definitely not an mp4".getBytes("UTF-8")) shouldBe None
    MultimodalStub.mp4Meta(Array.emptyByteArray) shouldBe None
    // truncation anywhere inside moov must quarantine, not mis-parse
    val full = MultimodalSynth.mp4Payload(600, 1200L, 320, 240, "avc1")
    MultimodalStub.mp4Meta(full.take(full.length / 2)) shouldBe None
    // a box whose declared size overruns the buffer is structural junk
    val overrun = full.clone()
    overrun(full.length - 30) = 0x7f // corrupt an inner size byte
    MultimodalStub.mp4Meta(overrun) shouldBe None
  }

  test("mp4Meta: version-1 (64-bit time) mvhd/tkhd layout parses") {
    // hand-build a v1 variant: mvhd v1 carries 8-byte creation/
    // modification/duration (timescale at offset 20, duration at 24);
    // tkhd v1 shifts the 16.16 dims to offset 88
    def box(t: String, p: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + p.length)
      bb.putInt(8 + p.length); bb.put(t.getBytes("US-ASCII")); bb.put(p)
      bb.array()
    }
    val mvhd1 = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L)
      bb.putInt(90000)      // timescale @20
      bb.putLong(5400000L)  // duration @24, 64-bit
      bb.array()
    }
    val tkhd1 = {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0x01000007)
      bb.putLong(0L).putLong(0L)
      bb.putInt(1).putInt(0)
      bb.putLong(5400000L)
      bb.position(88)
      bb.putInt(1280 << 16).putInt(720 << 16)
      bb.array()
    }
    val stsd = {
      val e = java.nio.ByteBuffer.allocate(16)
      e.putInt(16); e.put("vp09".getBytes("US-ASCII"))
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.putInt(0); bb.putInt(1); bb.put(e.array())
      bb.array()
    }
    val p = box("ftyp", "isom   isom".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", mvhd1) ++ box("trak",
        box("tkhd", tkhd1) ++ box("mdia", box("minf", box("stbl", box("stsd", stsd))))))
    MultimodalStub.mp4Meta(p) shouldBe
      Some(MultimodalStub.VideoMeta(90000, 5400000L, 1280, 720, "vp09"))
  }

  test("decodeBatch video: mp4 container metadata is real, non-mp4 falls back") {
    val mp4 = MultimodalSynth.mp4Payload(600, 2400L, 640, 480, "avc1")
    val real = decodeFeatures(Seq(
      MediaRecord(1L, "video", "video/mp4", mp4.length.toLong, mp4)).toDS()
    ).collect().head
    real.width shouldBe 640
    real.height shouldBe 480
    real.n_frames shouldBe 2400 // mvhd duration ticks
    val junk = Array.fill(144)('B'.toByte)
    val fb = decodeFeatures(Seq(
      MediaRecord(2L, "video", "video/mp4", 144L, junk)).toDS()
    ).collect().head
    fb.width shouldBe 12 // sqrt(144): the pseudo path, unchanged
    fb.n_frames shouldBe math.max(1, 144 / 64)
  }

  test("frameSample reduces only video frame counts by the stride") {
    val before = decodeFeatures(asMedia(docsDf).as[MediaRecord])
    val after = frameSample(before, stride = 4)
      .collect().map(x => x.media_id -> x.n_frames).toMap
    val orig = before.collect().map(x => x.media_id -> x.n_frames).toMap
    after(2L) shouldBe math.max(1, (orig(2L) + 3) / 4)
    after(0L) shouldBe orig(0L) // image untouched
  }
}
