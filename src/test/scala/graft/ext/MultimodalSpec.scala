package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary payload + metadata struct, the
  * partition-batched stub decode, frame sampling, feature resize.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media() = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "x" * 200)).toDF("doc_id", "text"),
    "doc_id", "text")

  test("asMedia: schema, byte length, md5 digest") {
    val m = media()
    m.schema.fieldNames.toSeq shouldBe Seq("media_id", "content", "meta")
    val rows = m.select(col("media_id"), col("meta.n_bytes"), col("meta.digest"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    rows.map(r => (r._1, r._2)) shouldBe Set((1L, 11L), (2L, 200L))
    // digest matches Spark's own md5 of the text
    val want = singleValue(Seq("hello world").toDF("t").select(md5(encode(col("t"), "UTF-8"))))
    rows.find(_._1 == 1L).get._3 shouldBe want
  }

  test("extractFeatures: deterministic fake decode, frame count bounded") {
    val feats = Multimodal.extractFeatures(media(), nFrames = 3, featDim = 4)
      .collect()
    // doc 1: 11 bytes → min(3, 1 + 11/64 = 1) = 1 frame
    feats.count(_.media_id == 1L) shouldBe 1
    // doc 2: 200 bytes → min(3, 1 + 200/64 = 4) = 3 frames
    feats.count(_.media_id == 2L) shouldBe 3
    feats.foreach { f =>
      f.feature.length shouldBe 4
      f.feature.foreach { v =>
        v should be >= -0.5f
        v should be <= 0.5f
      }
    }
    // determinism: re-run yields identical features
    val again = Multimodal.extractFeatures(media(), nFrames = 3, featDim = 4)
      .collect()
    feats.sortBy(f => (f.media_id, f.frame_idx)).map(_.feature.toSeq).toSeq shouldBe
      again.sortBy(f => (f.media_id, f.frame_idx)).map(_.feature.toSeq).toSeq
  }

  test("ImageIoCodec: real PNG decode — true dims, luminance histogram per strip") {
    // 8×6 PNG, top half pure black, bottom half pure white — built with
    // java.awt so the bytes go through a REAL encode → decode cycle.
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (y < 3) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val mediaDf = Multimodal.asMedia(
      Seq((7L, "ignored")).toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("content", lit(png))
    val feats = Multimodal.extractFeatures(mediaDf, nFrames = 2, featDim = 4)
      .collect().sortBy(_.frame_idx)

    feats.length shouldBe 2
    // strip 0 = top half: 8×3, all black → all mass in bin 0
    feats(0).width shouldBe 8
    feats(0).height shouldBe 3
    feats(0).feature.toSeq shouldBe Seq(1.0f, 0.0f, 0.0f, 0.0f)
    // strip 1 = bottom half: all white → all mass in the top bin
    feats(1).feature.toSeq shouldBe Seq(0.0f, 0.0f, 0.0f, 1.0f)
  }

  test("ImageIoCodec: non-image payloads fall back to the stub decode") {
    val feats = Multimodal.extractFeatures(media(), nFrames = 3, featDim = 4,
      codec = Multimodal.ImageIoCodec).collect()
    val stub = Multimodal.extractFeatures(media(), nFrames = 3, featDim = 4,
      codec = Multimodal.StubCodec).collect()
    feats.sortBy(f => (f.media_id, f.frame_idx)).map(_.feature.toSeq).toSeq shouldBe
      stub.sortBy(f => (f.media_id, f.frame_idx)).map(_.feature.toSeq).toSeq
  }

  test("WavCodec: real PCM16 WAV decode — header dims, amplitude histogram") {
    // The generator writes the RIFF/PCM format by hand; the codec
    // parses it through the independent javax.sound.sampled stack —
    // matching features prove a real header+PCM round-trip.
    val wav = Multimodal.synthWavBytes(seed = 42L, nSamples = 200, sampleRate = 8000)
    val feats = Multimodal.WavCodec.decodeFrames(42L, wav, nFrames = 2, featDim = 4)
      .toArray.sortBy(_.frame_idx)
    feats.length shouldBe 2
    feats.foreach { f =>
      f.width shouldBe 100  // segment sample count
      f.height shouldBe 8000 // sample rate from the parsed header
      f.feature.sum shouldBe 1.0f +- 1e-6f // histogram normalized
    }
    // replay the histogram directly from the synth formula
    val expected = (0 until 100).map { i =>
      ((Multimodal.synthWavSample(42L, i) + 32768) * 4) / 65536
    }.count(_ == 0).toFloat / 100
    feats(0).feature(0) shouldBe expected
  }

  test("MediaIoCodec: mixed WAV + PNG + opaque corpus in ONE pass") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB) // all black
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rows = Seq(
      (1L, Multimodal.synthWavBytes(1L, 200, 8000)),
      (2L, baos.toByteArray),
      (3L, "just some opaque text bytes".getBytes("UTF-8")))
    val mediaDf = rows.toDF("media_id", "content")
    val feats = Multimodal.extractFeatures(mediaDf, nFrames = 2, featDim = 4)
      .collect().groupBy(_.media_id)
    feats(1L).head.height shouldBe 8000 // audio: sample rate
    feats(2L).head.width shouldBe 4     // image: true pixel width
    feats(3L).head.width shouldBe 64    // opaque: stub constants
    // each modality decoded by its real codec, not the stub
    feats(1L).map(_.frame_idx).toSet shouldBe Set(0, 1)
    feats(2L).map(_.frame_idx).toSet shouldBe Set(0, 1)
  }

  test("sampleFrames: stride filter keeps every k-th frame") {
    val feats = Multimodal.extractFeatures(media(), nFrames = 3, featDim = 2)
    val sampled = Multimodal.sampleFrames(feats, stride = 2).collect()
    sampled.map(_.frame_idx).toSet shouldBe Set(0, 2)
  }

  test("resizeFeatures: truncates the feature vector") {
    val feats = Multimodal.extractFeatures(media(), nFrames = 1, featDim = 8)
    val resized = Multimodal.resizeFeatures(feats, newDim = 3).collect()
    resized.foreach(_.feature.length shouldBe 3)
  }

  test("synthPngBytes: the PNG round trip returns the exact formula pixels") {
    val bytes = Multimodal.synthPngBytes(seed = 7L, variant = 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img.getWidth shouldBe 9
    img.getHeight shouldBe 8
    for (y <- 0 until 8; x <- 0 until 9) {
      val rgb = img.getRGB(x, y)
      val want =
        if (x == 8 && y == 3) { val v = (3 * 83) % 256; (v, v, v) }
        else (
          ((7L * 2654435761L + x * 97L + y * 1013L) % 256L).toInt,
          ((7L * 40503L + x * 53L + y * 771L) % 256L).toInt,
          ((7L * 69069L + x * 31L + y * 577L) % 256L).toInt)
      ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) shouldBe want
    }
  }

  test("dHash64: survives JPEG re-encode and 2x upscale — the real " +
      "near-dup leaks a digest can never catch") {
    import javax.imageio.ImageIO
    // a smooth-gradient 36x32 image (4x the 9x8 grid): lossy JPEG
    // perturbs pixel values but not luminance GRADIENT SIGNS, and a
    // nearest-neighbor 2x upscale preserves the sampled grid exactly
    val w = 36; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val lum = ((math.sin(x * 0.61 + y * 0.37) + 1) * 110).toInt + 16
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    def bytesOf(i: java.awt.image.BufferedImage, fmt: String) = {
      val out = new java.io.ByteArrayOutputStream()
      if (fmt == "jpg") {
        // pin the compression quality explicitly: the JRE default is
        // encoder-dependent, and the dist<=3 bound below must not
        // float with the host JDK's bundled JPEG plugin
        val writer = ImageIO.getImageWritersByFormatName("jpg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(0.9f)
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(i, null, null), param)
        writer.dispose()
        ios.close()
      } else ImageIO.write(i, fmt, out)
      out.toByteArray
    }
    val up = new java.awt.image.BufferedImage(w * 2, h * 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = up.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
    g2.drawImage(img, 0, 0, w * 2, h * 2, null)
    g2.dispose()
    val rows = Seq(
      (1L, bytesOf(img, "png")),
      (2L, bytesOf(img, "jpg")), // lossy re-encode, different bytes
      (3L, bytesOf(up, "png")))  // 2x the pixels, same content
    // the byte payloads all differ (exact digest dedup sees nothing)
    rows.map(r => java.util.Arrays.hashCode(r._2)).distinct.size shouldBe 3
    val fps = Multimodal.dHash64(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    dist(fps(1L), fps(3L)) shouldBe 0     // upscale: same sampled grid
    dist(fps(1L), fps(2L)) should be <= 3 // JPEG: within the band bound
  }

  test("aHash64: volume halving is distance 0; planted variants within " +
      "1 bit; non-audio fingerprints null") {
    // halve every sample of a synth WAV (same canonical serializer):
    // energy gradient SIGNS survive re-normalized volume exactly
    val base = Array.tabulate(520)(i => Multimodal.synthWavSample(9L, i))
    val rows = Seq(
      (1L, Multimodal.synthWavBytes(9L, 520, 8000)),
      (2L, Multimodal.wavBytes(base.map(_ / 2), 8000)),    // half volume
      (3L, Multimodal.synthWavBytes(9L, 520, 8000, variant = 2)),
      (4L, Multimodal.synthWavBytes(123L, 520, 8000)),     // unrelated
      (5L, "definitely not audio".getBytes("UTF-8")))
    val fps = Multimodal.aHash64(rows.toDF("media_id", "content"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    fps(5L) shouldBe None
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    dist(fps(1L).get, fps(2L).get) shouldBe 0      // volume-invariant
    dist(fps(1L).get, fps(3L).get) should be <= 1  // planted variant
    dist(fps(1L).get, fps(4L).get) should be > 3   // unrelated separated
  }

  test("dHash64: planted variants sit within 2 bits; banding finds every " +
      "in-group pair; non-images fingerprint null") {
    // 10 groups of 4: seed = id/4, one perturbed last-column pixel per
    // variant (≤1 dHash bit each, so in-group pairs are ≤2 bits apart)
    val rows = (0L until 40L).map(id =>
      (id, Multimodal.synthPngBytes(id / 4, variant = (id % 4).toInt))) :+
      (99L, "not an image".getBytes("UTF-8"))
    val fps = Multimodal.dHash64(rows.toDF("media_id", "content"))
    val byId = fps.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    byId(99L) shouldBe None

    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0 until 10; i <- 0 until 4; j <- i + 1 until 4)
      dist(byId(g * 4L + i).get, byId(g * 4L + j).get) should be <= 2

    // the banded join returns EXACTLY the all-pairs ground truth at
    // the same threshold (pigeonhole: dist ≤ 3 ⇒ some 16-bit chunk
    // equal, so banding loses nothing; dedup+verify adds nothing)
    val imgFps = fps.filter(col("dhash").isNotNull)
      .select(col("media_id").as("id"), col("dhash"))
    val banded = graft.ext.Dedup.hammingBandedPairs(imgFps, "dhash", 64, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val ids = (0L until 40L).toSeq
    val want = (for {
      a <- ids; b <- ids if a < b
      d = dist(byId(a).get, byId(b).get) if d <= 3
    } yield (a, b, d)).sorted
    banded.toSeq shouldBe want
    // and every planted in-group pair is present
    for (g <- 0 until 10; i <- 0 until 4; j <- i + 1 until 4)
      want.exists(p => p._1 == g * 4L + i && p._2 == g * 4L + j) shouldBe true
  }
}
