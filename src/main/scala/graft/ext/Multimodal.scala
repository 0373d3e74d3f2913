package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-local
  * batch transforms.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): [[StubCodec]] produces deterministic fake outputs from
  * the bytes. Everything Spark-side — schema, batching, partitioning,
  * the mapPartitions shape (the JVM analog of `mapInPandas`: one
  * iterator per partition so a real codec could batch rows into one
  * native call) — is real and tested.
  *
  * Scale notes: binary payloads make rows wide, so
  * `spark.sql.files.maxPartitionBytes` governs batch memory, and
  * transforms must never collect; feature extraction is a pure
  * projection (no shuffle), while grouping by media id for
  * frame-sampling shuffles only (id, frame_idx, feature) — never the
  * raw bytes twice.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("digest", StringType))))))

  /** Wrap a text corpus as fake media rows: content = utf-8 bytes,
    * metadata computed in-plan (no UDF).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("digest")))

  /** A decoded "frame"/feature row. */
  final case class MediaFeature(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** Codec contract: bytes in, frame/feature rows out. Implementations
    * must be serializable (they ship to executors); heavyweight native
    * state belongs in a per-partition init, not per call.
    */
  trait MediaCodec extends Serializable {
    def decodeFrames(mediaId: Long, bytes: Array[Byte], nFrames: Int,
        featDim: Int): Iterator[MediaFeature]
  }

  /** STUB codec — deterministic fake decode for payloads no JVM codec
    * understands (audio/video in this container). A real deployment
    * replaces this with JNI/FFI calls; the signature and the
    * partition-batched call pattern are what matter here.
    */
  object StubCodec extends MediaCodec {
    def decodeFrames(mediaId: Long, bytes: Array[Byte], nFrames: Int,
        featDim: Int): Iterator[MediaFeature] = {
      (0 until math.min(nFrames, 1 + bytes.length / 64)).iterator.map { f =>
        val feat = Array.tabulate(featDim) { d =>
          val idx = (f * featDim + d) % math.max(bytes.length, 1)
          val b = if (bytes.isEmpty) 0 else bytes(idx) & 0xff
          (b.toFloat / 255.0f) - 0.5f
        }
        MediaFeature(mediaId, f, 64, 64, feat)
      }
    }
  }

  /** REAL image decode via `javax.imageio` (pure JVM — PNG/JPEG/GIF/
    * BMP): "frames" are `nFrames` horizontal strips of the image (the
    * still-image stand-in for video frame-sampling, so
    * [[sampleFrames]]/[[resizeFeatures]] exercise real pixels), each
    * featurized as a `featDim`-bin normalized luminance histogram with
    * the strip's true width/height. Payloads ImageIO cannot parse fall
    * back to [[StubCodec]], so mixed binary corpora decode in one pass.
    */
  object ImageIoCodec extends MediaCodec {
    /** Magic-byte sniff (PNG/JPEG/GIF/BMP) — non-image payloads skip
      * the ImageIO reader-registry scan entirely, which matters when a
      * mixed 100 TB corpus is mostly not images.
      */
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||                  // JPEG
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        (b(0) == 'B' && b(1) == 'M'))

    def decodeFrames(mediaId: Long, bytes: Array[Byte], nFrames: Int,
        featDim: Int): Iterator[MediaFeature] = {
      val img =
        if (!looksLikeImage(bytes)) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
      if (img == null) StubCodec.decodeFrames(mediaId, bytes, nFrames, featDim)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val strips = math.min(nFrames, h)
        (0 until strips).iterator.map { f =>
          val y0 = f * h / strips
          val y1 = (f + 1) * h / strips
          val hist = new Array[Long](featDim)
          var y = y0
          while (y < y1) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              val bin = math.min((lum / 256.0 * featDim).toInt, featDim - 1)
              hist(bin) += 1
              x += 1
            }
            y += 1
          }
          val n = math.max((y1 - y0).toLong * w, 1L)
          MediaFeature(mediaId, f, w, y1 - y0,
            hist.map(c => c.toFloat / n))
        }
      }
    }
  }

  /** REAL audio decode via `javax.sound.sampled` (pure JVM — WAV/PCM):
    * "frames" are `nFrames` contiguous time segments of the sample
    * stream (the audio analog of [[ImageIoCodec]]'s horizontal strips),
    * each featurized as a `featDim`-bin normalized amplitude histogram;
    * width = the segment's sample count, height = the sample rate —
    * both read from the REAL parsed header, so a wrong parse cannot
    * hash-match an oracle. Multi-channel audio uses channel 0.
    * Non-PCM16 or unparseable payloads fall back to [[StubCodec]].
    */
  object WavCodec extends MediaCodec {
    private[ext] def parsePcm16(bytes: Array[Byte]): Option[(Array[Int], Int)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val data = ais.readAllBytes()
          val frameSize = fmt.getFrameSize // channels × 2 bytes
          val n = data.length / frameSize
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            val off = i * frameSize // channel 0 only
            samples(i) = ((data(off + 1) << 8) | (data(off) & 0xff))
            i += 1
          }
          Some((samples, fmt.getSampleRate.toInt))
        }
      } catch { case _: Exception => None }

    def decodeFrames(mediaId: Long, bytes: Array[Byte], nFrames: Int,
        featDim: Int): Iterator[MediaFeature] =
      parsePcm16(bytes) match {
        case Some((samples, rate)) if samples.nonEmpty =>
          val n = samples.length
          val strips = math.min(nFrames, n)
          (0 until strips).iterator.map { f =>
            val s0 = f * n / strips
            val s1 = (f + 1) * n / strips
            val hist = new Array[Int](featDim)
            var j = s0
            while (j < s1) {
              hist(((samples(j) + 32768) * featDim) / 65536) += 1
              j += 1
            }
            val len = math.max(s1 - s0, 1)
            MediaFeature(mediaId, f, s1 - s0, rate, hist.map(_.toFloat / len))
          }
        case _ => StubCodec.decodeFrames(mediaId, bytes, nFrames, featDim)
      }
  }

  /** Deterministic canonical PCM16 mono WAV (44-byte RIFF header +
    * little-endian samples), sample i = ((seed·2654435761 + i·40503)
    * mod 65536) − 32768 — integer arithmetic a SQL oracle replays
    * exactly, so a registry query can prove the REAL header/PCM parse
    * end-to-end (the generator writes the format by hand; the codec
    * parses it through the independent `javax.sound.sampled` stack).
    */
  def synthWavSample(seed: Long, i: Int): Int =
    (((seed * 2654435761L + i.toLong * 40503L) % 65536L) - 32768L).toInt

  /** [[synthWavSample]] with the near-dup planting knob: `variant ≠ 0`
    * overrides only the LAST 8 samples (one [[aHash64]] segment at
    * the 520-sample registry sizing), so variants of the same seed
    * perturb at most ONE gradient bit — the audio twin of
    * [[synthPngBytes]]' last-column pixel.
    */
  def synthWavSampleV(seed: Long, i: Int, nSamples: Int, variant: Int): Int =
    if (variant != 0 && i >= nSamples - 8)
      (((seed * 31L + variant.toLong * 9679L + i.toLong * 77L) % 65536L)
        - 32768L).toInt
    else synthWavSample(seed, i)

  /** Serialize PCM16 mono samples as a canonical 44-byte-header WAV —
    * the ONE place the RIFF/WAVE container layout lives (synth
    * fixtures and specs both go through it).
    */
  def wavBytes(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) { bb.putShort(samples(i).toShort); i += 1 }
    bb.array()
  }

  def synthWavBytes(seed: Long, nSamples: Int, sampleRate: Int,
      variant: Int = 0): Array[Byte] =
    wavBytes(Array.tabulate(nSamples)(
      synthWavSampleV(seed, _, nSamples, variant)), sampleRate)

  /** Perceptual AUDIO fingerprint — the aHash twin of [[dHash64]]:
    * parse the payload (real `javax.sound.sampled` PCM16 decode),
    * sum |amplitude| over `nSeg` contiguous time segments
    * (integer-exact energies), and set bit s iff energy increases
    * across the (s, s+1) segment boundary — 64 gradient bits at the
    * default 65 segments. The energy-envelope SHAPE survives what
    * byte digests can't: re-normalized volume (scaling every sample
    * preserves gradient signs), container rewrites, appended
    * silence-trims. Row-local like dHash; near-dup search is the
    * same [[graft.ext.Dedup.hammingBandedPairs]] machinery — one
    * banding implementation now serves text simhash, image dHash,
    * and audio aHash. Non-PCM16 payloads fingerprint null.
    */
  def aHash64(media: DataFrame, nSeg: Int = 65): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(nSeg >= 2 && nSeg - 1 <= 64,
      s"aHash64: $nSeg segments yield ${nSeg - 1} gradient bits — must fit one long")
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          WavCodec.parsePcm16(bytes) match {
            case Some((samples, _)) if samples.length >= nSeg =>
              val n = samples.length
              val e = new Array[Long](nSeg)
              var s = 0
              while (s < nSeg) {
                // boundaries in Long: s*n overflows Int from ~33.5M
                // samples (≈13 min at 44.1 kHz) — a realistic payload
                var i = (s.toLong * n / nSeg).toInt
                val end = ((s + 1).toLong * n / nSeg).toInt
                var acc = 0L
                while (i < end) { acc += math.abs(samples(i).toLong); i += 1 }
                e(s) = acc
                s += 1
              }
              var fp = 0L
              var b = 0
              while (b < nSeg - 1) {
                if (e(b + 1) > e(b)) fp |= 1L << b
                b += 1
              }
              (id, Some(fp))
            case _ => (id, None: Option[Long])
          }
        }
      }
      .toDF("media_id", "ahash")
  }

  /** Default multi-modality codec: sniff the container magic and route
    * — RIFF/WAVE → [[WavCodec]], image magic → [[ImageIoCodec]],
    * anything else → [[StubCodec]] (via ImageIoCodec's fallback). One
    * [[extractFeatures]] pass over a mixed image+audio+opaque corpus
    * decodes every row with the right real codec.
    */
  object MediaIoCodec extends MediaCodec {
    private def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def decodeFrames(mediaId: Long, bytes: Array[Byte], nFrames: Int,
        featDim: Int): Iterator[MediaFeature] =
      if (looksLikeWav(bytes)) WavCodec.decodeFrames(mediaId, bytes, nFrames, featDim)
      else ImageIoCodec.decodeFrames(mediaId, bytes, nFrames, featDim)
  }

  /** Decode + feature-extract: one `mapPartitions` pass (partition =
    * batch; a native codec would be initialized once per partition,
    * not per row — the reason this is not a per-row UDF). Default
    * codec: magic-byte routing to real JVM image/audio decode with
    * stub fallback for opaque payloads.
    */
  def extractFeatures(media: DataFrame, nFrames: Int = 4,
      featDim: Int = 8, codec: MediaCodec = MediaIoCodec): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.flatMap { case (id, bytes) =>
          codec.decodeFrames(id, bytes, nFrames, featDim)
        }
      }
  }

  /** Deterministic synthetic PNG: a real `w`×`h` RGB image (written
    * through `javax.imageio` — a genuine PNG byte stream, parsed back
    * through the same independent codec stack) whose pixel channels
    * are integer arithmetic a SQL oracle replays exactly:
    * {{{
    *   r(x,y) = (seed·2654435761 + 97x + 1013y) mod 256   (g, b alike)
    * }}}
    * `variant ≠ 0` overrides the single pixel (w−1, variant) with a
    * flat gray — the near-dup planting knob: one changed pixel in the
    * last column perturbs at most ONE dHash bit (only the
    * (w−2 → w−1) gradient comparison on that row sees it), so
    * variants of the same seed sit within Hamming distance 2 of each
    * other. PNG is lossless, so decode returns these exact channels.
    */
  def synthPngBytes(seed: Long, w: Int = 9, h: Int = 8,
      variant: Int = 0): Array[Byte] = {
    require(seed >= 0 && variant >= 0 && variant < h,
      s"synthPngBytes: seed/variant out of range ($seed, $variant)")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) =
          if (variant != 0 && x == w - 1 && y == variant) {
            val v = (variant * 83) % 256
            (v, v, v)
          } else (
            ((seed * 2654435761L + x * 97L + y * 1013L) % 256L).toInt,
            ((seed * 40503L + x * 53L + y * 771L) % 256L).toInt,
            ((seed * 69069L + x * 31L + y * 577L) % 256L).toInt)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The synthetic-PNG media face of an id column — seed = id/4
    * (groups of 4 share a base image), variant = id % 4 (one
    * perturbed last-column pixel each): the ONE place the planted
    * near-dup fixture contract lives on the Scala side, shared by
    * the batch image faces and the streaming image rung (their SQL
    * twin is ExtQueries' imageFpCtes). `ids`' first column must be
    * long-typed; works on batch and streaming frames alike.
    */
  def synthPngMedia(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(ids.columns.head).as[Long]
      .map(id => (id, synthPngBytes(id / 4, variant = (id % 4).toInt)))
      .toDF("media_id", "content")
  }

  /** Integer luminance (×1000): 299r + 587g + 114b — the BT.601 mix
    * kept in exact integer arithmetic so the gradient COMPARISONS
    * below (and their SQL replay) have no FP boundary cases.
    */
  private def lum1000(rgb: Int): Long =
    299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
      114L * (rgb & 0xff)

  /** Perceptual image fingerprint — dHash (difference hash): decode
    * the payload (real `javax.imageio` decode), sample a
    * `nCols`×`nRows` luminance grid (floor-index point sampling —
    * integer-exact, and the identity map when the image IS
    * 9×8), and set bit (row·(nCols−1) + col) iff luminance increases
    * left→right across the gradient pair — 64 bits at the classic
    * 9×8. Row-local per image: fingerprinting a 100 TB image corpus
    * is one scan emitting a long per row; near-dup search is then
    * [[graft.ext.Dedup.hammingBandedPairs]]' pigeonhole equi-join
    * over those longs — never pixels, never pairs of payloads. This
    * is the from-pixels near-dup path that needs NO external
    * embedding model (crops/re-encodes/watermarks survive;
    * embedding-grade semantic similarity does not — that stays
    * [[graft.ext.Dedup.embeddingNearDupPairs]]' job).
    * Payloads ImageIO cannot parse yield a null fingerprint (kept,
    * so a mixed corpus can route them elsewhere).
    */
  def dHash64(media: DataFrame, nCols: Int = 9, nRows: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require((nCols - 1) * nRows <= 64,
      s"dHash64: ${nCols - 1}x$nRows gradient bits exceed one long")
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) (id, None: Option[Long])
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var fp = 0L
            var y = 0
            while (y < nRows) {
              val py = y * h / nRows
              var x = 0
              while (x < nCols - 1) {
                val l0 = lum1000(img.getRGB(x * w / nCols, py))
                val l1 = lum1000(img.getRGB((x + 1) * w / nCols, py))
                if (l1 > l0) fp |= 1L << (y * (nCols - 1) + x)
                x += 1
              }
              y += 1
            }
            (id, Some(fp))
          }
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Frame-sample: keep every `stride`-th frame per media id. Pure
    * filter on (media_id, frame_idx) — no shuffle.
    */
  def sampleFrames(features: Dataset[MediaFeature], stride: Int): Dataset[MediaFeature] =
    features.filter(f => f.frame_idx % stride == 0)

  /** "Resize": project features to a lower dimension (stand-in for a
    * real image resize — demonstrates a typed transform over the
    * feature column).
    */
  def resizeFeatures(features: Dataset[MediaFeature], newDim: Int): Dataset[MediaFeature] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map(f => f.copy(feature = f.feature.take(newDim)))
  }
}
