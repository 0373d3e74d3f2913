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

  /** Decode + feature-extract: one `mapPartitions` pass (partition =
    * batch; a native codec would be initialized once per partition,
    * not per row — the reason this is not a per-row UDF). Default
    * codec: real JVM image decode with stub fallback for non-images.
    */
  def extractFeatures(media: DataFrame, nFrames: Int = 4,
      featDim: Int = 8, codec: MediaCodec = ImageIoCodec): Dataset[MediaFeature] = {
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
