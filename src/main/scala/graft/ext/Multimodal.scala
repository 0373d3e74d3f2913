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

  /** STUB codec — deterministic fake decode. A real deployment
    * replaces `decodeFrames` with JNI/FFI calls into an image/audio
    * library; the signature (bytes in, frames out) and the
    * partition-batched call pattern are what matter here.
    */
  object StubCodec {
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

  /** Decode + feature-extract: one `mapPartitions` pass (partition =
    * batch; a native codec would be initialized once per partition,
    * not per row — the reason this is not a per-row UDF).
    */
  def extractFeatures(media: DataFrame, nFrames: Int = 4,
      featDim: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.flatMap { case (id, bytes) =>
          StubCodec.decodeFrames(id, bytes, nFrames, featDim)
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
