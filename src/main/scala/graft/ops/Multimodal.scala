package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` payloads + typed
  * metadata structs — the Spark-side plumbing for image/audio/video
  * feature extraction at scale.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — codec libraries
  * are not present in this environment — behind `Decoder`, a pluggable
  * partition-local function. The deterministic `FakeDecoder` stands in so
  * the plumbing (schema, batch iteration, partition locality, memory
  * shape) is real and tested end-to-end; swapping in a JNI/JavaCV decoder
  * is a one-line change at the call site.
  *
  * Scale design: decode runs inside `mapPartitions` (the Scala analogue of
  * mapInPandas batch UDFs) — one decoder instance per partition, streaming
  * iterator in/out, no driver involvement, no per-row setup cost. Payload
  * columns stay off the shuffle path: metadata is extracted FIRST, then
  * only the (small) meta columns shuffle; re-join payloads by key when the
  * bytes themselves are needed downstream.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(
      mediaId: Long,
      byteLen: Int,
      contentHash: String,
      width: Int,
      height: Int,
      frameCount: Int)

  final case class MediaItem(mediaId: Long, payload: Array[Byte])

  /** Partition-local decoder: bytes -> metadata. One instance per
    * partition; must be serializable and cheap to construct. */
  trait Decoder extends Serializable {
    def decode(item: MediaItem): MediaMeta
  }

  /** Deterministic stand-in for the codec stack (see class doc). The
    * "decoded" dimensions are pure functions of the payload so results
    * are stable across engines, runs, and partitionings. */
  object FakeDecoder extends Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val n = item.payload.length
      MediaMeta(
        mediaId = item.mediaId,
        byteLen = n,
        contentHash = md5Hex(item.payload),
        width = n % 640,
        height = (n * 7) % 480,
        frameCount = n % 30 + 1)
    }
    private def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"$b%02x").mkString
  }

  /** Batch decode: binary payload column -> typed metadata Dataset.
    * Partition-parallel, streaming, no collect. */
  def decodeMeta(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder.decode(MediaItem(id, bytes)) })
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `step`-th frame). The explode happens on metadata, not payload —
    * the payload is only re-joined for the frames actually sampled. */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("mediaId"), col("contentHash"), col("frameCount"),
        explode(sequence(lit(0), col("frameCount") - 1, lit(step))).as("frame_idx"))
      .withColumn("frame_fp", md5(concat(col("contentHash"), lit(":"), col("frame_idx"))))

  /** Feature extraction stub: payload -> dense embedding. The real model
    * inference (vision/audio encoder) is STUBBED with a deterministic
    * md5-seeded pseudo-embedding; the Spark plumbing — partition-local
    * batched extraction, Array[Float] column shape, downstream ANN
    * compatibility (graft.queries.SimilarityQueries / ops.Dedup dd08
    * consume exactly this column type) — is real. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // one per partition
        it.map { case (id, bytes) =>
          // counter-mode expansion: block b = md5(payload ++ b) -> 16 floats
          val vec = new Array[Float](dim)
          var b = 0
          while (b * 16 < dim) {
            md.reset(); md.update(bytes); md.update(b.toByte)
            val digest = md.digest()
            var j = 0
            while (j < 16 && b * 16 + j < dim) {
              vec(b * 16 + j) = ((digest(j) & 0xff) - 128) / 128.0f
              j += 1
            }
            b += 1
          }
          (id, vec)
        }
      }
      .toDF(idCol, "embedding")
  }
}
