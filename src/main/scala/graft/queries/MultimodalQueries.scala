package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Multimodal-column queries: `documents.text` bytes stand in for media
  * payloads (this environment ships no media fixtures or codecs — see
  * graft.ops.Multimodal for the pluggable decoder design). The queries
  * exercise the real plumbing: binary columns, metadata extraction,
  * frame-index explosion. The column-expression forms here are the
  * codegen'd fast path; MultimodalSpec covers the mapPartitions Decoder
  * path and asserts it produces exactly these rows.
  */
object MultimodalQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- mm01: payload -> typed metadata (decode stub semantics: pure
    // function of the bytes; see Multimodal.FakeDecoder).
    "mm01_media_metadata" -> ((spark: SparkSession, dir: String) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      docs.select(
          col("media_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_hash"),
          (length(col("payload")) % 640).as("width"),
          (length(col("payload")) * 7 % 480).as("height"),
          (length(col("payload")) % 30 + 1).as("frame_count"))
        .orderBy("media_id")
    }),

    // ---- mm02: frame sampling — explode metadata (never payloads) into
    // per-frame rows; every 5th frame.
    "mm02_frame_sample" -> ((spark: SparkSession, dir: String) => {
      val meta = t(spark, dir, "documents")
        .select(col("doc_id").as("media_id"),
          md5(col("text").cast("binary")).as("content_hash"),
          (length(col("text").cast("binary")) % 30 + 1).as("frame_count"))
      meta.select(col("media_id"), col("content_hash"), col("frame_count"),
          explode(sequence(lit(0), col("frame_count") - 1, lit(5))).as("frame_idx"))
        .withColumn("frame_fp", md5(concat(col("content_hash"), lit(":"), col("frame_idx"))))
        .select(col("media_id"), col("frame_count"), col("frame_idx"), col("frame_fp"))
        .orderBy("media_id", "frame_idx")
    }),
  )

  val oracles: Map[String, String] = Map(
    "mm01_media_metadata" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS byte_len,
        |  md5(text) AS content_hash,
        |  octet_length(encode(text)) % 640 AS width,
        |  octet_length(encode(text)) * 7 % 480 AS height,
        |  octet_length(encode(text)) % 30 + 1 AS frame_count
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm02_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id, md5(text) AS content_hash,
        |    octet_length(encode(text)) % 30 + 1 AS frame_count
        |  FROM documents)
        |SELECT media_id, frame_count, frame_idx,
        |  md5(content_hash || ':' || frame_idx) AS frame_fp
        |FROM meta, unnest(range(0, frame_count, 5)) AS u(frame_idx)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
