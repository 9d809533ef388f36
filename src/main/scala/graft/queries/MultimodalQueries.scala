package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.multimodal.Multimodal

/** Oracle coverage for the multimodal-column plumbing
  * ([[graft.multimodal.Multimodal]]): payloads are built deterministically
  * from `documents` (UTF-8 text bytes standing in for image/audio/video
  * bytes), so the byte-level operators AND the deterministic decode stub are
  * SQL-reconstructible in DuckDB.
  */
object MultimodalQueries {

  /** Byte-feature extraction over media payloads — length + md5 content hash,
    * both codegen'd expressions over the binary column (no UDF).
    */
  val mm1ByteFeatures: Q = Q(
    "mm1_byte_features",
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin) { (spark, dir) =>
    val media = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
    Multimodal.byteFeatures(media)
      .select(col("media_id"), col("modality"), col("n_bytes"), col("content_hash"))
      .orderBy(col("media_id"))
  }

  /** Frame sampling over decoded video metadata. The synthetic corpus's
    * "video" payloads are UTF-8 text, not real containers, so the decode
    * runs with `syntheticVideoMeta = true`: its deterministic
    * `n_frames = 1 + payload_bytes mod 300` lets the oracle reconstruct the
    * every-5th-frame-index explode exactly (real MP4/AVI payloads would
    * decode via the container box walks instead).
    */
  val mm2FrameSampling: Q = Q(
    "mm2_frame_sampling",
    """WITH v AS (
      |  SELECT doc_id AS media_id, 1 + octet_length(encode(text)) % 300 AS nf
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT media_id, unnest(range(0, nf, 5)) AS frame_idx
      |FROM v ORDER BY media_id, frame_idx""".stripMargin) { (spark, dir) =>
    val media = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
    Multimodal.sampleFrames(Multimodal.decodeMeta(media, syntheticVideoMeta = true), everyK = 5)
      .select(col("media_id"), col("frame_idx").cast(LongType).as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Overlapping analysis windows over "audio" payloads
    * ([[Multimodal.audioWindows]]): 1-second windows (16000 samples at the
    * synthetic 16 kHz) with 50% hop. The sample count is the deterministic
    * stand-in `1 + bytes·997 mod 100000` (the mm2 convention — real WAV
    * payloads would take it from [[Multimodal.decodeWavMeta]]'s RIFF scan
    * instead); the window arithmetic and explode shape are the real
    * operator.
    */
  val mm3AudioWindows: Q = Q(
    "mm3_audio_windows",
    """WITH a AS (
      |  SELECT doc_id AS media_id,
      |         1 + (octet_length(encode(text)) * 997) % 100000 AS ns
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT media_id,
      |  CAST(unnest(range(0, ns - 16000 + 1, 8000)) AS BIGINT) AS start_sample,
      |  CAST(unnest(range(0, ns - 16000 + 1, 8000)) + 16000 AS BIGINT) AS end_sample
      |FROM a WHERE ns >= 16000 ORDER BY media_id, start_sample""".stripMargin) { (spark, dir) =>
    val audio = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
      .filter(col("modality") === "audio")
      .withColumn("ns", (lit(1L) + (length(col("payload")) * 997L) % 100000L))
    Multimodal.audioWindows(audio, "ns", windowSamples = 16000, hopSamples = 8000)
      .orderBy(col("media_id"), col("start_sample"))
  }

  val all: Seq[Q] = Seq(mm1ByteFeatures, mm2FrameSampling, mm3AudioWindows)
}
