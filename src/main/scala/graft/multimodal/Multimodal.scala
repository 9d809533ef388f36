package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns with a typed metadata struct, processed in
  * batch-shaped partition passes (the Scala analogue of `mapInPandas`).
  *
  * The decode step is a clearly-marked STUB — real image/audio codecs are not
  * on this container's classpath — implemented as a deterministic fake that
  * derives plausible metadata from the bytes. Everything AROUND the stub is
  * real and tested: the schema contract, the partition-batched UDF shape, the
  * pushdown-friendly projection (metadata-only reads never touch payload
  * bytes), and the frame-sampling operator.
  *
  * At 100 TB the payload column dominates I/O: keep it in its own parquet
  * column (columnar pruning skips it for metadata queries), partition files
  * by modality/source, and size `spark.sql.files.maxPartitionBytes` so one
  * task holds a bounded number of payloads.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Wrap a text corpus as fake media rows (UTF-8 payloads) — the test/demo
    * source standing in for real image bytes.
    */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(null).cast(MediaSchema("meta").dataType).as("meta"))

  /** STUB decode ???: a real implementation would call an image/audio codec
    * here (per partition, batch-at-a-time). The deterministic fake derives
    * metadata from payload length/first bytes so tests have stable oracles.
    * The partition-batch shape (iterate a partition, emit one decoded row per
    * input row, never materialize the partition) is the real contract.
    */
  def decodeMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields.map {
      case f if f.name == "meta" => StructField("meta", MediaSchema("meta").dataType)
      case f => f
    })
    val metaIdx = df.schema.fieldIndex("meta")
    val payloadIdx = df.schema.fieldIndex("payload")
    val modalityIdx = df.schema.fieldIndex("modality")
    df.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val meta: Row = if (payload == null) null else {
          val n = payload.length
          val h = payload.take(8).foldLeft(17)((a, b) => a * 31 + b) & 0x7fffffff
          row.getString(modalityIdx) match {
            case "image" => Row(64 + h % 1024, 64 + (h / 7) % 1024, 1, null)
            case "audio" => Row(null, null, null, Seq(8000, 16000, 44100)(h % 3))
            case _ => Row(320 + h % 640, 240 + (h / 3) % 480, 1 + n % 300, null)
          }
        }
        Row.fromSeq(row.toSeq.updated(metaIdx, meta))
      }
    }(Encoders.row(outSchema))
  }

  /** Payload feature extraction that IS fully real: byte statistics computed
    * as codegen'd expressions (no UDF) — length, entropy-proxy distinct-byte
    * count, and a content hash.
    */
  def byteFeatures(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")).cast(LongType))
      .withColumn("content_hash", md5(col("payload")))

  /** Frame sampling plumbing: every k-th frame index up to n_frames (the
    * decode of each frame would happen in the same partition pass as
    * [[decodeMeta]]). Emits (media_id, frame_idx) rows.
    */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame =
    df.filter(col("modality") === "video" && col("meta.n_frames").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** Resize planning: fit each visual payload inside `maxW × maxH` preserving
    * aspect ratio — integer arithmetic on the decoded metadata (exact:
    * `w·maxH` vs `h·maxW` cross-compare, floor-scaled target dims, never
    * upscaled). The PIXEL resample itself would run in the same partition
    * pass as [[decodeMeta]] and is part of that stub; the planning columns
    * (`target_width`/`target_height`/`resize_needed`) are real and drive
    * which payloads a pipeline re-encodes.
    */
  def resizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast(LongType)
    val h = col("meta.height").cast(LongType)
    val visual = col("modality").isin("image", "video") && w.isNotNull && h.isNotNull
    val fits = w <= maxW && h <= maxH
    // scale by the tighter axis: if w/maxW >= h/maxH (i.e. w*maxH >= h*maxW)
    // the width binds: target = (maxW, floor(h*maxW/w)); else height binds
    val widthBinds = w * maxH >= h * lit(maxW.toLong)
    val tw = when(fits, w).otherwise(when(widthBinds, lit(maxW.toLong))
      .otherwise((w * maxH).cast(LongType) / h))
    val th = when(fits, h).otherwise(when(widthBinds, (h * maxW).cast(LongType) / w)
      .otherwise(lit(maxH.toLong)))
    df.withColumn("resize_needed", when(visual, !fits))
      .withColumn("target_width", when(visual, tw.cast(IntegerType)))
      .withColumn("target_height", when(visual, th.cast(IntegerType)))
  }
}
