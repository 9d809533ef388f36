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

  /** Multimodal sequence-length budgeting — the accounting a multimodal
    * pretraining loader runs BEFORE packing: each example's effective
    * token length = caption text tokens + its modality's token cost
    * (image → ViT-14 patch grid ⌈w/14⌉·⌈h/14⌉ from the decoded dims;
    * audio → 25 tokens per mm3 analysis window; video → 64 patch tokens
    * per mm2-sampled frame), reported per modality with the count that
    * would overflow a 4096-token context (the truncate/tile planning
    * number). Same synthetic-meta conventions as mm1–mm3 (deterministic
    * dims from payload bytes), so the oracle replays the arithmetic
    * exactly; all integer, one map-side projection + one 3-key aggregate.
    */
  val mm4SequenceBudget: Q = Q(
    "mm4_sequence_budget",
    """WITH m AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS txt
      |  FROM documents),
      |t AS (SELECT media_id, modality, txt,
      |    CASE modality
      |      WHEN 'image' THEN
      |        ((112 + nb % 400 + 13) // 14) * ((112 + (nb * 31) % 400 + 13) // 14)
      |      WHEN 'audio' THEN
      |        CASE WHEN 1 + (nb * 997) % 100000 >= 16000
      |             THEN ((1 + (nb * 997) % 100000 - 16000) // 8000 + 1) * 25
      |             ELSE 0 END
      |      ELSE ((1 + nb % 300 + 4) // 5) * 64
      |    END AS modal_tokens
      |  FROM m)
      |SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_examples,
      |  CAST(SUM(txt + modal_tokens) AS BIGINT) AS total_tokens,
      |  CAST(MAX(txt + modal_tokens) AS BIGINT) AS max_len,
      |  CAST(SUM(CASE WHEN txt + modal_tokens > 4096 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_over_budget
      |FROM t GROUP BY modality ORDER BY modality""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.LongType
    val m = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
      .withColumn("nb", length(col("payload")).cast(LongType))
      .withColumn("txt", graft.operators.TextAnalysis
        .tokenCount(decode(col("payload"), "UTF-8")).cast(LongType))
    val modalTokens =
      when(col("modality") === "image",
        expr("((112 + nb % 400 + 13) div 14) * ((112 + (nb * 31) % 400 + 13) div 14)"))
      .when(col("modality") === "audio",
        when(lit(1L) + (col("nb") * 997) % 100000 >= 16000,
          (expr("(1 + (nb * 997) % 100000 - 16000) div 8000") + 1) * 25)
          .otherwise(0L))
      .otherwise(expr("((1 + nb % 300 + 4) div 5) * 64"))
    m.withColumn("modal_tokens", modalTokens)
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_examples"),
        sum(col("txt") + col("modal_tokens")).as("total_tokens"),
        max(col("txt") + col("modal_tokens")).as("max_len"),
        sum(when(col("txt") + col("modal_tokens") > 4096, 1L).otherwise(0L))
          .as("n_over_budget"))
      .orderBy(col("modality"))
  }

  /** Dynamic high-res tiling plan ([[Multimodal.tilingPlan]]): per image,
    * the LLaVA-NeXT-style grid pick from the gx·gy ≤ 6 candidate set at
    * tile 336 / patch 14 — aspect-preserving integer scale-to-fit, waste
    * minimized, ties to fewer tiles then smaller gx. Synthetic dims derive
    * from payload bytes exactly as mm4's image branch, so the oracle
    * replays the whole plan bit-for-bit (select_best_resolution: max
    * effective resolution capped at the original, then min waste).
    */
  val mm5TilingPlan: Q = Q(
    "mm5_tiling_plan",
    """WITH img AS (SELECT doc_id AS media_id,
      |    CAST(112 + octet_length(encode(text)) % 400 AS BIGINT) AS w,
      |    CAST(112 + (octet_length(encode(text)) * 31) % 400 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |g(gx, gy) AS (VALUES (1,1),(1,2),(1,3),(1,4),(1,5),(1,6),
      |  (2,1),(2,2),(2,3),(3,1),(3,2),(4,1),(5,1),(6,1)),
      |e AS (SELECT media_id, w, h,
      |    CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
      |    CAST(gx * 336 AS BIGINT) AS cw, CAST(gy * 336 AS BIGINT) AS ch
      |  FROM img CROSS JOIN g),
      |s AS (SELECT media_id, w, h, gx, gy, cw, ch,
      |    CASE WHEN w * ch >= h * cw THEN cw ELSE w * ch // h END AS scaled_w,
      |    CASE WHEN w * ch >= h * cw THEN h * cw // w ELSE ch END AS scaled_h,
      |    gx * gy AS n_tiles
      |  FROM e),
      |r AS (SELECT media_id, w, h, gx, gy, n_tiles, scaled_w, scaled_h,
      |    cw * ch - scaled_w * scaled_h AS waste,
      |    ROW_NUMBER() OVER (PARTITION BY media_id
      |      ORDER BY LEAST(scaled_w * scaled_h, w * h) DESC,
      |        cw * ch - scaled_w * scaled_h, gx * gy, gx) AS rn
      |  FROM s)
      |SELECT media_id, w, h, gx AS grid_x, gy AS grid_y,
      |  CAST(n_tiles AS BIGINT) AS n_tiles, scaled_w, scaled_h, waste,
      |  CAST(n_tiles * 576 AS BIGINT) AS n_patches
      |FROM r WHERE rn = 1 ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.LongType
    val img = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
      .filter(col("modality") === "image")
      .withColumn("nb", length(col("payload")).cast(LongType))
      .select(col("media_id"),
        (lit(112L) + col("nb") % 400).as("w"),
        (lit(112L) + (col("nb") * 31) % 400).as("h"))
    Multimodal.tilingPlan(img, "media_id", "w", "h",
        tileSize = 336, maxTiles = 6, patchSize = 14)
      .orderBy(col("media_id"))
  }

  /** Modality quality gate ([[Multimodal.modalityQualityGate]]): the
    * loader pre-filter over decoded media metadata — per (modality,
    * verdict) counts and exact ppm shares under pinned-precedence integer
    * threshold rules (image min-dim → aspect; audio/video min length).
    * Meta derives from the payload bytes by the mm4 synthetic-meta
    * conventions, so the oracle replays rules, counts, and shares
    * exactly.
    */
  val mm6QualityGate: Q = Q(
    "mm6_quality_gate",
    """WITH m AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |meta AS (SELECT media_id, modality,
      |    112 + nb % 400 AS w, 112 + (nb * 31) % 400 AS h,
      |    1 + (nb * 997) % 100000 AS ns, 1 + nb % 300 AS nf
      |  FROM m),
      |v AS (SELECT modality,
      |    CASE modality
      |      WHEN 'image' THEN
      |        CASE WHEN LEAST(w, h) < 128 THEN 'too_small'
      |             WHEN w > h * 3 OR h > w * 3 THEN 'extreme_aspect'
      |             ELSE 'keep' END
      |      WHEN 'audio' THEN
      |        CASE WHEN ns < 16000 THEN 'too_short' ELSE 'keep' END
      |      ELSE CASE WHEN nf < 10 THEN 'too_short' ELSE 'keep' END
      |    END AS verdict
      |  FROM meta),
      |c AS (SELECT modality, verdict, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM v GROUP BY modality, verdict)
      |SELECT modality, verdict, n,
      |  CAST((1000000 * n) // SUM(n) OVER (PARTITION BY modality) AS BIGINT) AS share_ppm
      |FROM c ORDER BY modality, verdict""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.LongType
    val meta = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
      .withColumn("nb", length(col("payload")).cast(LongType))
      .select(col("media_id"), col("modality"),
        (lit(112L) + col("nb") % 400).as("w"),
        (lit(112L) + (col("nb") * 31) % 400).as("h"),
        (lit(1L) + (col("nb") * 997) % 100000).as("nsamples"),
        (lit(1L) + col("nb") % 300).as("nframes"))
    Multimodal.modalityQualityGate(meta)
      .orderBy(col("modality"), col("verdict"))
  }

  /** Frame-sampling plan with REAL container timestamps
    * ([[Multimodal.frameTimestamps]]): each video's payload is a genuine
    * minimal ISO-BMFF file ([[Multimodal.buildMp4]] — deterministic params
    * from the byte count, but real box grammar), decoded by the REAL
    * `mdhd`+`stts` box walk ([[Multimodal.decodeMp4Timing]]), then every
    * 5th frame gets its stts-derived presentation timestamp in ticks and
    * floor-div microseconds. The corpus convention: `nf = 1 + bytes mod
    * 300` frames at timescale 600, split into TWO stts runs — the first
    * ⌈nf/2⌉ frames at 20 ticks, the rest at 40 (variable frame duration is
    * the case that makes stts non-trivial) — so the oracle replays the
    * timestamp arithmetic without parsing bytes, while the Spark side
    * actually round-trips through container bytes. All integer.
    */
  val mm7FrameTimestamps: Q = Q(
    "mm7_frame_timestamps",
    """WITH v AS (SELECT doc_id AS media_id,
      |    1 + octet_length(encode(text)) % 300 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |p AS (SELECT media_id, nf, (nf + 1) // 2 AS h FROM v),
      |f AS (SELECT media_id, h,
      |    CAST(unnest(range(0, nf, 5)) AS BIGINT) AS frame_idx FROM p),
      |t AS (SELECT media_id, frame_idx,
      |    CAST(CASE WHEN frame_idx < h THEN frame_idx * 20
      |         ELSE h * 20 + (frame_idx - h) * 40 END AS BIGINT) AS pts_ticks
      |  FROM f)
      |SELECT media_id, frame_idx, pts_ticks,
      |  (pts_ticks * 1000000) // 600 AS pts_us
      |FROM t ORDER BY media_id, frame_idx""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val vids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("nb"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType)))
    val media = vids.mapPartitions { it =>
      it.map { r =>
        val nf = 1L + r.getLong(1) % 300L
        val h = (nf + 1) / 2
        val runs = if (nf > h) Seq((h, 20L), (nf - h, 40L)) else Seq((h, 20L))
        Row(r.getLong(0), "video", Multimodal.buildMp4(640, 360, 600L, runs))
      }
    }(Encoders.row(schema))
    Multimodal.frameTimestamps(Multimodal.videoTiming(media), everyK = 5)
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** CLIP-score-style image–text pair gating
    * ([[Multimodal.imageTextGate]]): each document's stored embedding
    * plays the image side; the text side is a deterministic 64-dim
    * pseudo-embedding from the byte count (`((nb·(2i+1)·7919) mod
    * 1000003)/1000003 − 0.5` — integer arithmetic then one exact double
    * division, so both engines build bit-identical vectors). The gate is
    * cosine ≥ 0.05 with sequential-fold dot products (the sim1 exactness
    * convention), emitted per pair so the gate DECISION is oracle-checked
    * row by row, not just in aggregate.
    */
  val mm8ClipGate: Q = Q(
    "mm8_clip_gate",
    """WITH d AS (SELECT doc_id, source,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb FROM documents),
      |p AS (SELECT d.doc_id AS media_id, d.source,
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    list_transform(range(0, 64),
      |      i -> ((d.nb * (2*i + 1) * 7919) % 1000003) / 1000003.0 - 0.5) AS t
      |  FROM d JOIN embeddings e ON e.vec_id = d.doc_id),
      |s AS (SELECT media_id, source,
      |    list_sum(list_transform(range(1, 65), i -> v[i]*t[i])) /
      |    (sqrt(list_sum(list_transform(range(1, 65), i -> v[i]*v[i]))) *
      |     sqrt(list_sum(list_transform(range(1, 65), i -> t[i]*t[i])))) AS clip_score
      |  FROM p)
      |SELECT media_id, source, clip_score, clip_score >= 0.05 AS kept
      |FROM s ORDER BY media_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("source"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("nb"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("media_id"), col("embedding"))
    // `D` suffixes: a bare `1000003.0` literal is DECIMAL in Spark SQL and
    // the division would round through decimal(31,9) before reaching double
    val pairs = docs.join(emb, "media_id")
      .withColumn("txt_vec", expr(
        "transform(sequence(0L, 63L), i -> ((nb * (2*i + 1) * 7919) % 1000003) / 1000003.0D - 0.5D)"))
    Multimodal.imageTextGate(pairs, "embedding", "txt_vec", threshold = 0.05)
      .select(col("media_id"), col("source"), col("clip_score"), col("kept"))
      .orderBy(col("media_id"))
  }

  /** Resize planning ([[Multimodal.resizePlan]]) — the payload-rewrite
    * decision pass: fit every image inside 256×224 preserving aspect,
    * never upscaling. Synthetic dims follow the mm4 conventions (so the
    * oracle replays them); the plan arithmetic is the real operator —
    * integer cross-compare for which axis binds, floor-div target dims.
    * One codegen'd projection, no shuffle; at 100 TB this decides which
    * payloads the [[Multimodal.resizeImages]] rewrite pass touches.
    */
  val mm9ResizePlan: Q = Q(
    "mm9_resize_plan",
    """WITH img AS (SELECT doc_id AS media_id,
      |    CAST(112 + octet_length(encode(text)) % 400 AS BIGINT) AS w,
      |    CAST(112 + (octet_length(encode(text)) * 31) % 400 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |p AS (SELECT media_id, w, h,
      |    (w <= 256 AND h <= 224) AS fits,
      |    (w * 224 >= h * 256) AS wb
      |  FROM img)
      |SELECT media_id, w, h, NOT fits AS resize_needed,
      |  CAST(CASE WHEN fits THEN w WHEN wb THEN 256 ELSE (w * 224) // h END AS INT)
      |    AS target_width,
      |  CAST(CASE WHEN fits THEN h WHEN wb THEN (h * 256) // w ELSE 224 END AS INT)
      |    AS target_height
      |FROM p ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val img = Multimodal.fromDocuments(Tables.documents(spark, dir), "doc_id", "text")
      .filter(col("modality") === "image")
      .withColumn("nb", length(col("payload")).cast(LongType))
      .withColumn("meta", struct(
        (lit(112L) + col("nb") % 400).cast(IntegerType).as("width"),
        (lit(112L) + (col("nb") * 31) % 400).cast(IntegerType).as("height"),
        lit(1).as("n_frames"),
        lit(null).cast(IntegerType).as("sample_rate")))
    Multimodal.resizePlan(img, maxW = 256, maxH = 224)
      .select(col("media_id"),
        col("meta.width").cast(LongType).as("w"),
        col("meta.height").cast(LongType).as("h"),
        col("resize_needed"), col("target_width"), col("target_height"))
      .orderBy(col("media_id"))
  }

  /** Constant-frame-rate segment view ([[Multimodal.videoSegments]]):
    * per video, one row per `stts` run — boundaries are where the frame
    * duration changes (edit/splice points in real footage), the
    * codec-free scene-segmentation stand-in. Same real-container
    * round-trip as mm7 (buildMp4 → decodeMp4Timing), same two-run
    * corpus convention, so the oracle replays ordinals, frame counts,
    * tick deltas, and floor-div µs starts/durations arithmetically.
    */
  val mm10VideoSegments: Q = Q(
    "mm10_video_segments",
    """WITH v AS (SELECT doc_id AS media_id,
      |    1 + octet_length(encode(text)) % 300 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |p AS (SELECT media_id, nf, (nf + 1) // 2 AS h FROM v),
      |s AS (
      |  SELECT media_id, 0 AS seg_idx, 0 AS first_frame, h AS n_frames,
      |         20 AS frame_ticks, 0 AS start_ticks FROM p
      |  UNION ALL
      |  SELECT media_id, 1, h, nf - h, 40, h * 20 FROM p WHERE nf > h)
      |SELECT media_id, CAST(seg_idx AS BIGINT) AS seg_idx,
      |  CAST(first_frame AS BIGINT) AS first_frame,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(frame_ticks AS BIGINT) AS frame_ticks,
      |  CAST((start_ticks * 1000000) // 600 AS BIGINT) AS start_us,
      |  CAST((n_frames * frame_ticks * 1000000) // 600 AS BIGINT) AS duration_us
      |FROM s ORDER BY media_id, seg_idx""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val vids = Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("nb"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType)))
    val media = vids.mapPartitions { it =>
      it.map { r =>
        val nf = 1L + r.getLong(1) % 300L
        val h = (nf + 1) / 2
        val runs = if (nf > h) Seq((h, 20L), (nf - h, 40L)) else Seq((h, 20L))
        Row(r.getLong(0), "video", Multimodal.buildMp4(640, 360, 600L, runs))
      }
    }(Encoders.row(schema))
    Multimodal.videoSegments(Multimodal.videoTiming(media))
      .orderBy(col("media_id"), col("seg_idx"))
  }

  /** Audio analysis windows over a REAL WAV round-trip — mm3's window
    * cutter upgraded to mm7's realism standard: payloads are genuine
    * RIFF/WAVE headers ([[Multimodal.buildWav]], header-only — the
    * leading-bytes range-read a metadata pass fetches), the sample count
    * comes from the REAL chunk scan ([[Multimodal.decodeWavMeta]]:
    * `data`-chunk size over `fmt ` block align, via the full
    * [[Multimodal.decodeMeta]] partition pass), and window bounds are
    * also reported in floor-div milliseconds. Sample counts follow the
    * mm3 corpus convention (`1 + bytes·997 mod 100000` at 16 kHz) so the
    * oracle replays the arithmetic without parsing bytes.
    */
  val mm11WavWindows: Q = Q(
    "mm11_wav_windows",
    """WITH a AS (
      |  SELECT doc_id AS media_id,
      |         1 + (octet_length(encode(text)) * 997) % 100000 AS ns
      |  FROM documents WHERE doc_id % 3 = 1),
      |w AS (SELECT media_id,
      |    CAST(unnest(range(0, ns - 16000 + 1, 8000)) AS BIGINT) AS start_sample
      |  FROM a WHERE ns >= 16000)
      |SELECT media_id, start_sample,
      |  start_sample + 16000 AS end_sample,
      |  (start_sample * 1000) // 16000 AS start_ms,
      |  ((start_sample + 16000) * 1000) // 16000 AS end_ms
      |FROM w ORDER BY media_id, start_sample""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val auds = Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("nb"))
    val media = auds.mapPartitions { it =>
      it.map { r =>
        val ns = 1L + (r.getLong(1) * 997L) % 100000L
        Row(r.getLong(0), "audio", Multimodal.buildWav(16000, ns), null)
      }
    }(Encoders.row(Multimodal.MediaSchema))
    val decoded = Multimodal.decodeMeta(media)
      .withColumn("ns", col("meta.n_frames").cast(LongType))
    Multimodal.audioWindows(decoded, "ns", windowSamples = 16000, hopSamples = 8000)
      .withColumn("start_ms", expr("(start_sample * 1000L) div 16000L"))
      .withColumn("end_ms", expr("(end_sample * 1000L) div 16000L"))
      .orderBy(col("media_id"), col("start_sample"))
  }

  /** CLIP-gate calibration report — the dd25/dd27 audit shape applied to
    * mm8's gate: per (modality, score decile), pair counts and how many
    * clear the 0.05 threshold, plus each decile's share of its modality in
    * exact ppm. This is the report a curation team reads BEFORE committing
    * to a gate threshold (where does the mass sit, what would 0.10 cost?).
    * Deciles are `floor(score·10)` on the bit-deterministic scores, so
    * bucketing is engine-exact; shares are integer ppm. One projection +
    * one small aggregate + one ppm window over the ≤ |modality|·20 grid.
    */
  val mm12ClipCalibration: Q = Q(
    "mm12_clip_calibration",
    """WITH d AS (SELECT doc_id, source,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality
      |  FROM documents),
      |p AS (SELECT d.doc_id AS media_id, d.modality,
      |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    list_transform(range(0, 64),
      |      i -> ((d.nb * (2*i + 1) * 7919) % 1000003) / 1000003.0 - 0.5) AS t
      |  FROM d JOIN embeddings e ON e.vec_id = d.doc_id),
      |s AS (SELECT media_id, modality,
      |    list_sum(list_transform(range(1, 65), i -> v[i]*t[i])) /
      |    (sqrt(list_sum(list_transform(range(1, 65), i -> v[i]*v[i]))) *
      |     sqrt(list_sum(list_transform(range(1, 65), i -> t[i]*t[i])))) AS score
      |  FROM p),
      |b AS (SELECT modality, CAST(floor(score * 10) AS BIGINT) AS decile,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN score >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |  FROM s GROUP BY 1, 2)
      |SELECT modality, decile, n, n_kept,
      |  CAST((1000000 * n) // SUM(n) OVER (PARTITION BY modality) AS BIGINT) AS share_ppm
      |FROM b ORDER BY modality, decile""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        length(encode(col("text"), "UTF-8")).cast(LongType).as("nb"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("media_id"), col("embedding"))
    val scored = Multimodal.imageTextGate(
        docs.join(emb, "media_id").withColumn("txt_vec", expr(
          "transform(sequence(0L, 63L), i -> ((nb * (2*i + 1) * 7919) % 1000003) / 1000003.0D - 0.5D)")),
        "embedding", "txt_vec", threshold = 0.05)
    scored
      .groupBy(col("modality"),
        floor(col("clip_score") * 10).cast(LongType).as("decile"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("__tot",
        sum(col("n")).over(Window.partitionBy(col("modality"))))
      .withColumn("share_ppm", expr("(1000000 * n) div __tot"))
      .drop("__tot")
      .orderBy(col("modality"), col("decile"))
  }

  val all: Seq[Q] = Seq(mm1ByteFeatures, mm2FrameSampling, mm3AudioWindows,
    mm4SequenceBudget, mm5TilingPlan, mm6QualityGate, mm7FrameTimestamps,
    mm8ClipGate, mm9ResizePlan, mm10VideoSegments, mm11WavWindows,
    mm12ClipCalibration)
}
