package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media travels as
  * an opaque `binary` payload column + a typed metadata struct, and media
  * operations (decode, feature-extract, resize, frame-sample) run
  * partition-local over an iterator of rows — the Scala analog of
  * `mapInPandas` batches: no shuffle, no driver round-trip, codec state
  * amortized per partition.
  *
  * ALL THREE modalities decode through REAL container parsers: audio
  * payloads are PCM WAV containers parsed by
  * [[graft.plans.WavHeaderExpr]] (SQL: `wav_meta`), image payloads are
  * PNG containers parsed by [[graft.plans.PngHeaderExpr]] (SQL:
  * `png_meta`), and video payloads are RIFF/AVI containers parsed by
  * [[graft.plans.AviHeaderExpr]] (SQL: `avi_meta`) — native chunk
  * walkers, bit-parity-tested on crafted headers. Codec-level pixel /
  * sample / bitstream decode is out of scope by design (this is the
  * container/metadata boundary; the payload inside the container stays
  * opaque) — [[StubDecoder]] remains only as the fallback for unknown
  * modalities and as the fixture feature-extractor.
  */
object Multimodal {

  final case class MediaMeta(
      modality: String, byteLen: Long, width: Int, height: Int,
      sampleRate: Int, nFrames: Int)

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, meta: MediaMeta)
  final case class FeatureRow(doc_id: Long, features: Array[Float])

  /** Deterministic audio encoding parameters for the fixture WAVs, keyed
    * on doc id (mirrored in every m-query oracle): sample rate cycles
    * through the common PCM rates, channel count alternates mono/stereo. */
  val AudioRates: Seq[Int] = Seq(8000, 16000, 44100)
  def audioRate(docId: Long): Int = AudioRates(((docId / 3) % 3).toInt)
  def audioChannels(docId: Long): Int = (1 + (docId / 9) % 2).toInt

  /** Deterministic image encoding parameters for the fixture PNGs, keyed
    * on doc id (mirrored in the m-query oracles): dimensions sweep
    * 64..575 on coprime strides, color type cycles gray/truecolor/RGBA,
    * interlace alternates none/Adam7. */
  def imageWidth(docId: Long): Int = (64 + (docId * 13) % 512).toInt
  def imageHeight(docId: Long): Int = (64 + (docId * 29) % 512).toInt
  val ImageColorTypes: Seq[Int] = Seq(0, 2, 6)
  def imageColorType(docId: Long): Int = ImageColorTypes(((docId / 3) % 3).toInt)
  def imageInterlace(docId: Long): Int = (docId % 2).toInt
  /** Small IDAT chunk size so fixture payloads span several chunks and
    * the parser's chunk walk is actually exercised. */
  val ImageIdatChunk = 256

  /** Deterministic video encoding parameters for the fixture AVIs, keyed
    * on doc id (mirrored in the m-query oracles): frame period cycles the
    * common rates (30 / 25 / 24 fps), dimensions sweep on coprime
    * strides. Frames are 512-byte movi chunks so fixture payloads span
    * several frame chunks and the movi census is actually exercised. */
  val VideoUsPerFrames: Seq[Int] = Seq(33333, 40000, 41667)
  def videoUsPerFrame(docId: Long): Int =
    VideoUsPerFrames(((docId / 3) % 3).toInt)
  def videoWidth(docId: Long): Int = (128 + (docId * 17) % 1024).toInt
  def videoHeight(docId: Long): Int = (96 + (docId * 23) % 1024).toInt
  val VideoFrameChunk = 512

  /** Raw-bytes variant: the text's UTF-8 bytes as the payload, no
    * container — for byte-level ops (digest dedup) where the payload is
    * opaque by definition. Pure column math, no JVM boundary. */
  def attachRawPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"))

  /** Wrap a text column as a binary payload with a modality tag — the
    * fixture stand-in for real media bytes. Audio rows get a REAL PCM WAV
    * container (the raw text bytes as sample data), image rows a REAL PNG
    * container (the raw text bytes as the IDAT stream), and video rows a
    * REAL RIFF/AVI container (the raw text bytes as 512-byte '00dc' frame
    * chunks), so all three decode paths exercise an actual header parse.
    * Payload synthesis is fixture plumbing, so the partition-local map
    * here is the WRITE-side twin of the decode boundary, not an operator
    * shortcut. */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, raw, modality) =>
        val payload = modality match {
          case "audio" =>
            graft.plans.WavHeaderExpr.wavBytes(raw,
              sampleRate = audioRate(id), channels = audioChannels(id))
          case "image" =>
            graft.plans.PngHeaderExpr.pngBytes(raw,
              width = imageWidth(id), height = imageHeight(id),
              colorType = imageColorType(id), interlace = imageInterlace(id),
              idatChunk = ImageIdatChunk)
          case "video" =>
            graft.plans.AviHeaderExpr.aviBytes(raw,
              width = videoWidth(id), height = videoHeight(id),
              usPerFrame = videoUsPerFrame(id), frameChunk = VideoFrameChunk)
          case _ => raw
        }
        (id, payload, modality)
      })
      .toDF("doc_id", "payload", "modality")
  }

  /** STUB decoder for UNKNOWN modalities only (audio/image/video all
    * route to the real WAV/PNG/AVI parsers in [[decodeMeta]]):
    * deterministic pseudo-metadata from the payload bytes, plus the
    * fixture feature-extractor standing in for a model's embedding
    * tower. */
  object StubDecoder {
    def decode(modality: String, payload: Array[Byte]): MediaMeta = {
      var h = 0L
      payload.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      MediaMeta(
        modality = modality,
        byteLen = payload.length.toLong,
        width = 64 + (h % 512).toInt,
        height = 64 + ((h / 512) % 512).toInt,
        sampleRate = 0,
        nFrames = if (modality == "video") 1 + (h % 300).toInt else 1)
    }

    /** Fake feature vector (e.g. an embedding a vision tower would emit):
      * 8 floats derived from the payload hash — deterministic, fixed
      * width, partition-local. */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      var h = 0L
      payload.foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      Array.tabulate(dim) { i =>
        val v = (h * (i + 1)) % 1000003L
        (v.toDouble / 1000003.0).toFloat
      }
    }
  }

  /** Decode payloads partition-locally (mapPartitions = the batch loop a
    * Pandas UDF would run; one decoder instance per partition). Audio
    * rows go through the REAL RIFF/WAVE parse
    * ([[graft.plans.WavHeaderExpr.parse]]), image rows the REAL PNG
    * container parse ([[graft.plans.PngHeaderExpr.parse]]), and video
    * rows the REAL RIFF/AVI container parse
    * ([[graft.plans.AviHeaderExpr.parse]]) — the same static parsers the
    * `wav_meta`/`png_meta`/`avi_meta` codegen expressions inline; a
    * malformed container decodes to an all-zero meta (the quarantine
    * marker a production pipeline would route to a reject sink). */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val withMod = media.select(
      col("doc_id"), col("payload"), col("modality"))
      .as[(Long, Array[Byte], String)]
    withMod.mapPartitions { it =>
      // per-partition setup (codec init would go here, once per partition)
      it.map { case (id, payload, modality) =>
        modality match {
          case "audio" =>
            val parsed = graft.plans.WavHeaderExpr.parse(payload)
            val meta =
              if (parsed == null) MediaMeta("audio", payload.length.toLong, 0, 0, 0, 0)
              else MediaMeta("audio", payload.length.toLong, 0, 0,
                sampleRate = parsed.getInt(1),
                nFrames = parsed.getLong(4).toInt)
            DecodedRow(id, meta)
          case "image" =>
            val parsed = graft.plans.PngHeaderExpr.parse(payload)
            val meta =
              if (parsed == null) MediaMeta("image", payload.length.toLong, 0, 0, 0, 0)
              else MediaMeta("image", payload.length.toLong,
                width = parsed.getInt(0), height = parsed.getInt(1),
                sampleRate = 0, nFrames = 1)
            DecodedRow(id, meta)
          case "video" =>
            val parsed = graft.plans.AviHeaderExpr.parse(payload)
            val meta =
              if (parsed == null) MediaMeta("video", payload.length.toLong, 0, 0, 0, 0)
              else MediaMeta("video", payload.length.toLong,
                width = parsed.getInt(0), height = parsed.getInt(1),
                sampleRate = 0, nFrames = parsed.getInt(3))
            DecodedRow(id, meta)
          case _ => DecodedRow(id, StubDecoder.decode(modality, payload))
        }
      }
    }.toDF()
  }

  /** Feature extraction with explicit batch shape: rows are processed in
    * grouped batches (default 64) like Arrow record batches, so a
    * vectorized model call gets amortized invocations. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[FeatureRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real impl would run ONE vectorized model call per batch
          batch.map(r => FeatureRow(r.doc_id, StubDecoder.features(r.payload)))
        }
      }
  }

  /** Metadata-level ops (resize / frame-sample plans) — pure column math
    * over the decoded struct, no payload touch. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
      when(greatest(col("meta.width"), col("meta.height")) > maxSide,
        lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double"))
        .otherwise(1.0))
      .withColumn("out_width", floor(col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("meta.height") * col("scale")).cast("int"))

  def frameSamplePlan(decoded: DataFrame, everyN: Int): DataFrame =
    decoded.filter(col("meta.modality") === "video")
      .withColumn("sampled_frames",
        greatest(lit(1), (col("meta.nFrames") / everyN).cast("int")))

  /** Chunking plan: fixed-size windows with stride over each asset's
    * temporal axis — overlapping sample windows for audio (the stub's
    * "samples" are payload bytes), non-overlapping frame clips for video,
    * a single whole-asset chunk for images. The batch shape encoder
    * pipelines consume: one row per (asset, chunk) with unit offsets, so
    * a downstream `mapPartitions` decode can slice payloads without any
    * row ever exceeding chunk size.
    *
    * Pure column math + a per-row `explode` of the chunk index range — no
    * payload touch, no shuffle; row fan-out per asset is
    * ceil(n_units/stride), bounded and proportional to asset length. */
  def chunkPlan(decoded: DataFrame, audioChunk: Int = 4000,
                audioStride: Int = 3000, videoChunk: Int = 30): DataFrame = {
    val m = col("meta.modality")
    // audio windows over SAMPLE FRAMES (the real temporal axis the WAV
    // parse recovers), video over frames, images are one whole chunk
    val base = decoded.select(col("doc_id"), m.as("modality"),
      when(m === "audio", col("meta.nFrames").cast("long"))
        .when(m === "video", col("meta.nFrames").cast("long"))
        .otherwise(lit(1L)).as("n_units"),
      when(m === "audio", lit(audioChunk.toLong))
        .when(m === "video", lit(videoChunk.toLong))
        .otherwise(lit(1L)).as("chunk"),
      when(m === "audio", lit(audioStride.toLong))
        .when(m === "video", lit(videoChunk.toLong))
        .otherwise(lit(1L)).as("stride"))
    base
      // last chunk may be short but every unit is covered exactly once
      // past the overlap: 1 + ceil((n - chunk)/stride) chunks when n > chunk
      .withColumn("n_chunks",
        when(col("n_units") <= col("chunk"), lit(1L))
          .otherwise(expr("1 + (n_units - chunk + stride - 1) div stride")))
      .select(col("doc_id"), col("modality"), col("n_units"), col("chunk"),
        col("stride"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("modality"), col("chunk_idx"),
        (col("chunk_idx") * col("stride")).as("chunk_start"),
        least(col("chunk_idx") * col("stride") + col("chunk"), col("n_units"))
          .as("chunk_end"))
  }
}
