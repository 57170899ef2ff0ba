package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 (audio): 10 data bytes → mono 16-bit WAV → 5 sample frames
  lazy val docs = Seq(
    (0L, "spark window agg"), (1L, "abcdefghij"), (2L, "a much longer media-ish text payload"))
    .toDF("doc_id", "text")
  lazy val media = Multimodal.attachPayload(docs, "doc_id", "text").cache()

  test("payload round-trips the source bytes; modality cycles by id") {
    val rows = media.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[String]("modality")).toSeq === Seq("image", "audio", "video"))
    // the image payload is a REAL PNG container: sig + IHDR + one IDAT
    // carrying the 16 source bytes + IEND = 73 bytes
    val png = rows(0).getAs[Array[Byte]]("payload")
    assert((png(0) & 0xff) === 0x89 &&
      new String(png.slice(1, 4), "US-ASCII") === "PNG")
    assert(png.length === 8 + 25 + 12 + 16 + 12)
    // IDAT payload sits after sig(8) + IHDR(25) + IDAT len+type(8)
    assert(new String(png.slice(41, 57), "UTF-8") === "spark window agg")
    // the audio payload is a REAL WAV container: header + data + pad
    val wav = rows(1).getAs[Array[Byte]]("payload")
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(wav.length === 44 + 10)
    assert(new String(wav.slice(44, 54), "UTF-8") === "abcdefghij")
    // the video payload is a REAL AVI container: RIFF/'AVI ' + hdrl/avih
    // + movi with one 36-byte '00dc' frame chunk = 144 bytes
    val avi = rows(2).getAs[Array[Byte]]("payload")
    assert(new String(avi.take(4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    assert(avi.length === 100 + 36 + 8)
    // frame payload sits after RIFF(12) + LIST hdrl(76) + movi hdr(12) +
    // chunk hdr(8)
    assert(new String(avi.slice(108, 121), "UTF-8") === "a much longer")
  }

  test("c4 composed lifecycle reconciles with its stages") {
    val dir = "/root/testdata/sf0.001"
    val run = graft.SparkEntry.queries("c4_multimodal_lifecycle")(spark, dir)
    val rows = run.collect()
    graft.analytics.Caches.release()
    val byMod = rows.map(r => r.getString(0) -> r).toMap
    assert(byMod.keySet == Set("audio", "image", "video"))
    // stage reconciliation against INDEPENDENT restatements of each
    // stage over the raw table
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val modOf = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    // n_assets = raw census; n_distinct = distinct (modality, digest)
    val raw = docs.select(modOf.as("m"), md5(col("text")).as("d"))
    val nAssets = raw.groupBy("m").count().as[(String, Long)]
      .collect().toMap
    val nDistinct = raw.distinct().groupBy("m").count()
      .as[(String, Long)].collect().toMap
    byMod.foreach { case (m, r) =>
      assert(r.getLong(1) == nAssets(m), s"$m n_assets")
      assert(r.getLong(2) == nDistinct(m), s"$m n_distinct")
      // dedup never grows; chunks cover at least one per keeper
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= r.getLong(2), s"$m n_chunks < keepers")
      // coverage is bounded by the keeper census
      assert(r.getLong(5) <= r.getLong(2), s"$m n_covered")
    }
    // images chunk 1:1 (one whole-asset chunk per keeper)
    assert(byMod("image").getLong(3) == byMod("image").getLong(2))
  }

  test("decode is deterministic and schema-typed; audio parses the real WAV header") {
    val decoded = Multimodal.decodeMeta(spark, media).cache()
    assert(decoded.schema("meta").dataType.typeName === "struct")
    val audio = decoded.filter(col("doc_id") === 1).head()
      .getStruct(1)
    assert(audio.getAs[String]("modality") === "audio")
    // doc 1: rate rule (1/3)%3 = 0 → 8000 Hz, channels (1/9)%2 → mono
    assert(audio.getAs[Int]("sampleRate") === 8000)
    assert(audio.getAs[Long]("byteLen") === 44 + 10)
    assert(audio.getAs[Int]("width") === 0)
    assert(audio.getAs[Int]("nFrames") === 5) // 10 bytes / (1 ch × 2 B)
    // doc 0 (image): real PNG parse — width/height from the builder rules
    // (64 + id*13 % 512 = 64 × 64), byteLen is the whole container
    val image = decoded.filter(col("doc_id") === 0).head().getStruct(1)
    assert(image.getAs[String]("modality") === "image")
    assert(image.getAs[Int]("width") === 64)
    assert(image.getAs[Int]("height") === 64)
    assert(image.getAs[Long]("byteLen") === 8 + 25 + 12 + 16 + 12)
    assert(image.getAs[Int]("nFrames") === 1)
    // doc 2 (video): real AVI parse — dims from the builder rules
    // (128 + 2·17 = 162 × 96 + 2·23 = 142), one 36-byte frame chunk
    val video = decoded.filter(col("doc_id") === 2).head().getStruct(1)
    assert(video.getAs[String]("modality") === "video")
    assert(video.getAs[Int]("width") === 162)
    assert(video.getAs[Int]("height") === 142)
    assert(video.getAs[Long]("byteLen") === 144)
    assert(video.getAs[Int]("nFrames") === 1)
    // deterministic: second run equals first
    val again = Multimodal.decodeMeta(spark, media)
    assert(decoded.except(again).count() === 0)
  }

  test("feature extraction emits fixed-width vectors in batches") {
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 2).collect()
    assert(feats.length === 3)
    assert(feats.forall(_.features.length === 8))
    assert(feats.forall(_.features.forall(v => v >= 0f && v < 1f)))
  }

  test("resize plan caps the longest side; frame sampling only hits video") {
    val decoded = Multimodal.decodeMeta(spark, media)
    val resized = Multimodal.resizePlan(decoded, maxSide = 100)
    assert(resized.filter(col("out_width") > 100 || col("out_height") > 100).count() === 0)
    val sampled = Multimodal.frameSamplePlan(decoded, everyN = 10)
    assert(sampled.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("chunk plan covers every unit with stride overlap and exact tails") {
    val decoded = Multimodal.decodeMeta(spark, media)
    // audio doc 1 has byteLen 5 (= "short"): chunk 4, stride 3 →
    // chunks [0,4) and [3,5) — boundary case where the last chunk is
    // short but the tail unit is still covered
    val audio = Multimodal.chunkPlan(decoded, audioChunk = 4, audioStride = 3)
      .filter(col("doc_id") === 1).orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_start"),
        r.getAs[Long]("chunk_end")))
    assert(audio.toSeq === Seq((0L, 0L, 4L), (1L, 3L, 5L)))
    // n_units == chunk exactly → a single chunk, no empty trailing chunk
    val exact = Multimodal.chunkPlan(decoded, audioChunk = 5, audioStride = 3)
      .filter(col("doc_id") === 1).collect()
    assert(exact.length === 1)
    assert(exact.head.getAs[Long]("chunk_end") === 5L)
    // images are always a single whole-asset chunk
    val img = Multimodal.chunkPlan(decoded).filter(col("modality") === "image")
      .collect()
    assert(img.length === 1 && img.head.getAs[Long]("chunk_idx") === 0L)
  }
}
