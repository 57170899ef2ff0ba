package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "spark window agg"), (1L, "short"), (2L, "a much longer media-ish text payload"))
    .toDF("doc_id", "text")
  lazy val media = Multimodal.attachPayload(docs, "doc_id", "text").cache()

  test("payload round-trips the source bytes; modality cycles by id") {
    val rows = media.orderBy("doc_id").collect()
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "UTF-8") === "spark window agg")
    assert(rows.map(_.getAs[String]("modality")).toSeq === Seq("image", "audio", "video"))
  }

  test("stub decode is deterministic and schema-typed") {
    val decoded = Multimodal.decodeMeta(spark, media).cache()
    assert(decoded.schema("meta").dataType.typeName === "struct")
    val audio = decoded.filter(col("doc_id") === 1).head()
      .getStruct(1)
    assert(audio.getAs[String]("modality") === "audio")
    assert(audio.getAs[Int]("sampleRate") === 16000)
    assert(audio.getAs[Long]("byteLen") === "short".length)
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
}
