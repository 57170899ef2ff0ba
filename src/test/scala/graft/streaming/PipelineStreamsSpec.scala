package graft.streaming

import graft.SparkSpec
import graft.analytics.PipelineQueries
import graft.operators.DimBuild
import graft.pipeline.{BronzeToSilver, SilverToGold}
import org.apache.spark.sql.functions._

/** The composed-lifecycle streaming twin (r7 verdict task 6): the SAME
  * bronze feed g1 proves under oracle, split into date-cut increments and
  * replayed through foreachBatch + insert-only silver merges + per-trigger
  * gold rebuild, must accumulate EXACTLY the batch pipeline's gold fact —
  * surrogate keys included (hash mode is layout-independent). */
class PipelineStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("stream-accumulated gold fact equals the batch g1 fact") {
    val prefix = "ps_gold"
    val dir = tmpDir("ps-bronze") + "/data"
    try {
      val bronze = PipelineQueries.bronzeFromLineitem(spark, sfDir).cache()

      // ---- batch truth: the g1 composition -------------------------
      val silver = BronzeToSilver(bronze)
      val population = bronze.select(col("state_code")).distinct()
        .withColumn("population",
          (col("state_code").cast("int") * 100000 + 7).cast("int"))
      val batchFact = SilverToGold(silver, population, DimBuild.HashKeys)
        .fact.cache()
      val batchRows = batchFact.collect().toSeq
      assert(batchRows.nonEmpty)

      // ---- streaming run: four weekly-style increments cut by date —
      // date_local is part of the natural key, so each key's duplicates
      // stay within one increment (see PipelineStreams object doc)
      val withSlice = bronze.withColumn("__slice",
        pmod(xxhash64(col("date_local").cast("string")), lit(4)))
      val slices = (0 until 4).map(i =>
        withSlice.filter(col("__slice") === i).drop("__slice"))
      assert(slices.forall(_.count() > 0), "every increment must be non-empty")
      // increment 0 seeds the stream; the rest arrive one file per batch
      slices.head.coalesce(1).write.parquet(dir)
      val stream = spark.readStream.schema(bronze.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = PipelineStreams.goldIncremental(spark, stream, prefix,
        checkpointLocation = Some(tmpDir("ps-ckpt")))
      try {
        q.processAllAvailable()
        // gold exists (and is non-final) after the first increment
        val partial = spark.table(s"${prefix}_fact").count()
        assert(partial > 0 && partial < batchRows.size,
          s"first increment must yield a partial gold ($partial)")
        for (s <- slices.tail) {
          s.coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      } finally q.stop()

      // ---- final-state equality, surrogate keys included -----------
      val streamFact = spark.table(s"${prefix}_fact")
      assert(streamFact.count() === batchRows.size.toLong)
      // exceptAll both ways: exact multiset equality over ALL columns
      assert(streamFact.exceptAll(batchFact).isEmpty &&
        batchFact.exceptAll(streamFact).isEmpty,
        "stream-accumulated fact must equal the batch fact row-for-row")

      // accumulated silver measurement matches the batch dedup too
      assert(spark.table(s"${prefix}_measurement").count() ===
        silver.measurement.count())

      bronze.unpersist(); batchFact.unpersist()
    } finally {
      for (t <- PipelineStreams.tableNames(prefix))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      for (t <- PipelineStreams.tableNames(prefix))
        spark.sql(s"DROP TABLE IF EXISTS ${t}__staging")
    }
  }
}
