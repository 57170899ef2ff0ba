package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{TextFunctions => TF}

/** Streaming near-duplicate detection over a document feed — the in-flight
  * twin of the batch incremental dedup (`t24_incremental_dedup`): new
  * documents arriving on a stream probe a STATIC MinHash band index (the
  * artifact a production dedup pipeline persists between runs) and emit
  * candidate near-dup pairs as they arrive.
  *
  * Scale posture: the probe is a stream-static equi-join on (band, sig) —
  * STATELESS on the streaming side (stream-static joins keep no state, so
  * there is no watermark to tune and state size is zero regardless of feed
  * volume); per micro-batch cost is the batch's signature pass (one fused
  * `minhashes` scan per doc) plus lookups into only the colliding index
  * buckets. The index side carries t24's hot-bucket cap, so a degenerate
  * bucket cannot fan a batch out quadratically. A doc colliding with the
  * same index doc in several bands emits one row per band — by design:
  * pair-dedup state on an unbounded stream would grow without bound;
  * instead the pairs sink through [[EventStreams.upsertSink]]'s insert-only
  * merge keyed on (new_doc, index_doc), which collapses multi-band
  * duplicates AND replayed batches into exactly-once table contents.
  */
object DocStreams {

  /** Raw parquet schema of the documents table (streaming reads need an
    * explicit schema). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream of document parquet part-files. */
  def readDocStream(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(path)
  }

  /** k-permutation MinHash signature column for a documents relation. */
  private def signature(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      TF.minhashes(TF.shingles(TF.tokens(col("text")), 3), k).as("mhs"))

  /** Static band index over an already-deduped corpus: one (band, sig,
    * doc_id, mhs) row per permutation band, hot buckets above `maxBucket`
    * dropped (t24's cap — the index side is where structural mass lives).
    * In production this table is persisted once per dedup run and read
    * back here; the signature array rides along so the probe can estimate
    * Jaccard without re-joining a signature table. */
  def bandIndex(docs: DataFrame, k: Int = 8,
                maxBucket: Int = graft.analytics.TextQueries.MaxBandBucket)
      : DataFrame = {
    val exploded = signature(docs, k)
      .select(col("doc_id"), col("mhs"), posexplode(col("mhs")))
      .toDF("doc_id", "mhs", "band", "sig")
      .filter(col("sig").isNotNull)
    // hot-bucket cap as a broadcast ANTI on the HOT buckets (r20, the
    // t5/t24 pattern): the OK set is index-sized while the hot set is
    // bounded by the corpus's repetition rate; the gate falls back to
    // the keyed shuffle past the driver ceiling. The input is static
    // (the index side of the stream-static probe), so the persist is a
    // plain batch materialization.
    val hot = graft.analytics.Caches.persistTracked(
      exploded.groupBy("band", "sig")
        .agg(count(lit(1)).as("bcnt"))
        .filter(col("bcnt") > maxBucket)
        .select("band", "sig"))
    exploded.join(graft.operators.GatedBroadcast(hot),
        Seq("band", "sig"), "left_anti")
      .select(col("band"), col("sig"), col("doc_id"), col("mhs"))
  }

  /** Stream-static LSH probe: arriving docs → signatures → band explode →
    * join the index on (band, sig). Emits (new_doc, index_doc,
    * est_jaccard) with the t5/t24 signature-agreement estimate; one row
    * per colliding band (see object doc for why pair-dedup lives in the
    * sink, not in stream state).
    *
    * The Jaccard divisor is the INDEX signature's length, and a probe
    * signature of a different length fails fast with `raise_error` —
    * a probe k that silently disagrees with the k the index was built
    * with would deflate every estimate via zip_with's null padding. */
  def nearDupProbe(docStream: DataFrame, index: DataFrame,
                   k: Int = 8): DataFrame = {
    val probes = signature(docStream, k)
      .select(col("doc_id").as("new_doc"), col("mhs").as("mha"),
        posexplode(col("mhs")))
      .toDF("new_doc", "mha", "band", "sig")
      .filter(col("sig").isNotNull)
    val agree = aggregate(
      zip_with(col("mha"), col("mhb"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (a, b) => a + b)
    val est = when(size(col("mha")) =!= size(col("mhb")),
      raise_error(concat(lit("nearDupProbe: probe signature length "),
        size(col("mha")).cast("string"),
        lit(" != index signature length "),
        size(col("mhb")).cast("string"),
        lit(" — build the probe with the index's k"))))
      .otherwise(agree / size(col("mhb")).cast("double"))
    probes.join(
        index.toDF("band", "sig", "index_doc", "mhb"), Seq("band", "sig"))
      .filter(col("new_doc") =!= col("index_doc"))
      .select(col("new_doc"), col("index_doc"),
        round(est, 6).as("est_jaccard"))
  }

  /** Schema of the persisted band index ([[bandIndex]]'s output). */
  val indexSchema: StructType = StructType(Seq(
    StructField("band", IntegerType), StructField("sig", LongType),
    StructField("doc_id", LongType),
    StructField("mhs", ArrayType(LongType, containsNull = true))))

  /** Self-MAINTAINING streaming near-dedup: closes the probe → index-update
    * cycle the static-index probe leaves open. Each micro-batch
    *
    *  1. probes the index AS OF the batch's start and upserts candidate
    *     pairs into `pairsTable` (insert-only merge keyed on
    *     (new_doc, index_doc) — multi-band and replayed duplicates
    *     collapse exactly as in the static probe);
    *  2. MERGEs the batch's own band rows into `indexTable` — the
    *     insert-only s11 operator keyed on (band, sig, doc_id) — so a doc
    *     arriving in batch N is findable as a duplicate from batch N+1 on,
    *     and a REPLAYED batch re-inserts nothing.
    *
    * Within-batch duplicate pairs are deliberately not emitted here — a
    * batch is one corpus snapshot and in-snapshot dedup is the batch
    * operators' job (t5); this sink owns the cross-arrival axis.
    *
    * Scale posture: per batch, one probe join against only the colliding
    * index buckets plus one delta-sized anti join for the index merge —
    * the index grows with the corpus but the per-batch work tracks the
    * BATCH size. The per-batch hot-bucket cap (`maxBucket`) bounds fan-out
    * within each arriving batch; at warehouse scale the table swap becomes
    * a MERGE INTO on a real table format ([[graft.sources.GraftCatalog]]
    * is the SQL route) rather than a full rewrite. */
  def dedupWithIndexMaintenance(spark: SparkSession, docStream: DataFrame,
      pairsTable: String = "near_dups", indexTable: String = "doc_band_index",
      k: Int = 8,
      maxBucket: Int = graft.analytics.TextQueries.MaxBandBucket,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docStream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
    // a durable checkpoint makes the cycle restartable: a batch whose side
    // effects landed but whose commit marker didn't (crash mid-batch)
    // REPLAYS on restart, and both merges below absorb the replay
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // missing table + surviving __staging = the stage+swap died
        // between DROP and RENAME: the data EXISTS but is orphaned;
        // silently starting over empty would forget every indexed doc
        // (index) or every recorded pair (pairs). Fail loudly instead.
        def tableOrEmpty(table: String, schema: StructType)
            : org.apache.spark.sql.DataFrame =
          if (spark.catalog.tableExists(table)) spark.table(table)
          else if (spark.catalog.tableExists(table + "__staging"))
            throw new IllegalStateException(
              s"$table is missing but ${table}__staging exists — " +
                "interrupted swap; recover the staging table (rename it " +
                s"to $table) before restarting the stream")
          else spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        val index = tableOrEmpty(indexTable, indexSchema)
        // 1. probe the PRE-BATCH index; exactly-once pairs via insert-only.
        // The pre-batch state is RECONSTRUCTED by excluding this batch's
        // own docs from the index side: after a crash between step 2's
        // index merge and the streaming commit marker, the replayed batch
        // would otherwise find its own rows in the index and emit
        // within-batch pairs a crash-free run never produces — table
        // contents must not depend on where a crash landed. The exclusion
        // is an anti join against the batch's (broadcast-sized) id set,
        // so the index never shuffles for it.
        val batchIds = batch.select(col("doc_id")).distinct()
        // re-pin column order: a USING-column join moves the key first,
        // and the probe renames its index input positionally
        val preBatchIndex = index.join(broadcast(batchIds), Seq("doc_id"),
          "left_anti").select("band", "sig", "doc_id", "mhs")
        val pairs = nearDupProbe(batch, preBatchIndex, k)
        val pairsTarget = tableOrEmpty(pairsTable, pairs.schema)
        graft.pipeline.Catalog.overwriteTable(spark,
          graft.operators.MergeInsertOnly(pairsTarget,
            pairs.dropDuplicates("new_doc", "index_doc"),
            Seq("new_doc", "index_doc")),
          pairsTable)
        // 2. fold the batch's signatures into the index (replay-safe)
        graft.pipeline.Catalog.overwriteTable(spark,
          graft.operators.MergeInsertOnly(index,
            bandIndex(batch, k, maxBucket), Seq("band", "sig", "doc_id")),
          indexTable)
        ()
      }
      .start()
  }
}
