package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming near-dedup: arriving docs probe the static band index; the
  * insert-only sink converges to exactly-once pair contents across
  * multi-band collisions and replayed batches.
  */
class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) =>
      (id, text, "en", "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val corpus = Seq(
    0L -> "the quick brown fox jumps over the lazy dog near the river bank",
    1L -> "spark shuffles data between stages when keys must be colocated now",
    2L -> "a completely different document about window functions and joins")

  test("stream probe finds the planted near-dups, sink stays exactly-once") {
    val index = DocStreams.bandIndex(docsDF(corpus))
    val dir = tmpDir("doc-stream") + "/data"
    // batch 1: one exact copy of doc 0 (every band collides, est 1.0) and
    // one unrelated doc (no collision)
    docsDF(Seq(
      100L -> corpus.head._2,
      101L -> "nothing in common with anything stored in the index at all ok"))
      .coalesce(1).write.parquet(dir)
    val q = EventStreams.upsertSink(spark,
      DocStreams.nearDupProbe(DocStreams.readDocStream(spark, dir), index),
      "near_dups", Seq("new_doc", "index_doc"))
    try {
      q.processAllAvailable()
      val got1 = spark.table("near_dups").collect()
      // multi-band collisions collapsed by the insert-only merge
      assert(got1.length === 1)
      assert(got1.head.getLong(0) === 100L)
      assert(got1.head.getLong(1) === 0L)
      assert(got1.head.getDouble(2) === 1.0)
      // batch 2 REPLAYS the same file content and adds a copy of doc 1:
      // the replayed pair must not duplicate, the new pair must appear
      docsDF(Seq(
        100L -> corpus.head._2,
        102L -> corpus(1)._2))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got2 = spark.table("near_dups")
        .select("new_doc", "index_doc").as[(Long, Long)].collect().sorted
      assert(got2.toSeq === Seq((100L, 0L), (102L, 1L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS near_dups")
      spark.sql("DROP TABLE IF EXISTS near_dups__staging")
    }
  }

  test("band index drops hot buckets so a degenerate feed cannot fan out") {
    // 30 boilerplate copies of one text: every band bucket they share
    // holds 30 > maxBucket docs and must vanish from the index
    val boiler = (0L until 30L).map(i => i -> corpus.head._2)
    val idx = DocStreams.bandIndex(docsDF(boiler ++ Seq(100L -> corpus(1)._2)),
      maxBucket = 10)
    val byDoc = idx.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byDoc.keys.exists(_ < 30L),
      "boilerplate docs must be dropped from every (shared, hot) bucket")
    assert(byDoc.get(100L).exists(_ > 0),
      "the unique doc keeps its (cold) buckets")
  }

  test("probe with a k different from the index's fails fast, not deflated") {
    val index = DocStreams.bandIndex(docsDF(corpus), k = 8)
    val probe = DocStreams.nearDupProbe(
      docsDF(Seq(100L -> corpus.head._2)), index, k = 4)
    val e = intercept[Exception](probe.collect())
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("signature length"))
  }

  test("index maintenance: a doc arriving in batch N is found by batch N+1") {
    val dir = tmpDir("doc-idx") + "/data"
    // batch 1: the seed corpus — index is empty, so no pairs yet
    docsDF(corpus).coalesce(1).write.parquet(dir)
    val q = DocStreams.dedupWithIndexMaintenance(spark,
      DocStreams.readDocStream(spark, dir, maxFilesPerTrigger = Some(1)),
      pairsTable = "nd_pairs", indexTable = "nd_index")
    try {
      q.processAllAvailable()
      assert(spark.table("nd_pairs").isEmpty)
      assert(spark.table("nd_index").count() > 0)
      // batch 2: a copy of doc 0 — found via the index batch 1 built
      docsDF(Seq(100L -> corpus.head._2))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got2 = spark.table("nd_pairs")
        .select("new_doc", "index_doc").as[(Long, Long)].collect().sorted
      assert(got2.toSeq === Seq((100L, 0L)))
      // batch 3: a copy of doc 100 — 100 itself arrived ON THE STREAM in
      // batch 2 and must now be probe-able (the cycle under test); doc 0
      // also matches, and the batch-2 pair must not duplicate
      docsDF(Seq(200L -> corpus.head._2))
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got3 = spark.table("nd_pairs")
        .select("new_doc", "index_doc").as[(Long, Long)].collect().sorted
      assert(got3.toSeq === Seq((100L, 0L), (200L, 0L), (200L, 100L)))
    } finally {
      q.stop()
      for (t <- Seq("nd_pairs", "nd_index"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
      for (t <- Seq("nd_pairs__staging", "nd_index__staging"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("kill mid-batch: checkpoint replay keeps pairs and index exactly-once") {
    // The adversarial restart case: a crash AFTER foreachBatch's side
    // effects (both table merges) but BEFORE the streaming commit marker
    // lands. Simulated exactly: process a batch, then delete its entry
    // from <checkpoint>/commits — on restart the engine re-runs the batch
    // with the SAME offsets (same files) against tables that already
    // absorbed it. Exactly-once table contents must survive the replay,
    // and the stream must keep moving afterwards.
    val dir = tmpDir("doc-kill") + "/data"
    val ck = tmpDir("doc-kill-ck")
    def start() = DocStreams.dedupWithIndexMaintenance(spark,
      DocStreams.readDocStream(spark, dir, maxFilesPerTrigger = Some(1)),
      pairsTable = "k_pairs", indexTable = "k_index",
      checkpointLocation = Some(ck))
    docsDF(corpus).coalesce(1).write.parquet(dir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // batch 2 (new query instance, same checkpoint): TWO docs that are
    // near-dups of doc 0 AND of each other — the within-batch pair
    // (100,101) must never surface, crash or no crash: on replay the
    // batch's own rows are already in the index, and only the
    // pre-batch-state reconstruction keeps them out of the probe
    docsDF(Seq(100L -> corpus.head._2, 101L -> corpus.head._2))
      .coalesce(1).write.mode("append").parquet(dir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    try {
      assert(spark.table("k_pairs")
        .select("new_doc", "index_doc").as[(Long, Long)].collect().sorted.toSeq
        === Seq((100L, 0L), (101L, 0L)))
      val idxRows = spark.table("k_index").count()
      assert(spark.table("k_index").distinct().count() === idxRows)
      // kill mid-batch: drop the LAST commit marker, offsets stay
      val commits = new java.io.File(ck, "commits").listFiles()
        .filter(_.getName.forall(_.isDigit))
      val last = commits.maxBy(_.getName.toLong)
      assert(last.getName.toLong === 1L, "expected two committed batches")
      assert(last.delete())
      // the local FS keeps a checksum sibling; left behind it would make
      // the replay's rename-based rewrite of the commit file collide
      new java.io.File(last.getParentFile, "." + last.getName + ".crc").delete()
      val q3 = start()
      try {
        q3.processAllAvailable() // replays batch 1
        assert(spark.table("k_pairs")
          .select("new_doc", "index_doc").as[(Long, Long)].collect().sorted.toSeq
          === Seq((100L, 0L), (101L, 0L)),
          "replay must neither duplicate pairs nor emit within-batch pairs")
        assert(spark.table("k_index").count() === idxRows,
          "replayed batch must re-insert nothing into the index")
        assert(spark.table("k_index").distinct().count() === idxRows)
        // the recovered stream still advances: a new dup arrives and both
        // the new pair and its index rows land exactly once
        docsDF(Seq(102L -> corpus(1)._2))
          .coalesce(1).write.mode("append").parquet(dir)
        q3.processAllAvailable()
        assert(spark.table("k_pairs")
          .select("new_doc", "index_doc").as[(Long, Long)].collect().sorted.toSeq
          === Seq((100L, 0L), (101L, 0L), (102L, 1L)))
        assert(spark.table("k_index").count() > idxRows)
      } finally q3.stop()
    } finally {
      for (t <- Seq("k_pairs", "k_index", "k_pairs__staging", "k_index__staging"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("streaming recall census: a replayed feed recovers exactly the cross-batch LSH candidates") {
    // qa6's exact-census methodology applied to the STREAMING probe path:
    // replay the whole sf0.001 corpus through the self-maintaining cycle
    // in 4 arrival batches, then compare the accumulated pair table
    // against the batch t5 candidate set and the exact (jaccard ≥ 0.2)
    // ground truth. The streaming cycle probes each batch against the
    // pre-batch index, so its reachable pair universe is exactly the
    // CROSS-batch candidates — equality there, plus an exact recall
    // number against the cross-batch slice of the ground truth, is the
    // evaluation a production stream runs before trusting its banding.
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // guard: no band bucket in this corpus exceeds the hot cap — under
    // it, neither the batch formulation's global cap nor the stream's
    // per-batch cap ever drops a bucket, so the two pair universes are
    // comparable EXACTLY (a capped bucket would make equality depend on
    // cap timing, batch-local vs global)
    import graft.functions.{TextFunctions => TF}
    val maxBucket = docs
      .select(posexplode(TF.minhashes(TF.shingles(TF.tokens(col("text")), 3), 8)))
      .filter(col("col").isNotNull)
      .groupBy("pos", "col").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(maxBucket <= graft.analytics.TextQueries.MaxBandBucket,
      s"corpus grew a hot bucket ($maxBucket) — census equality needs the cap-free regime")

    val feedDir = tmpDir("census-feed") + "/data"
    val nBatches = 4
    val batchOf = pmod(col("doc_id"), lit(nBatches))
    // the file source needs the path to exist: land batch 0 before start
    docs.filter(batchOf === 0).coalesce(1).write.parquet(feedDir)
    val q = DocStreams.dedupWithIndexMaintenance(spark,
      DocStreams.readDocStream(spark, feedDir),
      pairsTable = "census_pairs", indexTable = "census_index")
    try {
      q.processAllAvailable()
      for (b <- 1 until nBatches) {
        docs.filter(batchOf === b).coalesce(1)
          .write.mode("append").parquet(feedDir)
        q.processAllAvailable()
      }
      val streamed = spark.table("census_pairs")
        .select(least(col("new_doc"), col("index_doc")).as("doc_a"),
          greatest(col("new_doc"), col("index_doc")).as("doc_b"))
        .distinct().as[(Long, Long)].collect().sorted.toSeq
      // batch candidates (t5's oracle-proven set), restricted cross-batch
      val cand = graft.SparkEntry.queries("t5_minhash_lsh")(spark, dir)
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSeq
      graft.analytics.Caches.release()
      val crossCand = cand.filter { case (a, b) =>
        a % nBatches != b % nBatches }.sorted
      assert(streamed === crossCand,
        "streamed pair set must equal the cross-batch slice of the batch candidates")
      // exact ground truth at the 0.2 dedup threshold (t7 semantics)
      val exact = graft.SparkEntry.queries("t7_ngram_jaccard")(spark, dir)
        .filter(col("jaccard") >= 0.2)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
      graft.analytics.Caches.release()
      val exactCross = exact.filter { case (a, b) =>
        a % nBatches != b % nBatches }
      assert(exactCross.nonEmpty, "census needs cross-batch true pairs")
      val streamedSet = streamed.toSet
      val hit = exactCross.count(streamedSet.contains)
      val recall = hit.toDouble / exactCross.size
      info(f"streaming census: ${exactCross.size} cross-batch exact pairs, " +
        f"${streamed.size} streamed candidates, $hit hit, recall $recall%.3f")
      // the stream must recover exactly what the batch banding recovers
      // on its reachable (cross-batch) universe — no streaming-side loss
      val candSet = cand.toSet
      assert(hit === exactCross.count(candSet.contains),
        "streaming recall must equal batch banding recall on cross-batch pairs")
      assert(recall > 0.0)
    } finally {
      q.stop()
      for (t <- Seq("census_pairs", "census_index",
        "census_pairs__staging", "census_index__staging"))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("probe estimate agrees with the batch t24 formulation on the corpus") {
    // identical inputs through the streaming operators in BATCH mode (the
    // transformations are mode-agnostic DataFrame programs): bandIndex on
    // the sf0.001 corpus minus the t11 sample, probed by the sample —
    // exactly t24's split — must reproduce t24's pair set
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val isNew = pmod(graft.functions.TextFunctions.polyHash(
      concat(lit("smpl|"), col("doc_id").cast("string"))), lit(100L)) < 10
    val index = DocStreams.bandIndex(docs.filter(!isNew))
    val probed = DocStreams.nearDupProbe(docs.filter(isNew), index)
      .groupBy(col("new_doc"), col("index_doc"))
      .agg(first("est_jaccard").as("est_jaccard"))
    val t24 = graft.SparkEntry.queries("t24_incremental_dedup")(spark, dir)
    graft.analytics.Caches.release()
    val a = probed.select("new_doc", "index_doc").as[(Long, Long)]
      .collect().sorted.toSeq
    val b = t24.select("new_doc", "index_doc").as[(Long, Long)]
      .collect().sorted.toSeq
    graft.analytics.Caches.release()
    assert(a === b)
  }
}
