package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proofs that the quadratic-risk dedup paths stay bounded under hot keys:
  * the t7 shingle document-frequency cap and the v3 bucket sub-splitting.
  * Each test builds a synthetic corpus where the uncapped plan would blow
  * up and asserts the pair space the capped plan actually produces.
  */
class ScaleCapsSpec extends SparkSpec {
  import spark.implicits._

  test("t7 df cap drops ubiquitous shingles; bounded shingles still pair") {
    val dir = tmpDir("t7-hotkey")
    // 150 docs sharing one hot shingle (df = 150 > MaxShingleDf = 100) —
    // without the cap: 150·149/2 ≈ 11k pairs on that key alone. Plus 5
    // docs sharing a bounded shingle (df = 5) that must still pair.
    val hot = (0 until 150).map(i =>
      (i.toLong, s"hot key shingle u$i v$i w$i", "en", "syn", 20L))
    val warm = (0 until 5).map(i =>
      (1000L + i, s"warm little shingle x$i y$i z$i", "en", "syn", 20L))
    (hot ++ warm).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("t7_ngram_jaccard")(spark, dir)
      .collect()
    graft.analytics.Caches.release()
    // all surviving pairs come from the warm shingle's 5 docs
    assert(got.length === 5 * 4 / 2)
    assert(got.forall(r => r.getAs[Long]("doc_a") >= 1000L
      && r.getAs[Long]("doc_b") >= 1000L))
  }

  test("t5 LSH bucket cap drops a hot minhash bucket; small buckets still pair") {
    val dir = tmpDir("t5-hotbucket")
    // 150 identical docs share every minhash → all 8 band buckets hold 150
    // (> MaxBandBucket = 100) → without the cap: 8 · 150·149/2 ≈ 89k joined
    // rows. 5 identical docs of a different text form size-5 buckets that
    // must still pair (est_jaccard 1.0).
    val hot = (0 until 150).map(i =>
      (i.toLong, "hot boilerplate page footer terms privacy contact", "en", "syn", 48L))
    val warm = (0 until 5).map(i =>
      (1000L + i, "warm unique little story about mountain lakes", "en", "syn", 45L))
    (hot ++ warm).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("t5_minhash_lsh")(spark, dir).collect()
    graft.analytics.Caches.release()
    assert(got.length === 5 * 4 / 2)
    assert(got.forall(r => r.getAs[Long]("doc_a") >= 1000L
      && r.getAs[Long]("doc_b") >= 1000L))
    assert(got.forall(_.getAs[Double]("est_jaccard") === 1.0))
  }

  test("t10 simhash band cap drops a hot band bucket; small buckets still pair") {
    val dir = tmpDir("t10-hotband")
    // identical docs → identical 60-bit signatures → every band bucket of
    // the hot group holds 150 (> MaxBandBucket) and is dropped; the warm
    // group's size-5 buckets survive and pair at hamming 0.
    val hot = (0 until 150).map(i =>
      (i.toLong, "hot boilerplate page footer terms privacy contact", "en", "syn", 48L))
    val warm = (0 until 5).map(i =>
      (1000L + i, "warm unique little story about mountain lakes", "en", "syn", 45L))
    (hot ++ warm).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("t10_simhash_pairs")(spark, dir).collect()
    graft.analytics.Caches.release()
    assert(got.length === 5 * 4 / 2)
    assert(got.forall(r => r.getAs[Long]("doc_a") >= 1000L
      && r.getAs[Long]("doc_b") >= 1000L))
    assert(got.forall(_.getAs[Int]("hamming") === 0))
  }

  test("v3 sub-bucketing splits an oversized bucket on sign bits") {
    val dir = tmpDir("v3-hotbucket")
    // one label bucket of 600 vectors (> threshold 256 → 2 sign bits →
    // 4 sub-buckets of 150); vectors within a sign pattern are
    // near-identical, so every within-sub-bucket pair passes cosine 0.25.
    val rows = (0 until 600).map { i =>
      val s0 = if (i % 4 % 2 == 0) 1.0f else -1.0f
      val s1 = if (i % 4 / 2 == 0) 1.0f else -1.0f
      val v = Array(s0, s1) ++ Array.fill(62)(0.5f + (i % 7) * 0.001f)
      (i.toLong, v.toSeq, 1)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = graft.SparkEntry.queries("v3_cosine_neardup")(spark, dir)
      .collect()
    // exactly the 4 × C(150,2) within-sub-bucket pairs — the 600² cross-
    // pattern pairs never materialize
    assert(got.length === 4 * (150 * 149 / 2))
    val signOf = (id: Long) => (id % 4).toInt
    assert(got.forall(r =>
      signOf(r.getAs[Long]("vec_a")) === signOf(r.getAs[Long]("vec_b"))))
  }

  test("connected components throws rather than split a long chain") {
    val chain = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a", "b")
    // diameter 11 > maxIter 3 → must signal, not return split components
    val e = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("converge"))
    // maxIter = diameter exactly: the final labels land in round 11 and
    // the quiescence probe (which doesn't count against the bound)
    // confirms convergence instead of throwing
    val ok = graft.operators.ConnectedComponents(chain, maxIter = 11)
      .agg(countDistinct("component")).head().getLong(0)
    assert(ok === 1L)
  }

  test("t38 two-phase per-source cap is exact under a dominant hot " +
      "source and invariant to the shard count") {
    // one source owns 94% of the corpus — a single source-partitioned
    // window would funnel it through one task; the two-phase path takes
    // per-(source, shard) heads first. Exactness pin: the sharded
    // keep-set must equal the 1-shard (single-window-equivalent) run
    // bit-for-bit, and the hot source keeps exactly `cap` docs.
    val hot = (0 until 4700).map(i => (i.toLong, "hotsrc"))
    val small = (0 until 150).map(i => (100000L + i, "smallsrc")) ++
      (0 until 7).map(i => (200000L + i, "tinysrc")) // below the cap
    val docs = (hot ++ small).toDF("doc_id", "source")
    val cap = 100
    def keep(shards: Int): Seq[(String, Long, Int)] =
      TextQueries.cappedKeepSet(docs, cap, shards)
        .select("source", "doc_id", "rk")
        .as[(String, Long, Int)].collect().toSeq.sorted
    val sharded = keep(32)
    assert(sharded === keep(1),
      "the sharded keep-set must equal the single-window keep-set")
    val bySource = sharded.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySource === Map(
      "hotsrc" -> cap, "smallsrc" -> cap, "tinysrc" -> 7))
    // ranks are a contiguous 1..kept prefix per source (no survivor
    // lost to phase 1 — the top-cap property the two-phase relies on)
    sharded.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toSeq,
        s"$src ranks must be the contiguous prefix")
    }
  }

  test("t45 two-phase prefix sum is invariant to the bucket depth and " +
      "no phase-1 partition holds more than its aligned share") {
    // 20k docs: the global running total must be bit-identical whether
    // the order splits into 16, 256 or 4096 aligned buckets, and at the
    // default depth no bucket (= window partition) may hold more than a
    // small multiple of corpus/256 — the scale-out property that keeps
    // phase 1 parallel at 100× data.
    val docs = (0 until 20000).map(i =>
      (i.toLong, s"src${i % 5}", 10L + (i % 90))).toDF(
      "doc_id", "source", "n_chars")
    def prefix(digits: Int): Seq[(Long, Long)] = {
      val got = TextQueries.budgetPrefix(docs, digits)
        .select("doc_id", "before_chars")
        .as[(Long, Long)].collect().toSeq.sorted
      Caches.release()
      got
    }
    val d2 = prefix(2)
    assert(d2 === prefix(1), "depth 1 vs 2 must agree bit-for-bit")
    assert(d2 === prefix(3), "depth 2 vs 3 must agree bit-for-bit")
    // the deepest doc's before_chars equals the total minus its own
    val total = (0 until 20000).map(i => 10L + (i % 90)).sum
    assert(d2.map(_._2).max < total)
    // aligned-share bound at the default depth: md5 is uniform, so a
    // bucket of 20k/256 ≈ 78 expected rows stays under 4× the mean
    val sizes = TextQueries.budgetPrefix(docs,
        TextQueries.SampleBucketDigits)
      .groupBy("bucket").count().select("count")
      .as[Long].collect().toSeq
    Caches.release()
    assert(sizes.length > 200, s"~256 buckets expected: ${sizes.length}")
    assert(sizes.max < 4L * (20000 / 256 + 1),
      s"no phase-1 partition may hold a hot share: max=${sizes.max}")
  }

  test("t48 BPE trains on the vocab table: rules match a reference " +
      "greedy trainer (integer-exact tie-breaks) and the per-round " +
      "working set stays exactly vocab-sized") {
    val dir = tmpDir("t48-bpe")
    // the classic BPE teaching corpus — engineered so round 1 is a
    // genuine COUNT TIE ((e,s) vs (s,t), both 9) decided only by the
    // lexicographic tie-break, and merges compose across rounds
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.grouped(4).zipWithIndex.map { case (ws, i) =>
      val t = ws.mkString(" ")
      (i.toLong, t, "en", "syn", t.length.toLong)
    }.toSeq
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // reference trainer: greedy leftmost merge with consume-and-skip —
    // exactly the semantics the engine's textual replace implements
    def refBpe(freq: Map[String, Long], rounds: Int)
        : Seq[(Int, String, String, String, Long)] = {
      var vocab: Map[Vector[String], Long] =
        freq.map { case (w, n) => w.map(_.toString).toVector -> n }
      (1 to rounds).map { step =>
        val counts = scala.collection.mutable
          .Map.empty[(String, String), Long]
        vocab.foreach { case (toks, n) =>
          toks.iterator.sliding(2).withPartial(false).foreach { p =>
            val k = (p.head, p(1))
            counts(k) = counts.getOrElse(k, 0L) + n
          }
        }
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        vocab = vocab.map { case (toks, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              out += l + r; i += 2
            } else { out += toks(i); i += 1 }
          }
          out.result() -> n
        }
        (step, l, r, l + r, cnt)
      }
    }

    val got = graft.SparkEntry.queries("t48_bpe_train")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    Caches.release()
    val freq = words.groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    assert(got === refBpe(freq, TextQueries.BpeRounds))
    // per-round state is the DISTINCT-WORD table and nothing more: the
    // corpus is read once (the first aggregate) — every later round
    // iterates on the vocab-frequency rows
    assert(TextQueries.lastBpeVocabSizes.length ===
      TextQueries.BpeRounds + 1)
    assert(TextQueries.lastBpeVocabSizes.forall(_ === freq.size.toLong),
      s"the working set must stay vocab-sized: " +
        s"${TextQueries.lastBpeVocabSizes} vs vocab ${freq.size}")
  }

  test("checkpoint cache mode yields identical t5 results to persist mode") {
    // the 100 TB materialization switch: multi-consumer stages cut to
    // executor-local shuffle files instead of storage-memory blocks —
    // must be a pure performance choice, never a semantic one
    val dir = "/root/testdata/sf0.001"
    val base = graft.SparkEntry.queries("t5_minhash_lsh")(spark, dir)
      .collect().toSeq
    Caches.release()
    spark.conf.set(Caches.ModeKey, "checkpoint")
    try {
      val ck = graft.SparkEntry.queries("t5_minhash_lsh")(spark, dir)
        .collect().toSeq
      assert(ck === base)
    } finally {
      spark.conf.unset(Caches.ModeKey)
      Caches.release()
    }
  }
}
