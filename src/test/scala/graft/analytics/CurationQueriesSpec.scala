package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for the curation-query additions (packing,
  * repetition signals, mixture weights, Lloyd iteration) — properties the
  * DuckDB hash-compare can't state. Run at sf0.001 on the harness tables.
  */
class CurationQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val rows = df.collect()
    Caches.release()
    (df.columns, rows)
  }

  test("t20 packing: per-shard offsets are gapless and chunks consistent") {
    val (cols, rows) = q("t20_seq_pack")
    val shard = cols.indexOf("shard")
    val nTok = cols.indexOf("n_tokens")
    val off = cols.indexOf("tok_offset")
    val first = cols.indexOf("chunk_first")
    val span = cols.indexOf("n_chunks")
    assert(rows.map(_.getInt(shard)).distinct.length > 1,
      "fixture should exercise multiple shards")
    rows.groupBy(_.getInt(shard)).foreach { case (sh, rs) =>
      // gapless concatenation: offsets tile the shard's token stream
      val sorted = rs.sortBy(_.getLong(off))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(off) == expect, s"shard $sh: offset gap at $expect")
        expect += r.getLong(nTok)
      }
      sorted.foreach { r =>
        val c = CurationQueries.ChunkTokens
        assert(r.getLong(first) == r.getLong(off) / c)
        val last = (r.getLong(off) + r.getLong(nTok) - 1) / c
        assert(r.getLong(span) == last - r.getLong(first) + 1)
        assert(r.getLong(span) >= 1)
      }
    }
    // docs longer than one chunk must split; none here exceed 2 chunks
    assert(rows.forall(_.getLong(span) <= 2))
  }

  test("c3 composed tokenizer lifecycle reconciles with its stages") {
    val (cols, rows) = q("c3_tokenizer_lifecycle")
    def colOf(n: String) = cols.indexOf(n)
    val bySource = rows.map(r => r.getString(colOf("source")) -> r).toMap

    // stage-4 invariants (the t23 contract on the ENCODED stream):
    // shares sum to 1, weight·share = 1/k for every source
    val k = rows.length.toDouble
    assert(math.abs(rows.map(_.getDouble(colOf("token_share"))).sum - 1.0)
      < 1e-4)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(colOf("weight"))
        * r.getDouble(colOf("token_share")) - 1.0 / k) < 1e-4)
    }

    // encode stage agrees with the WHITESPACE census of t23: same
    // word counts went in (pack-before-encode mis-wirings change this)
    val (tcols, trows) = q("t23_mixture_weights")
    val wWords = trows.map(r => r.getString(tcols.indexOf("source"))
      -> r.getLong(tcols.indexOf("n_tokens"))).toMap
    assert(bySource.keySet == wWords.keySet)
    bySource.foreach { case (src, r) =>
      assert(r.getLong(colOf("n_words")) == wWords(src),
        s"$src: c3 word census diverged from t23")
      // BPE starts char-level: every word is >= 1 token, so the
      // encoded stream can never be shorter than the word stream
      assert(r.getLong(colOf("n_bpe")) >= r.getLong(colOf("n_words")))
      // pack stage: every doc lands in >= 1 chunk
      assert(r.getLong(colOf("chunk_spans")) >= r.getLong(colOf("n_docs")))
    }

    // encode stage agrees with a FROM-SCRATCH driver-side application
    // of the trained merge rules (one pass per rule, leftmost
    // non-overlapping — the `replace` contract), per source
    val (_, rules) = TextQueries.bpeTrain(spark, dir)
    Caches.release()
    def encode(word: String): Long = {
      var toks = word.map(_.toString).toVector
      rules.foreach { case (_, l, r, merged, _) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            b += merged; i += 2
          } else { b += toks(i); i += 1 }
        }
        toks = b.result()
      }
      toks.length.toLong
    }
    val docs = Tables.documents(spark, dir)
      .select("source", "text").collect()
    val want = docs.groupBy(_.getString(0)).map { case (src, rs) =>
      src -> rs.map(_.getString(1).split(" ", -1).map(w =>
        if (w.matches("[a-z]+")) encode(w) else 1L).sum).sum
    }
    bySource.foreach { case (src, r) =>
      assert(r.getLong(colOf("n_bpe")) == want(src),
        s"$src: c3 encode diverged from driver-side BPE apply")
    }
  }

  test("t22 repetition: fractions bounded, mode count exact on a probe doc") {
    val (cols, rows) = q("t22_repetition")
    val nTok = cols.indexOf("n_tokens")
    val topN = cols.indexOf("top_token_n")
    val topF = cols.indexOf("top_token_frac")
    val dupF = cols.indexOf("dup_bigram_frac")
    rows.foreach { r =>
      assert(r.getLong(topN) >= 1 && r.getLong(topN) <= r.getLong(nTok))
      assert(r.getDouble(topF) > 0 && r.getDouble(topF) <= 1)
      assert(r.getDouble(dupF) >= 0 && r.getDouble(dupF) < 1)
    }
    // independent recomputation of the mode count for the first doc
    val doc = Tables.documents(spark, dir).orderBy("doc_id")
      .select("text").as[String](org.apache.spark.sql.Encoders.STRING)
      .head()
    val want = doc.split(" ").groupBy(identity).values.map(_.length).max
    val got = rows.minBy(_.getLong(cols.indexOf("doc_id"))).getLong(topN)
    assert(got == want, s"mode count: got $got want $want")
  }

  test("t23 mixture weights: shares sum to 1, weights flatten the mix") {
    val (cols, rows) = q("t23_mixture_weights")
    val share = cols.indexOf("token_share")
    val weight = cols.indexOf("weight")
    val nTok = cols.indexOf("n_tokens")
    assert(math.abs(rows.map(_.getDouble(share)).sum - 1.0) < 1e-4)
    // weight × share is the same for every source (uniform target):
    // weight = total/(k·tok) so weight·share = 1/k exactly
    val k = rows.length.toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(weight) * r.getDouble(share) - 1.0 / k)
        < 1e-4)
    }
    // over-represented sources are down-weighted and vice versa
    val total = rows.map(_.getLong(nTok)).sum.toDouble
    rows.foreach { r =>
      val over = r.getLong(nTok) / total > 1.0 / k
      assert((r.getDouble(weight) < 1.0) == over)
    }
  }

  test("v9 Lloyd iteration: partition sizes, 64 dims each, E-step argmax") {
    val (cols, rows) = q("v9_kmeans_iter")
    val cid = cols.indexOf("centroid_id")
    val dim = cols.indexOf("i")
    val members = cols.indexOf("n_members")
    val n = Tables.embeddings(spark, dir).count()
    // every cluster emits exactly one row per dimension
    rows.groupBy(_.getLong(cid)).foreach { case (c, rs) =>
      assert(rs.map(_.getInt(dim)).sorted.toSeq == (0 until 64),
        s"cluster $c: dims not 0..63")
      assert(rs.map(_.getLong(members)).distinct.length == 1)
    }
    // members partition the corpus (every vector assigned exactly once)
    val sizes = rows.groupBy(_.getLong(cid))
      .map { case (_, rs) => rs.head.getLong(members) }
    assert(sizes.sum == n, s"sizes ${sizes.sum} != corpus $n")
    // E-step optimality: a sampled vector's assigned centroid beats any
    // other centroid on cosine similarity
    import graft.functions.{VectorFunctions => VF}
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VF.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VF.norm(col("v")))
    val cent = e.filter(col("vec_id") % VectorQueries.CentroidStep === 0)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"),
        col("nrm").as("cn"))
    val best = e.limit(5).crossJoin(cent)
      .withColumn("ccos", VF.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"),
        struct(col("ccos"), (-col("centroid_id")).as("neg"))).as("want"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // assignment itself isn't in the output; the argmax winners' clusters
    // must at least be non-empty in the result
    best.values.foreach { c =>
      assert(rows.exists(_.getLong(cid) == c),
        s"centroid $c won an argmax but emitted no rows")
    }
  }

  test("t24 incremental dedup: pairs cross the batch/index partition") {
    val (cols, rows) = q("t24_incremental_dedup")
    val newDoc = cols.indexOf("new_doc")
    val idxDoc = cols.indexOf("index_doc")
    val est = cols.indexOf("est_jaccard")
    assert(rows.nonEmpty, "fixture produced no candidate pairs")
    // recompute the batch predicate independently (t11's sample)
    import org.apache.spark.unsafe.types.UTF8String
    def isNew(docId: Long): Boolean =
      graft.plans.PolyHashExpr.hash(
        UTF8String.fromString(s"smpl|$docId")) % 100 < 10
    rows.foreach { r =>
      assert(isNew(r.getLong(newDoc)),
        s"doc ${r.getLong(newDoc)} on the new side is not in the batch")
      assert(!isNew(r.getLong(idxDoc)),
        s"doc ${r.getLong(idxDoc)} on the index side is in the batch")
      assert(r.getDouble(est) > 0 && r.getDouble(est) <= 1)
    }
  }

  test("v10 ANN recall: bounded, hits consistent, ground truth complete") {
    val (cols, rows) = q("v10_ann_recall")
    val hits = cols.indexOf("n_hits")
    val recall = cols.indexOf("recall_at_3")
    // every query vector (vec_id < 20) reports — misses don't drop out
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(hits) >= 0 && r.getLong(hits) <= 3)
      assert(math.abs(r.getDouble(recall) - r.getLong(hits) / 3.0) < 1e-6)
    }
    // a 4-bit LSH on this corpus should find SOMETHING but not everything
    val total = rows.map(_.getLong(hits)).sum
    assert(total > 0, "zero recall across all queries — probe is broken")
    assert(total < 60, "perfect recall at 16 buckets is implausible")
  }
}
