package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 query additions — properties the
  * DuckDB hash-compare can't state (it proves equality, not meaning).
  * Run at sf0.001 on the harness tables.
  */
class QueryInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val rows = df.collect()
    Caches.release()
    (df.columns, rows)
  }

  test("w13 gap fill: spine is contiguous, fills carry the last real value") {
    val (cols, rows) = q("w13_gap_fill")
    val day = cols.indexOf("day")
    val dayTotal = cols.indexOf("day_total")
    val filled = cols.indexOf("filled_total")
    val isGap = cols.indexOf("is_gap")
    val byDay = rows.sortBy(_.getDate(day).toLocalDate.toEpochDay)
    // contiguous daily spine: every consecutive pair is exactly 1 day apart
    byDay.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDate(day).toLocalDate.toEpochDay ==
        a.getDate(day).toLocalDate.toEpochDay + 1,
        s"spine gap between ${a.getDate(day)} and ${b.getDate(day)}")
    }
    assert(byDay.exists(_.getBoolean(isGap)), "fixture produced no gaps")
    // forward-fill: a gap row's filled_total equals the last non-gap total
    var lastReal = Double.NaN
    byDay.foreach { r =>
      if (!r.getBoolean(isGap)) lastReal = r.getDouble(dayTotal)
      assert(!r.isNullAt(filled), "filled_total must never be null")
      assert(r.getDouble(filled) == lastReal,
        s"fill mismatch on ${r.getDate(day)}")
    }
  }

  test("s15 SCD2: intervals chain per user and exactly one is current") {
    val (cols, rows) = q("s15_scd2_intervals")
    val user = cols.indexOf("user_id")
    val from = cols.indexOf("valid_from")
    val to = cols.indexOf("valid_to")
    val current = cols.indexOf("is_current")
    rows.groupBy(_.getLong(user)).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r => (r.getTimestamp(from).getTime))
      // chaining: each interval closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(to) == b.getTimestamp(from),
            s"user $u: interval break at ${a.getTimestamp(to)}")
        case _ => ()
      }
      assert(rs.count(_.getBoolean(current)) == 1,
        s"user $u: expected exactly one current interval")
      // the open interval is the chronologically last one
      assert(sorted.last.getBoolean(current))
      sorted.init.foreach(r => assert(!r.isNullAt(to)))
    }
  }

  test("e7 retention: week-0 cell equals the cohort size") {
    val (cols, rows) = q("e7_retention")
    val cohort = cols.indexOf("cohort_week")
    val weeks = cols.indexOf("weeks_since")
    val n = cols.indexOf("n_users")
    assert(rows.forall(_.getInt(weeks) >= 0))
    // every user is active in their own first week, so the weeks_since=0
    // cell must hold the full cohort — and no later cell can exceed it
    rows.groupBy(_.getDate(cohort)).foreach { case (cw, rs) =>
      val w0 = rs.find(_.getInt(weeks) == 0)
      assert(w0.isDefined, s"cohort $cw missing its week-0 cell")
      assert(rs.forall(_.getLong(n) <= w0.get.getLong(n)),
        s"cohort $cw: a later week exceeds the cohort size")
    }
  }

  test("t18 dedup survivors: kept + removed = docs, totals cover the corpus") {
    val (cols, rows) = q("t18_dedup_survivors")
    val nDocs = cols.indexOf("n_docs")
    val nRemoved = cols.indexOf("n_removed")
    val nKept = cols.indexOf("n_kept")
    rows.foreach { r =>
      assert(r.getLong(nKept) + r.getLong(nRemoved) == r.getLong(nDocs))
    }
    val total = rows.map(_.getLong(nDocs)).sum
    assert(total == Tables.documents(spark, dir).count(),
      "per-source doc counts must cover the whole corpus")
  }

  test("a15 grouping sets: each margin re-sums to the grand total") {
    val (cols, rows) = q("a15_grouping_sets")
    val gs = cols.indexOf("g_status")
    val gp = cols.indexOf("g_priority")
    val n = cols.indexOf("n")
    val grand = rows.filter(r => r.getInt(gs) == 1 && r.getInt(gp) == 1)
    assert(grand.length == 1)
    val totalN = grand.head.getLong(n)
    val statusMargin = rows.filter(r => r.getInt(gs) == 0).map(_.getLong(n)).sum
    val prioMargin = rows.filter(r => r.getInt(gp) == 0 && r.getInt(gs) == 1)
      .map(_.getLong(n)).sum
    assert(statusMargin == totalN, "status margin must cover all orders")
    assert(prioMargin == totalN, "priority margin must cover all orders")
  }

  test("j15 full outer: unmatched sides are both populated and counts add up") {
    val (cols, rows) = q("j15_full_outer")
    val presence = cols.indexOf("presence")
    val nOrders = cols.indexOf("n_orders")
    val nEvents = cols.indexOf("n_events")
    val byPresence = rows.groupBy(_.getString(presence))
    assert(byPresence.contains("orders_only"), "no order-only days")
    assert(byPresence.contains("events_only"), "no event-only days")
    rows.foreach { r =>
      r.getString(presence) match {
        case "orders_only" => assert(r.getLong(nEvents) == 0)
        case "events_only" => assert(r.getLong(nOrders) == 0)
        case "both" => assert(r.getLong(nOrders) > 0 && r.getLong(nEvents) > 0)
      }
    }
    assert(rows.map(_.getLong(nOrders)).sum ==
      Tables.orders(spark, dir).count())
    assert(rows.map(_.getLong(nEvents)).sum ==
      Tables.events(spark, dir).count())
  }

  test("a16 histogram: buckets partition the table") {
    val (cols, rows) = q("a16_histogram")
    val bucket = cols.indexOf("bucket")
    val lo = cols.indexOf("lo")
    val n = cols.indexOf("n")
    rows.foreach { r =>
      assert(r.getDouble(lo) == r.getInt(bucket) * 50000.0)
    }
    assert(rows.map(_.getLong(n)).sum == Tables.orders(spark, dir).count())
    assert(rows.map(_.getInt(bucket)).distinct.length == rows.length)
  }

  test("v7 centroids: one row per (label, dim), every dim covered") {
    val (cols, rows) = q("v7_centroids")
    val label = cols.indexOf("label")
    val i = cols.indexOf("i")
    val c = cols.indexOf("c")
    val labels = Tables.embeddings(spark, dir)
      .select("label").distinct().count()
    assert(rows.length == labels * 64, s"expected $labels labels x 64 dims")
    rows.groupBy(_.getInt(label)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(i)).sorted.toSeq == (0 until 64))
    }
    assert(rows.forall(!_.isNullAt(c)))
  }

  test("t25 window chunks: contiguous indices, full windows except the tail") {
    val (cols, rows) = q("t25_window_chunks")
    val doc = cols.indexOf("doc_id")
    val idx = cols.indexOf("chunk_idx")
    val len = cols.indexOf("chunk_len")
    val W = CurationQueries.ChunkWords.toInt
    val S = CurationQueries.ChunkStride.toInt
    val docLens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.map(_.getLong(doc)).distinct.length == docLens.size,
      "every document must chunk")
    rows.groupBy(_.getLong(doc)).foreach { case (d, rs) =>
      val n = docLens(d)
      val expect = if (n <= W) 1 else 1 + (n - W + S - 1) / S
      val sorted = rs.sortBy(_.getInt(idx))
      assert(sorted.map(_.getInt(idx)).toSeq == (0 until expect),
        s"doc $d: chunk indices not 0..${expect - 1}")
      // all chunks are full windows except possibly the last, which still
      // reaches the document's end exactly
      sorted.init.foreach(r => assert(r.getInt(len) == W))
      assert(sorted.last.getInt(len) == n - (expect - 1) * S)
    }
  }

  test("t26 novelty: every shingle is novel exactly once, at its first doc") {
    val (cols, rows) = q("t26_ngram_novelty")
    val novel = cols.indexOf("n_novel")
    val total = cols.indexOf("n_shingles")
    val ratio = cols.indexOf("novelty")
    rows.foreach { r =>
      assert(r.getLong(novel) <= r.getLong(total))
      assert(r.getDouble(ratio) >= 0.0 && r.getDouble(ratio) <= 1.0)
    }
    // summed over the corpus, n_novel counts each distinct shingle exactly
    // once (at its min-doc_id owner)
    val distinctShingles = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.shingles(
        split(col("text"), " "), 3)).as("s"))
      .select(countDistinct("s")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(novel)).sum == distinctShingles)
    // doc 0 (the corpus minimum) sees everything first
    val first = rows.minBy(_.getLong(cols.indexOf("doc_id")))
    assert(first.getDouble(ratio) == 1.0)
  }

  test("t27 blocklist scrub: removals equal the corpus blocklist hits") {
    val (cols, rows) = q("t27_blocklist_scrub")
    val removed = cols.indexOf("n_removed")
    val nTokens = cols.indexOf("n_tokens")
    assert(rows.exists(_.getInt(removed) > 0), "blocklist never fired")
    rows.foreach(r => assert(r.getInt(removed) <= r.getInt(nTokens)))
    val hits = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(CurationQueries.Blocklist: _*))
      .count()
    assert(rows.map(_.getInt(removed).toLong).sum == hits)
  }

  test("v11 quant encode: error bounded by the coarsest dimension's step") {
    val (cols, rows) = q("v11_quant_encode")
    val n = cols.indexOf("n")
    val avgErr = cols.indexOf("avg_err")
    val maxErr = cols.indexOf("max_err")
    assert(rows.map(_.getLong(n)).sum ==
      Tables.embeddings(spark, dir).count())
    // per-dim |x - decode| <= scale/2 for in-range x, so the per-vector
    // mean squared error can never exceed (max scale)^2 / 4
    val maxScale = graft.SparkEntry.queries("v8_quant_calibration")(spark, dir)
      .agg(max("scale")).collect()(0).getDouble(0)
    val bound = maxScale * maxScale / 4 + 1e-12
    rows.foreach { r =>
      assert(r.getDouble(avgErr) >= 0.0)
      assert(r.getDouble(avgErr) <= r.getDouble(maxErr))
      assert(r.getDouble(maxErr) <= bound,
        s"max_err ${r.getDouble(maxErr)} exceeds quantization bound $bound")
    }
  }

  test("t28 lm score: probabilities bounded, bigram counts match the text") {
    val (cols, rows) = q("t28_lm_score")
    val nBg = cols.indexOf("n_bigrams")
    val score = cols.indexOf("lm_score")
    val minP = cols.indexOf("min_p")
    val docLens = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == docLens.count(_._2 >= 2),
      "one row per doc with at least one bigram")
    rows.foreach { r =>
      val d = r.getLong(cols.indexOf("doc_id"))
      assert(r.getLong(nBg) == docLens(d) - 1, s"doc $d bigram count")
      assert(r.getDouble(score) > 0.0 && r.getDouble(score) <= 1.0)
      assert(r.getDouble(minP) > 0.0, "every doc bigram exists in its own LM")
      assert(r.getDouble(minP) <= r.getDouble(score) + 1e-9)
    }
  }

  test("s16 incremental agg: partial merge equals the full recompute") {
    val (cols, rows) = q("s16_incremental_agg")
    val pr = cols.indexOf("priority")
    val n = cols.indexOf("n_orders")
    val full = Tables.orders(spark, dir)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == full.size)
    rows.foreach(r => assert(r.getLong(n) == full(r.getString(pr)),
      s"merged count diverges for ${r.getString(pr)}"))
  }

  test("qa3 k-anonymity: cells partition events, flag tracks the threshold") {
    val (cols, rows) = q("qa3_k_anonymity")
    val nUsers = cols.indexOf("n_users")
    val nEvents = cols.indexOf("n_events")
    val sup = cols.indexOf("suppress")
    assert(rows.map(_.getLong(nEvents)).sum ==
      Tables.events(spark, dir).count())
    rows.foreach { r =>
      assert(r.getLong(nUsers) <= r.getLong(nEvents))
      assert(r.getBoolean(sup) ==
        (r.getLong(nUsers) < RelationalQueries.KAnonThreshold))
    }
  }

  test("v12 PQ encode: full block coverage and argmin optimality") {
    val (cols, rows) = q("v12_pq_encode")
    val vec = cols.indexOf("vec_id")
    val block = cols.indexOf("block")
    val code = cols.indexOf("code")
    val dist = cols.indexOf("dist")
    val nVec = Tables.embeddings(spark, dir).count()
    assert(rows.length == nVec * 4, "4 block codes per vector")
    rows.groupBy(_.getLong(vec)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(block)).sorted.toSeq == Seq(0, 1, 2, 3))
    }
    assert(rows.forall(_.getDouble(dist) >= 0.0))
    // argmin optimality: recompute the codebook independently and check
    // the emitted code beats every other centroid for a sample of rows
    val embs = Tables.embeddings(spark, dir)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val codebook = embs.groupBy(_._3).view.mapValues { vs =>
      Array.tabulate(64) { i =>
        BigDecimal(vs.map(_._2(i)).sum / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val byId = embs.map(e => e._1 -> e._2).toMap
    rows.take(200).foreach { r =>
      val v = byId(r.getLong(vec)); val b = r.getInt(block)
      def d2(cent: Int): Double = (0 until 16).map { i =>
        val d = v(b * 16 + i) - codebook(cent)(b * 16 + i); d * d
      }.sum
      val got = r.getInt(code)
      codebook.keys.foreach(c =>
        assert(d2(got) <= d2(c) + 1e-9,
          s"vec ${r.getLong(vec)} block $b: code $got not optimal vs $c"))
    }
  }

  test("qa5 modal coverage: counts reconcile and the flag is honest") {
    val (cols, rows) = q("qa5_modal_coverage")
    assert(rows.length == 1)
    val r = rows.head
    val nDocs = r.getLong(cols.indexOf("n_docs"))
    val noVec = r.getLong(cols.indexOf("docs_without_vec"))
    val noDoc = r.getLong(cols.indexOf("vecs_without_doc"))
    assert(nDocs == Tables.documents(spark, dir).count())
    assert(r.getDouble(cols.indexOf("doc_coverage")) ==
      (nDocs - noVec).toDouble / nDocs)
    assert(r.getBoolean(cols.indexOf("aligned")) ==
      (noVec == 0 && noDoc == 0))
  }

  test("m4 asset dedup: modality totals partition the store, bytes add up") {
    val (cols, rows) = q("m4_asset_dedup")
    val nAssets = cols.indexOf("n_assets")
    val nDistinct = cols.indexOf("n_distinct")
    val nDupes = cols.indexOf("n_dupes")
    val bytes = cols.indexOf("bytes_reclaimable")
    assert(rows.length == 3, "image/audio/video rows")
    assert(rows.map(_.getLong(nAssets)).sum ==
      Tables.documents(spark, dir).count())
    rows.foreach { r =>
      assert(r.getLong(nDupes) == r.getLong(nAssets) - r.getLong(nDistinct))
      assert((r.getLong(nDupes) == 0) == (r.getLong(bytes) == 0))
    }
  }

  test("e11 funnel latency: ordered stages, quantiles from real users") {
    val (cols, rows) = q("e11_funnel_latency")
    val stage = cols.indexOf("stage")
    val n = cols.indexOf("n_users")
    val med = cols.indexOf("median_s")
    val p90 = cols.indexOf("p90_s")
    assert(rows.map(_.getString(stage)).sorted.toSeq ==
      Seq("click_to_purchase", "signup_to_click"))
    rows.foreach { r =>
      assert(r.getLong(n) > 0, "stage with no converting users")
      assert(r.getLong(med) >= 0)
      assert(r.getLong(p90) >= r.getLong(med), "p90 below the median")
    }
    // funnel monotonicity: each later step can only lose users
    val byStage = rows.map(r => r.getString(stage) -> r.getLong(n)).toMap
    assert(byStage("click_to_purchase") <= byStage("signup_to_click"))
  }

  test("s19 merge apply: CDC round trip reproduces snapshot v2 in Spark") {
    val (cols, rows) = q("s19_merge_full_apply")
    val k = cols.indexOf("k")
    // s18's changelog classes must reconcile with the applied table size:
    // |v2| = |v1| - removed + added (changed is size-neutral)
    val (dCols, diff) = q("s18_snapshot_diff")
    val ct = dCols.indexOf("change_type")
    val byClass = diff.groupBy(_.getString(ct)).view.mapValues(_.length)
    val v1Size = Tables.orders(spark, dir).count() -
      byClass.getOrElse("added", 0) // v1 misses exactly the 'added' band
    assert(rows.length ==
      v1Size - byClass.getOrElse("removed", 0) + byClass.getOrElse("added", 0))
    assert(rows.map(_.getLong(k)).distinct.length == rows.length,
      "applied table must stay key-unique")
  }

  test("t33 winnowing: match guarantee and density hold") {
    val (cols, rows) = q("t33_winnow_fingerprints")
    val doc = cols.indexOf("doc_id")
    val fp = cols.indexOf("fp")
    val byDoc = rows.groupBy(_.getLong(doc))
      .view.mapValues(_.map(_.getLong(fp)).toSet).toMap
    assert(byDoc.size == Tables.documents(spark, dir).count())
    // density: winnowing emits ≥ 1 and ≤ (#windows) fingerprints per doc
    byDoc.values.foreach(s => assert(s.nonEmpty))
    // match guarantee: a shared run of ≥ WinnowW+2 tokens yields WinnowW
    // consecutive shared shingle hashes, i.e. one full shared window —
    // its min is selected in BOTH docs, so their fingerprint sets must
    // intersect. Find such pairs via a 6-gram inverted index.
    val runLen = TextQueries.WinnowW + 2
    val texts = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val grams = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
    texts.foreach { case (id, toks) =>
      toks.sliding(runLen).foreach { g =>
        if (g.length == runLen) grams(g.toSeq) = grams.getOrElse(g.toSeq, Set()) + id
      }
    }
    val pairs = grams.values.filter(_.size > 1)
      .flatMap(s => s.toSeq.combinations(2)).toSet
    assert(pairs.nonEmpty, "fixture has no shared 6-token runs")
    pairs.foreach { case Seq(a, b) =>
      assert(byDoc(a).intersect(byDoc(b)).nonEmpty,
        s"docs $a and $b share a $runLen-token run but no fingerprint")
    }
  }

  test("v13 PQ recall: per-query bounds, compression visibly lossy") {
    val (cols, rows) = q("v13_pq_recall")
    val nHits = cols.indexOf("n_hits")
    val recall = cols.indexOf("recall_at_3")
    assert(rows.length == 20, "one row per query vector")
    rows.foreach { r =>
      assert(r.getLong(nHits) >= 0 && r.getLong(nHits) <= 3)
      assert(r.getDouble(recall) == math.round(
        r.getLong(nHits) / 3.0 * 1e6) / 1e6)
    }
    val mean = rows.map(_.getLong(nHits)).sum / (3.0 * rows.length)
    // 4-byte codes lose information: recall must be nontrivial but < 1.0
    // would not be guaranteed a priori — assert only the sanity band
    assert(mean > 0.0, "PQ ranking never recovers a true neighbor")
  }

  test("s18 snapshot diff: classes partition the key space by hash band") {
    val (cols, rows) = q("s18_snapshot_diff")
    val ct = cols.indexOf("change_type")
    val oldP = cols.indexOf("old_price")
    val newP = cols.indexOf("new_price")
    val byClass = rows.groupBy(_.getString(ct))
    assert(byClass.keySet == Set("added", "removed", "changed"),
      s"expected all three change classes, got ${byClass.keySet}")
    byClass("added").foreach(r => assert(r.isNullAt(oldP) && !r.isNullAt(newP)))
    byClass("removed").foreach(r => assert(!r.isNullAt(oldP) && r.isNullAt(newP)))
    byClass("changed").foreach { r =>
      assert(r.getDouble(newP) == r.getDouble(oldP) + 1.0,
        "changed rows must carry the deterministic price bump")
    }
  }

  test("j18 interval overlap: bucketed equi-join equals the theta join") {
    val (cols, rows) = q("j18_interval_overlap")
    val user = cols.indexOf("user_id")
    val start = cols.indexOf("start_day")
    val week = cols.indexOf("week_start")
    val ov = cols.indexOf("overlap_days")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(ov) >= 1 && r.getInt(ov) <= 7,
        "overlap with a weekly window is 1..7 days")
      val ws = r.getDate(week).toLocalDate
      assert(ws.getDayOfWeek == java.time.DayOfWeek.MONDAY,
        "campaign windows are Monday-aligned")
      assert(!r.getDate(start).toLocalDate.isAfter(ws.plusDays(6)),
        "emitted pair violates the overlap predicate")
    }
    // no duplicate (streak, week) pairs from the bucket explode
    val keys = rows.map(r => (r.getLong(user), r.getDate(start).toString,
      r.getDate(week).toString))
    assert(keys.distinct.length == keys.length)
  }

  test("qa4 corpus card: single row consistent with direct recounts") {
    val (cols, rows) = q("qa4_corpus_card")
    assert(rows.length == 1)
    val r = rows.head
    val docs = Tables.documents(spark, dir)
    assert(r.getLong(cols.indexOf("n_docs")) == docs.count())
    assert(r.getLong(cols.indexOf("n_langs")) ==
      docs.select("lang").distinct().count())
    val dupRate = r.getDouble(cols.indexOf("dup_rate"))
    assert(dupRate >= 0.0 && dupRate < 1.0)
    assert(r.getLong(cols.indexOf("n_exact_dupes")) ==
      docs.count() - docs.select("text").distinct().count())
  }

  test("t32 containment: bounds hold and jaccard is recoverable") {
    val (cols, rows) = q("t32_containment")
    val nc = cols.indexOf("n_common")
    val ca = cols.indexOf("contain_a")
    val cb = cols.indexOf("contain_b")
    assert(rows.nonEmpty, "fixture produced no high-containment pairs")
    rows.foreach { r =>
      assert(r.getLong(nc) > 0)
      assert(r.getDouble(ca) > 0.0 && r.getDouble(ca) <= 1.0)
      assert(r.getDouble(cb) > 0.0 && r.getDouble(cb) <= 1.0)
      assert(math.max(r.getDouble(ca), r.getDouble(cb)) >= 0.5 - 1e-7,
        "emitted pair below the containment threshold")
    }
  }

  test("w15 islands: streaks reconcile with a per-user day walk") {
    val (cols, rows) = q("w15_islands")
    val user = cols.indexOf("user_id")
    val nDays = cols.indexOf("n_active_days")
    val nStreaks = cols.indexOf("n_streaks")
    val maxStreak = cols.indexOf("max_streak")
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getDate(1).toLocalDate.toEpochDay).sorted)
      .toMap
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      // independent walk over the sorted day list: a streak starts at
      // every day not preceded by its calendar predecessor
      val days = byUser(r.getLong(user))
      val streaks = days.indices.count(i =>
        i == 0 || days(i) != days(i - 1) + 1)
      val longest = {
        var best = 0; var cur = 0
        days.indices.foreach { i =>
          if (i == 0 || days(i) != days(i - 1) + 1) cur = 1 else cur += 1
          best = math.max(best, cur)
        }
        best
      }
      assert(r.getLong(nDays) == days.length)
      assert(r.getLong(nStreaks) == streaks)
      assert(r.getLong(maxStreak) == longest)
    }
  }

  test("e10 type lift: pair counts bounded by both margins, support exact") {
    val (cols, rows) = q("e10_type_lift")
    val nAb = cols.indexOf("n_ab")
    val support = cols.indexOf("support")
    val lift = cols.indexOf("lift")
    val p = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
    val perType = p.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUsers = p.select("user_id").distinct().count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getString(cols.indexOf("type_a"))
      val b = r.getString(cols.indexOf("type_b"))
      assert(a < b, "pairs must be unordered-canonical")
      assert(r.getLong(nAb) <= math.min(perType(a), perType(b)))
      assert(r.getDouble(support) ==
        r.getLong(nAb).toDouble / nUsers)
      assert(r.getDouble(lift) > 0.0)
    }
  }

  test("a17 cube: every grouping combination present, margins re-sum") {
    val (cols, rows) = q("a17_cube")
    val gs = cols.indexOf("g_status")
    val gp = cols.indexOf("g_priority")
    val n = cols.indexOf("n")
    val combos = rows.map(r => (r.getInt(gs), r.getInt(gp))).distinct.sorted
    assert(combos.toSeq == Seq((0, 0), (0, 1), (1, 0), (1, 1)),
      "CUBE must produce the full grouping lattice")
    val grand = rows.filter(r => r.getInt(gs) == 1 && r.getInt(gp) == 1)
    assert(grand.length == 1)
    val total = grand.head.getLong(n)
    // each margin level re-sums to the grand total
    for ((a, b) <- Seq((0, 0), (0, 1), (1, 0))) {
      val s = rows.filter(r => r.getInt(gs) == a && r.getInt(gp) == b)
        .map(_.getLong(n)).sum
      assert(s == total, s"margin ($a,$b) sums to $s, expected $total")
    }
  }

  test("o2 correlated subquery: scalar equals the independent group average") {
    val (cols, rows) = q("o2_correlated_subquery")
    val cust = cols.indexOf("o_custkey")
    val avg_ = cols.indexOf("cust_avg")
    val expected = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")
        / count(lit(1))).as("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(avg_) == expected(r.getLong(cust)),
        s"cust ${r.getLong(cust)}: correlated scalar diverges")
    }
  }

  test("t31 OOV rate: occurrence counts reconcile with the vocab split") {
    val (cols, rows) = q("t31_oov_rate")
    val nTok = cols.indexOf("n_tokens")
    val nOov = cols.indexOf("n_oov")
    val rate = cols.indexOf("oov_rate")
    assert(rows.length ==
      Tables.documents(spark, dir).count(), "one row per document")
    assert(rows.exists(_.getLong(nOov) > 0), "vocab cutoff never binds")
    rows.foreach { r =>
      assert(r.getLong(nOov) <= r.getLong(nTok))
      assert(r.getDouble(rate) >= 0.0 && r.getDouble(rate) <= 1.0)
    }
    // totals: OOV occurrences corpus-wide = occurrences of all terms
    // OUTSIDE the top-K by (count desc, term) — recomputed independently
    val freqs = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val vocab = freqs.sortBy { case (t, n) => (-n, t) }
      .take(TextQueries.OovVocabSize).map(_._1).toSet
    val expectedOov = freqs.filterNot(f => vocab(f._1)).map(_._2).sum
    assert(rows.map(_.getLong(nOov)).sum == expectedOov)
  }

  test("t30 source overlap: symmetric counts, shares bounded by 1") {
    val (cols, rows) = q("t30_source_overlap")
    val a = cols.indexOf("source_a")
    val b = cols.indexOf("source_b")
    val shared = cols.indexOf("n_shared")
    val share = cols.indexOf("share")
    assert(rows.nonEmpty, "fixture produced no cross-source duplicates")
    // n_shared is an intersection size: identical in both directions
    val m = rows.map(r =>
      (r.getString(a), r.getString(b)) -> r.getLong(shared)).toMap
    m.foreach { case ((x, y), n) =>
      assert(m((y, x)) == n, s"asymmetric intersection for ($x,$y)")
    }
    rows.foreach { r =>
      assert(r.getDouble(share) > 0.0 && r.getDouble(share) <= 1.0)
      assert(r.getString(a) != r.getString(b))
    }
  }

  test("t29 MAD outliers: medians match an independent sort, flags exact") {
    val (cols, rows) = q("t29_mad_outliers")
    val src = cols.indexOf("source")
    val nc = cols.indexOf("n_chars")
    val med = cols.indexOf("med")
    val mad = cols.indexOf("mad")
    val flag = cols.indexOf("is_outlier")
    rows.groupBy(_.getString(src)).foreach { case (s, rs) =>
      // independent recompute: rank-ceil(n/2) element of the sorted values
      val lens = rs.map(_.getLong(nc)).sorted
      val m = lens((lens.length + 1) / 2 - 1)
      assert(rs.forall(_.getLong(med) == m), s"median mismatch for $s")
      val devs = rs.map(r => math.abs(r.getLong(nc) - m)).sorted
      val md = devs((devs.length + 1) / 2 - 1)
      assert(rs.forall(_.getLong(mad) == md), s"MAD mismatch for $s")
      rs.foreach { r =>
        val dev = math.abs(r.getLong(nc) - m)
        assert(r.getBoolean(flag) == (md > 0 && dev > 3 * md))
      }
    }
  }

  test("e9 volume anomaly: no score without 14 days of history") {
    val (cols, rows) = q("e9_volume_anomaly")
    val day = cols.indexOf("day")
    val z = cols.indexOf("z")
    val anom = cols.indexOf("is_anomaly")
    val byDay = rows.sortBy(_.getDate(day).toLocalDate.toEpochDay)
    // the frame is PRECEDING-only: day k has k prior days, so the first 14
    // rows can never satisfy the m >= 14 guard
    byDay.take(14).foreach(r => assert(r.isNullAt(z), "early day scored"))
    assert(byDay.drop(14).exists(!_.isNullAt(z)), "no day ever scored")
    byDay.foreach { r =>
      assert(r.isNullAt(z) == r.isNullAt(anom))
      if (!r.isNullAt(z))
        assert(r.getBoolean(anom) == (math.abs(r.getDouble(z)) > 3))
    }
  }

  test("t47 span cut reconciles with t44's census: covered positions " +
      "agree per source, and the re-emitted text accounts every token") {
    val (cols47, rows47) = q("t47_dup_span_cut")
    val (cols44, rows44) = q("t44_dup_ngram_spans")
    val src47 = cols47.indexOf("source")
    val dup47 = cols47.indexOf("dup_tokens")
    val cut47 = cols47.indexOf("cut_tokens")
    val tok47 = cols47.indexOf("tokens")
    val kept47 = cols47.indexOf("kept_tokens")
    val byS44 = rows44.map(r => r.getString(cols44.indexOf("source")) ->
      r.getLong(cols44.indexOf("dup_tokens"))).toMap
    assert(rows47.nonEmpty)
    var cutTotal = 0L
    rows47.foreach { r =>
      val s = r.getString(src47)
      // two INDEPENDENT pipelines (t44's count-join vs t47's
      // min-struct ownership join) must agree on the covered set
      assert(r.getLong(dup47) === byS44(s),
        s"$s: t47 covered=${r.getLong(dup47)} vs t44=${byS44(s)}")
      // the CUT never removes more than the covered set (per source an
      // owner's positions can ALL be re-covered by other grams' removed
      // spans, so only <= holds locally)
      assert(r.getLong(cut47) <= r.getLong(dup47))
      // the re-emitted corpus accounts every surviving token
      assert(r.getLong(kept47) === r.getLong(tok47) - r.getLong(cut47),
        s"$s: re-emit lost tokens")
      cutTotal += r.getLong(cut47)
    }
    assert(cutTotal > 0, "fixture produced no duplicated spans to cut")
    // globally the ownership must preserve something: at least one
    // owner position survives un-re-covered somewhere in the corpus
    val dupTotal = rows47.map(_.getLong(dup47)).sum
    assert(cutTotal < dupTotal,
      s"ownership kept nothing: cut=$cutTotal covered=$dupTotal")
  }
}
