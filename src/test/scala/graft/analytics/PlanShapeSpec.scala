package graft.analytics

import graft.SparkSpec

/** Physical-plan guards for the 100 TB posture: these assert the plan
  * SHAPES the scale design depends on, so a refactor that silently
  * degrades one (a lost pushdown, a join that decays to a cartesian
  * product) fails here instead of at cluster scale.
  *
  * Plans are built at sf0.001 — join strategy picks are size-based and
  * would differ at scale (AQE), so the sweep pins only invariants that
  * hold at any size.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val s = df.queryExecution.executedPlan.toString
    Caches.release()
    s
  }

  test("no registered query plans a CartesianProduct") {
    // A condition-less, non-broadcast join is never the right plan at any
    // scale. (BroadcastNestedLoopJoin is allowed: the band join and the
    // broadcast-side cross joins use it deliberately, with a dimension- or
    // scalar-sized build side.)
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = try plan(name) catch { case e: Throwable =>
        fail(s"$name failed to plan: $e")
      }
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("filters reach the parquet scan in the filter-heavy queries") {
    // p4 is the predicate-pushdown witness: its IN-list + null guard +
    // date bound must appear as PushedFilters on the lineitem scan, not
    // as a post-scan Filter only.
    val p = plan("p4_inlist_filter")
    assert(p.contains("PushedFilters: [IsNotNull"),
      s"expected pushed filters on the scan:\n$p")
  }

  test("the star join broadcasts its dimension sides") {
    val p = plan("j10_star_join")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast dim joins in the star plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("g1's composed gold build broadcasts every dim and never sort-merges") {
    // the one-pass fact-assembly contract: the measurement table reaches
    // the fact through broadcast dim joins only — a dim that decayed to a
    // SortMergeJoin would shuffle the fact five times at 100 TB
    val p = plan("g1_gold_fact")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast dim joins in the gold fact plan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a dim join decayed to sort-merge in the gold fact plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("column pruning reaches the scan for a narrow projection") {
    // j13 reads exactly one column of part; a scan fetching more columns
    // than the projection needs would read 100 TB to use 2 TB
    val p = plan("j13_range_band")
    assert(p.contains("ReadSchema: struct<p_retailprice:double>"),
      s"expected single-column ReadSchema:\n$p")
  }

  test("map-only curation queries stay shuffle-free before the oracle sort") {
    // t25 chunking and t27 scrubbing are per-row maps: their ONLY exchange
    // may be the rangepartitioning for the deterministic oracle ordering.
    // A second exchange means a shuffle crept into a map-only pipeline.
    for (name <- Seq("t25_window_chunks", "t27_blocklist_scrub",
        "f14_regex_extract")) {
      val p = plan(name)
      val exchanges = "(?m)^\\s*\\+?-?\\s*Exchange".r
        .findAllIn(p).length
      assert(exchanges <= 1,
        s"$name: expected at most the sort exchange, got $exchanges:\n$p")
    }
  }

  test("v11 calibration collapses to a broadcast, never a shuffled join") {
    // the per-dim calibration is 64 rows wrapped to ONE row of arrays: if
    // it ever joins the corpus through a shuffle instead of a broadcast,
    // the encode pass inherits a corpus-wide exchange it doesn't need
    val p = plan("v11_quant_encode")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"expected broadcast calibration join:\n$p")
  }

  test("rank-limit pushdown holds in the top-k queries") {
    // The rank()<=k / LIMIT filters must reach the shuffle as
    // WindowGroupLimit (per-partition bounded heaps, only k rows/group
    // cross the wire) or TakeOrderedAndProject (global top-k without a
    // full sort). A Spark upgrade or refactor that drops the pushdown
    // would silently turn these into full sorts of the corpus.
    val v1 = plan("v1_knn_bruteforce")
    assert(v1.contains("WindowGroupLimit"),
      s"v1: expected WindowGroupLimit under the rank filter:\n$v1")
    val w4 = plan("w4_top1_per_group")
    assert(w4.contains("WindowGroupLimit"),
      s"w4: expected WindowGroupLimit under the rank filter:\n$w4")
    val t17 = plan("t17_top_tokens")
    assert(t17.contains("TakeOrderedAndProject") ||
      t17.contains("WindowGroupLimit"),
      s"t17: expected top-k pushdown, not a full sort:\n$t17")
  }

  test("w12's three rank stats share one Window node and one shuffle") {
    // percent_rank + cume_dist + ntile over the same partition/order spec
    // must collapse into a single Window (one hash exchange) plus only
    // the rangepartitioning for the oracle sort — a second Window or
    // third Exchange means the specs diverged and the frame shuffles
    // per-function.
    val p = plan("w12_rank_stats")
    val windows = "(?m)^\\s*\\+?-?\\s*Window\\b".r.findAllIn(p).length
    val exchanges = "(?m)^\\s*\\+?-?\\s*Exchange".r.findAllIn(p).length
    assert(windows == 1, s"w12: expected ONE Window node, got $windows:\n$p")
    assert(exchanges <= 2,
      s"w12: expected window + sort exchanges only, got $exchanges:\n$p")
  }

  test("a partition filter reaches the scan as PartitionFilters") {
    // the bronze layout's whole point: a state/year predicate must prune
    // directories, not scan-and-filter 100 TB
    import org.apache.spark.sql.functions._
    val dir = tmpDir("plan-prune")
    val bronze = graft.model.Fixtures.bronze(spark)
      .withColumn("year", year(col("date_local")))
      .withColumn("month", month(col("date_local")))
    graft.operators.Writers.partitionedAppend(
      bronze, dir, Seq("year", "month", "state_code"))
    val df = spark.read.parquet(dir).filter(col("state_code") === "06")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(state_code"),
      s"expected the state predicate in PartitionFilters:\n$p")
  }
}
