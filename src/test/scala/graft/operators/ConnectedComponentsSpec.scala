package graft.operators

import graft.SparkSpec
import graft.pipeline.Ingest
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, star, singleton-free edge list") {
    // components: {1,2,3,4} (chain), {10,11,12} (star on 10), {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (21L, 20L)).toDF("src", "dst")
    val got = ConnectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("keepers marks exactly one keeper per cluster") {
    val edges = Seq((5L, 9L), (9L, 7L), (1L, 2L)).toDF("a", "b")
    val k = ConnectedComponents.keepers(edges)
    assert(k.filter(col("is_keeper")).count() === 2)
    assert(k.filter(col("keeper") === 5L).count() === 3)
  }

  test("components over LSH candidate pairs cluster the fixture docs") {
    // end-to-end: shared-shingle candidate pairs → edges → components
    // (shared 4-gram ⇒ same component)
    val docs = Seq(
      (1L, "x y z w q"), (2L, "x y z w k"),  // share 4-gram "x y z w"
      (3L, "a b c d e"), (4L, "a b c d f"),  // share "a b c d"
      (5L, "p q r s t"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(
        split(col("text"), " "), 4)).as("s"))
    val edges = sh.toDF("a", "s").join(sh.toDF("b", "s"), Seq("s"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    val comp = ConnectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(2L) === 1L && comp(4L) === 3L)
    assert(!comp.contains(5L)) // no edges → not in the edge-derived set
  }

  test("checkpoint mode: reliable engages with a checkpoint dir, local still works") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
    // explicit local mode, independent of session state
    val local = ConnectedComponents(edges, reliable = Some(false)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === expected)
    // with a checkpoint dir configured, the default (None) auto-selects
    // reliable per-round materialization — cluster durability without
    // caller changes
    val ckpt = tmpDir("cc-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      val result = ConnectedComponents(edges)
      val auto = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(auto === expected)
      // retention contract: superseded rounds and the symmetrized edge
      // list are deleted eagerly; exactly one round file (the returned
      // labels) survives the run
      val rounds = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(p => p.getFileName.toString.startsWith("round-"))
        .toArray.toSeq
      assert(rounds.size === 1,
        s"exactly the final labels round should remain on disk, got $rounds")
      // the surviving file backs the returned frame — re-reading it works
      assert(result.count() === 3)
    } finally {
      // the shared session outlives this suite: leaving a checkpoint dir
      // set would silently flip every later CC call to reliable mode
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("path graph (diameter 999) converges in O(log n) pointer-jump rounds") {
    // plain min-propagation needs ~999 rounds on a 1000-node chain; with
    // the pointer-jump active from round JumpFrom, reach doubles per
    // round — maxIter=14 (≈ 2 plain + log₂(1000) jumping + slack) must
    // suffice, and every node must land in component 0
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = ConnectedComponents(edges, maxIter = 14)
    assert(labels.count() === 1000)
    assert(labels.filter(col("component") =!= 0L).count() === 0)
  }

  test("stress: ~1e5 edges with skewed stars + deep chain, round bound holds, one labels file") {
    // The 100 TB posture's local witness: a skewed graph at ~10^5 edges —
    //   star A: 50k spokes on one hub (the hot-key shape LSH dedup emits
    //           when a boilerplate cluster collapses onto one doc),
    //   star B: 30k spokes,
    //   chain:  4097 nodes (diameter 4096 — the adversarial depth),
    //   8k disjoint pairs (the long tail of 2-doc dups).
    // maxIter is set EXACTLY at the pointer-doubling bound
    //   JumpFrom + ceil(log2(diameter)) + 2 = 4 + 12 + 2 = 18
    // so mere convergence AT this bound is the round-count assertion: one
    // more changing round than the bound and apply() throws instead.
    val starA = (1L to 50000L).map(i => (1000000L, 1000000L + i))
    val starB = (1L to 30000L).map(i => (2000000L, 2000000L + i))
    val chain = (0L until 4096L).map(i => (i, i + 1))
    val pairs = (0L until 8000L).map(i => (3000000L + 2 * i, 3000001L + 2 * i))
    val edges = (starA ++ starB ++ chain ++ pairs).toDF("src", "dst")
      .repartition(16)
    val bound = ConnectedComponents.JumpFrom +
      (64 - java.lang.Long.numberOfLeadingZeros(4096L - 1)) + 2
    assert(bound === 18)
    val ckpt = tmpDir("cc-stress-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      val labels = ConnectedComponents(edges, maxIter = bound).cache()
      // every node present, component = min id of its structure
      assert(labels.count() === 50001 + 30001 + 4097 + 16000)
      assert(labels.select(countDistinct(col("component"))).head().getLong(0)
        === 1 + 1 + 1 + 8000)
      assert(labels.filter(col("node") >= 1000000L && col("node") <= 1050000L)
        .filter(col("component") =!= 1000000L).count() === 0)
      assert(labels.filter(col("node") < 1000000L)
        .filter(col("component") =!= 0L).count() === 0)
      // reliable-mode retention at stress scale: exactly the final labels
      // round survives (superseded rounds were deleted eagerly)
      val rounds = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(p => p.getFileName.toString.startsWith("round-"))
        .toArray.toSeq
      assert(rounds.size === 1,
        s"exactly the final labels round should remain on disk, got $rounds")
      labels.unpersist()
    } finally {
      spark.sparkContext.setCheckpointDir(null)
    }
    // the same chain with a bound below its pointer-doubling depth must
    // throw, not silently return split components
    val tooLow = intercept[IllegalStateException](
      ConnectedComponents(chain.toDF("src", "dst"), maxIter = 3,
        reliable = Some(false)).count())
    assert(tooLow.getMessage.contains("did not converge"))
  }

  test("rolling ingest window computes T-110..T-100") {
    val (from, to) = Ingest.rollingWindow(java.time.LocalDate.of(2026, 8, 12))
    assert(from.toString === "2026-04-24" && to.toString === "2026-05-04")
    val df = Seq("2026-04-23", "2026-04-24", "2026-05-03", "2026-05-04")
      .toDF("s").select(to_date(col("s")).as("date_local"))
    val kept = Ingest.windowFilter(df, from, to).collect().map(_.getDate(0).toString)
    assert(kept.sorted.toSeq === Seq("2026-04-24", "2026-05-03"))
  }
}
