package graft.analytics

import graft.SparkSpec

/** Scale sanity for the flagship composition (round 9, VERDICT task 6):
  * run g2_gold_lakehouse's full derivation at sf0.01 AND sf0.1 (the
  * largest local data on this box — 10x apart) and pin that the plan
  * SHAPE is identical: the catalog scans' reported statistics still
  * drive every dim join to a broadcast, nothing decays to a sort-merge
  * or cartesian, at both sizes. Wall times are recorded (non-gating —
  * this box's timing noise is not a correctness signal); the shape
  * equality is the gate. A stats mis-report that flips a join side at
  * bigger data would break here before it breaks at cluster scale. */
class G2ScaleSanitySpec extends SparkSpec {

  /** (BroadcastHashJoin, SortMergeJoin, ShuffledHashJoin,
    * CartesianProduct, BroadcastNestedLoopJoin) counts in the final
    * (post-AQE) physical plan — the size-sensitive operator census. */
  private def fingerprint(plan: String): (Int, Int, Int, Int, Int) = {
    def count(op: String): Int = op.r.findAllIn(plan).length
    (count("BroadcastHashJoin"), count("SortMergeJoin"),
      count("ShuffledHashJoin"), count("CartesianProduct"),
      count("BroadcastNestedLoopJoin"))
  }

  private def runAt(dir: String): ((Int, Int, Int, Int, Int), Double) = {
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries("g2_gold_lakehouse")(spark, dir)
    df.collect() // execute: AQE's final plan is only real after the run
    val secs = (System.nanoTime() - t0) / 1e9
    val fp = fingerprint(df.queryExecution.executedPlan.toString)
    Caches.release()
    (fp, secs)
  }

  test("g2's plan shape is invariant from sf0.01 to sf0.1 and every " +
      "dim join stays a broadcast") {
    val (fpSmall, tSmall) = runAt("/root/testdata/sf0.01")
    val (fpBig, tBig) = runAt("/root/testdata/sf0.1")
    info(f"g2@sf0.01: $tSmall%.2fs fingerprint=$fpSmall")
    info(f"g2@sf0.1:  $tBig%.2fs fingerprint=$fpBig")

    assert(fpSmall === fpBig,
      s"the plan shape must not change with 10x data: " +
        s"sf0.01=$fpSmall vs sf0.1=$fpBig")
    val (bhj, smj, shj, cp, _) = fpBig
    assert(bhj >= 4,
      s"all four dim joins must broadcast off reported stats, got $bhj")
    assert(smj === 0 && cp === 0,
      s"no dim join may decay to sort-merge ($smj) or cartesian ($cp)")
    assert(shj === 0, s"no shuffled-hash dim joins expected, got $shj")

    // r20 hygiene: the per-run UUID catalog confs must not accumulate —
    // after two back-to-back runs only the LATEST run's pair survives
    // (its result was just consumed; the next run drops it)
    val g2Keys = spark.conf.getAll.keys
      .filter(_.startsWith("spark.sql.catalog.g2c_")).toSeq
    assert(g2Keys.length <= 2,
      s"g2 scratch-catalog confs leaked across runs: $g2Keys")
  }

  /** sf1 leg (round 10, VERDICT task 6): another 10x on top of sf0.1.
    * The driver ships no sf1 data, so this test DERIVES one: lineitem
    * replicated 10x with per-copy day-shifted ship dates — the natural
    * key contains date_local, so every copy contributes genuinely NEW
    * silver keys (a plain copy would dedup back to sf0.1 row counts).
    * Only lineitem is materialized (g2's sole input). Non-gating on
    * wall time; the operator-census equality at 6M input rows is the
    * gate. */
  test("g2's plan shape holds at sf1 (derived 10x lineitem): dims " +
      "still broadcast at 6M input rows") {
    // shared, crash-safe derivation (one definition — Bench's g2@sf1
    // diagnostics leg uses the same cache)
    val sf1Dir = graft.Bench.deriveSf1Lineitem(spark, "/root/testdata/sf0.1")
    val (fpBig, tBig) = runAt("/root/testdata/sf0.1")
    val (fpHuge, tHuge) = runAt(sf1Dir.toString)
    info(f"g2@sf0.1: $tBig%.2fs fingerprint=$fpBig")
    info(f"g2@sf1:   $tHuge%.2fs fingerprint=$fpHuge")
    assert(fpHuge === fpBig,
      s"the plan shape must not change with another 10x: " +
        s"sf0.1=$fpBig vs sf1=$fpHuge")
    val (bhj, smj, _, cp, _) = fpHuge
    assert(bhj >= 4 && smj === 0 && cp === 0,
      s"dims must broadcast at sf1 too: bhj=$bhj smj=$smj cp=$cp")
  }
}
