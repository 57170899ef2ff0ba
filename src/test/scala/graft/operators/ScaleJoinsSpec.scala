package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join under heavy skew") {
    // 10k rows of one hot key + a long tail
    val left = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "lv")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv")
    val salted = ScaleJoins.salted(left, right, Seq("k"), salt = 8)
      .select(plain.columns.map(col): _*).orderBy("k", "lv")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("same-bucketed tables join without a shuffle") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "bv")
    ScaleJoins.saveBucketed(a, "bk_a", Seq("id"), buckets = 8)
    ScaleJoins.saveBucketed(b, "bk_b", Seq("id"), buckets = 8)
    // disable auto-broadcast: at test size the planner would broadcast and
    // never exercise the bucket layout (at scale neither side broadcasts)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleJoins.bucketedJoin(spark, "bk_a", "bk_b", Seq("id"))
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bloom prune keeps every true match, bounds extras, never shuffles the probe") {
    val build = (1 to 200 by 2).map(i => i.toLong).toDF("k") // odd keys
    val probe = (1 to 2000).map(i => (i % 400).toLong).toDF("k")
    val pruned = ScaleJoins.bloomPrune(build, probe, "k", m = 4096, k = 3)
    val truth = probe.join(build.distinct(), Seq("k"), "left_semi")
    // no false negatives, ever: the pruned set is a superset of the semi
    // join, and restricted to true members it is exactly the semi join
    assert(pruned.join(build.distinct(), Seq("k"), "left_semi").count()
      === truth.count())
    assert(pruned.count() >= truth.count())
    // probe-side plan shape: a filter, not a join — the big side must not
    // shuffle or sort-merge against anything
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"bloom prune must not join the probe side:\n$plan")
    // NULL keys mirror join semantics: dropped on both sides, no crash
    val buildN = Seq(Some(1L), None, Some(3L)).toDF("k")
    val probeN = Seq(Some(1L), None, Some(2L)).toDF("k")
    val got = ScaleJoins.bloomPrune(buildN, probeN, "k", m = 4096, k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(1L) && !got.contains(0L))
    assert(ScaleJoins.bloomPrune(buildN, probeN, "k", m = 4096, k = 3)
      .filter(col("k").isNull).count() === 0)
  }

  test("auto-sized bloom meets its FP budget within 2x of theory") {
    // sizing math: power-of-two m, budget-consistent k
    val (m1, k1) = ScaleJoins.bloomAutoParams(1000, 0.01)
    assert((m1 & (m1 - 1)) === 0 && m1 >= 64)
    assert(ScaleJoins.bloomTheoreticalFp(1000, m1, k1) <= 0.01)
    // the cap binds for huge n — degraded rate, never an over-sized bitmap
    val (m2, _) = ScaleJoins.bloomAutoParams(100000000L, 0.01, maxBits = 1 << 20)
    assert(m2 === (1 << 20))
    // n = 0 still yields a legal filter
    val (m0, k0) = ScaleJoins.bloomAutoParams(0, 0.01)
    assert(m0 >= 64 && k0 >= 1)

    // exact FP census: 2k member keys, 50k-key probe domain. The measured
    // false-positive rate over ~50k distinct non-members must sit within
    // 2x of (1 - e^{-kn/m})^k — at these sizes that is ~25 expected FPs
    // with a 2x margin ≈ 5 sigma: a real distribution check on the
    // double-hashing scheme, not a smoke test.
    val n = 2000
    val build = (0 until n).map(i => (i * 7919L) % 1000003L).toDF("k")
    val members = build.collect().map(_.getLong(0)).toSet
    val probeKeys = (0 until 50000).map(_.toLong * 13L % 1000003L).distinct
    val probe = probeKeys.toDF("k")
    val fpBudget = 0.01
    val pruned = ScaleJoins.bloomPruneAuto(build, probe, "k", fpBudget)
      .collect().map(_.getLong(0))
    // zero false negatives: every member in the probe domain survives
    val trueMatches = probeKeys.filter(members.contains)
    assert(pruned.count(members.contains) === trueMatches.length)
    val nonMembers = probeKeys.count(!members.contains(_))
    val falsePos = pruned.count(!members.contains(_))
    val (m, k) = ScaleJoins.bloomAutoParams(n.toLong, fpBudget)
    val theory = ScaleJoins.bloomTheoreticalFp(n.toLong, m, k)
    assert(theory <= fpBudget)
    val measured = falsePos.toDouble / nonMembers
    assert(measured <= 2 * theory,
      s"measured FP rate $measured vs theoretical $theory (m=$m k=$k, " +
        s"$falsePos/$nonMembers)")
  }

  test("band join classifies by interval, leaves gaps null, streams broadcast") {
    val bands = Seq(("low", 0.0, 10.0), ("high", 20.0, 30.0)).toDF("band", "lo", "hi")
    val facts = Seq(0.0, 5.0, 9.999, 10.0, 15.0, 20.0, 29.9, 42.0).toDF("v")
    val got = ScaleJoins.bandJoin(facts, bands, "v")
      .select(col("v"), col("band")).collect()
      .map(r => r.getDouble(0) -> Option(r.getString(1))).toMap
    // [lo, hi): lower bound inclusive, upper exclusive; gap values keep NULL
    assert(got === Map(0.0 -> Some("low"), 5.0 -> Some("low"),
      9.999 -> Some("low"), 10.0 -> None, 15.0 -> None,
      20.0 -> Some("high"), 29.9 -> Some("high"), 42.0 -> None))
    // physical shape: the interval side is broadcast - no Exchange on facts
    val plan = ScaleJoins.bandJoin(facts, bands, "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast NLJ for the non-equi band join, got:\n$plan")
  }
}
