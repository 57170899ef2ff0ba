package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB posture (SURVEY §4 shuffle control):
  * explicit tools for the two cases Catalyst cannot fix declaratively —
  * heavy key skew beyond AQE's split threshold, and repeated co-located
  * joins on the same key.
  */
object ScaleJoins {

  /** Salted equi-join: spreads a skewed left side across `salt` synthetic
    * sub-keys and replicates the right side per sub-key, so one hot key
    * fans out over `salt` reducers instead of melting one. Result is
    * exactly the plain inner equi-join (verified by spec). The salt is
    * deterministic (hash of the whole left row), keeping runs reproducible.
    *
    * Use when AQE's skew-join split (which only balances partition-sized
    * skew) isn't enough — e.g. one key holding >1/parallelism of the
    * table. Cost: right side is replicated `salt`×, so keep it the
    * smaller input. */
  def salted(left: DataFrame, right: DataFrame, key: Seq[String],
             salt: Int): DataFrame = {
    require(salt > 0)
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(salt))
        .cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, key :+ "__salt", "inner").drop("__salt")
  }

  /** Persist a table bucketed+sorted by its join key: subsequent equi-joins
    * between tables bucketed the same way run shuffle-free (both sides
    * arrive pre-partitioned), the reference's "reuse a partitioning across
    * stages" at rest. */
  def saveBucketed(df: DataFrame, name: String, key: Seq[String],
                   buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key.head, key.tail: _*)
      .sortBy(key.head, key.tail: _*)
      .format("parquet").saveAsTable(name)

  /** Join two same-bucketed catalog tables on the bucket key — planner
    * emits a SortMergeJoin with zero Exchange (asserted by spec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Range (band) join: attach to each fact row the interval row whose
    * `[lo, hi)` contains `value`. The interval side is `broadcast()` — a
    * non-equi join has no shuffle key, so the only scale-right physical
    * plan is BroadcastNestedLoop with the small side replicated: the fact
    * table streams through untouched (no shuffle, no sort) and each row
    * scans the handful of broadcast intervals. For interval sides too big
    * to broadcast, discretize: map both sides to aligned grid cells and
    * equi-join on the cell — not needed for dimension-sized band tables.
    *
    * `bands` must be non-overlapping for the result to stay 1:1 with
    * facts; gaps yield NULL band columns (left join). */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: String,
               loCol: String = "lo", hiCol: String = "hi"): DataFrame =
    facts.join(broadcast(bands),
      facts(valueCol) >= bands(loCol) && facts(valueCol) < bands(hiCol),
      "left")

  /** Deterministic Bloom-filter position array for a key column, via
    * Kirsch–Mitzenmacher double hashing: pos_s = (h1 + s·h2) mod m with
    * h1 = H mod m and h2 an ODD stride (odd ⇒ coprime to a power-of-two
    * m ⇒ full-period strides) derived from H² mod p. The SQUARING is
    * load-bearing: every value derived affinely from one polynomial hash
    * (prefix-seeded variants, upper bits) repeats its collisions — two
    * same-length keys agreeing in h1 would agree in an affine stride too,
    * degrading k filters to one — while H² is nonlinear in the key, so
    * colliding keys get independent strides with the full m/2 range.
    * One polynomial hash per key; H < 2^30 so H² fits a Long exactly in
    * both engines. One definition site for build and probe (mirrored in
    * SQL by the j20 oracle). */
  def bloomBitPositions(key: org.apache.spark.sql.Column, m: Int,
                        k: Int): Seq[org.apache.spark.sql.Column] = {
    val h = graft.functions.TextFunctions.polyHash(
      concat(lit("bf|"), key.cast("string")))
    val h1 = pmod(h, lit(m.toLong))
    val h2 = pmod(pmod(h * h, lit(1000000007L)), lit((m / 2).toLong)) * 2 + 1
    (0 until k).map(s => pmod(h1 + lit(s.toLong) * h2, lit(m.toLong)))
  }

  /** Bloom-filter join pruning — the runtime-filter pattern at 100 TB:
    * instead of shuffling the probe side into a join to discover that
    * most rows match nothing, build a KB-sized bit set from the build
    * side's keys and drop probe rows that cannot match BEFORE any
    * shuffle. The filter is deterministic (seeded polynomial hashes), so
    * the exact surviving set — true matches plus the bounded false
    * positives — is reproducible cross-engine, unlike Spark's own
    * `bloom_filter_agg` whose layout is an implementation detail.
    *
    * Plan shape: the build side collapses to ≤ m distinct bit positions
    * (one tiny aggregate), rides to every probe task as a broadcast
    * single-row array, and the probe side filters IN PLACE — zero
    * shuffle, zero join on the big side; `array_contains` over a
    * sorted ≤ m-element array inside whole-stage codegen. False
    * positives are the classic (1 - e^{-kn/m})^k fraction — callers
    * follow with the real join, which now touches only survivors.
    *
    * @param build  relation holding the reference keys
    * @param probe  relation to prune
    * @param keyCol key column name present in both
    * @param m      filter size in bits (keep ≤ a few million: the position
    *               array broadcasts)
    * @param k      hash count
    * @return probe rows whose key passes the filter (all true matches
    *         survive — no false negatives, ever) */
  /** Standard Bloom sizing from a build-side cardinality and a
    * false-positive budget: ideal bits m* = -n·ln p / ln²2 rounded UP to a
    * power of two (the Kirsch–Mitzenmacher stride is odd, so full-period
    * coverage needs m coprime to every odd stride — guaranteed by 2^j),
    * k = round(m/n · ln 2) clamped to [1, 8]. Rounding m up to 2^j only
    * LOWERS the realized FP rate below the budget; the cap keeps the
    * broadcast bitmap ≤ maxBits/8 bytes (2 MB at the 2^24 default) — past
    * the cap the realized rate degrades above budget, which the caller
    * accepts by capping (the filter stays correct: zero false negatives
    * at ANY size). Driver-side sizing math, so ln is fine here (the
    * no-ln rule guards cross-engine row values, not plan constants). */
  def bloomAutoParams(n: Long, fpBudget: Double,
                      maxBits: Int = 1 << 24): (Int, Int) = {
    require(fpBudget > 0 && fpBudget < 1, "fpBudget must be in (0, 1)")
    require(maxBits >= 64 && (maxBits & (maxBits - 1)) == 0,
      "maxBits must be a power of two >= 64")
    val nn = math.max(1L, n)
    val ideal = -nn * math.log(fpBudget) / (math.log(2) * math.log(2))
    var m = 64
    while (m < ideal && m < maxBits) m <<= 1
    val k = math.max(1, math.min(8,
      math.round(m.toDouble / nn * math.log(2)).toInt))
    (m, k)
  }

  /** Realized false-positive rate of an (m, k) filter holding n keys:
    * (1 - e^{-kn/m})^k — the classic approximation, exposed so specs and
    * capacity planners can budget-check a census against theory. */
  def bloomTheoreticalFp(n: Long, m: Int, k: Int): Double =
    math.pow(1 - math.exp(-k.toDouble * n / m), k.toDouble)

  /** [[bloomPrune]] with (m, k) derived from the build side's distinct-
    * key cardinality against an FP budget, instead of a caller's guess.
    * The cardinality comes from `approx_count_distinct` (Spark's HLL++ —
    * the same register-merge mechanism as the t36 sketch): a column-
    * pruned scan whose partial aggregates collapse map-side to KB-sized
    * sketch buffers, so sizing costs ONE cheap pass with NO distinct
    * shuffle — at a 100 TB build side the difference between a metadata-
    * sized pass and a full exchange of the key column (the r7 verdict's
    * refinement #5). The 5% rsd estimate is inflated 10% before sizing:
    * m only ever rounds UP to its power of two, and the inflated n keeps
    * k budget-consistent even when the sketch under-counts, so the
    * realized FP rate stays inside the same 2× envelope the spec pins.
    * Filter correctness never depends on the estimate: zero false
    * negatives at ANY (m, k). */
  def bloomPruneAuto(build: DataFrame, probe: DataFrame, keyCol: String,
                     fpBudget: Double = 0.01,
                     maxBits: Int = 1 << 24): DataFrame = {
    val est = build.filter(col(keyCol).isNotNull)
      .agg(approx_count_distinct(col(keyCol), 0.05)).head().getLong(0)
    val n = math.max(1L, math.ceil(est * 1.1).toLong)
    val (m, k) = bloomAutoParams(n, fpBudget, maxBits)
    bloomPrune(build, probe, keyCol, m, k)
  }

  def bloomPrune(build: DataFrame, probe: DataFrame, keyCol: String,
                 m: Int = 1 << 20, k: Int = 3): DataFrame = {
    require(m > 0 && k > 0 && m % 64 == 0)
    // NULL keys: a join never matches them, so the filter must mirror
    // that — dropped from the build side (a NULL position would NPE the
    // packed-word collect), and probe rows with NULL keys fail the
    // three-way AND naturally (NULL is not true)
    val buildKeys = build.filter(col(keyCol).isNotNull)
    // Dense bit-packed words, not a position list: membership must be an
    // O(1) element_at + bit test per hash — array_contains over a
    // position array is a linear scan and turns the probe filter into
    // O(rows × m) (measured 84 s vs sub-second on the j20 census at
    // sf0.1). The bitmap builds once: distinct positions → per-word
    // bit_or → ONE dense array row of m/64 longs (m=2^20 → 128 KB),
    // broadcast to every probe task.
    // variable-amount shifts via a 64-entry literal power table (the
    // shiftleft/shiftright Column API takes only literal shift amounts)
    val pows = typedlit((0 until 64).map(i => 1L << i))
    def mask(p: org.apache.spark.sql.Column) =
      element_at(pows, pmod(p, lit(64L)).cast("int") + 1)
    // The bitmap is MATERIALIZED driver-side and embedded as one plan
    // literal — exactly how Spark's own InjectRuntimeFilter ships its
    // bloom (a scalar subquery collected at the driver, rebroadcast with
    // the plan). The distributed aggregate reduces the build side to
    // ≤ m/64 (word, bits) rows before the KB-sized collect, and the probe
    // side stays a PURE FILTER: no join of any kind, O(1) element_at +
    // bit test per hash inside the scan's codegen span. (A crossJoin of
    // the array as a single data row is wrong: the join concatenates the
    // 128 KB array onto every probe row — measured 16 s vs sub-second on
    // the j20 census at sf0.1.)
    val wordRows = buildKeys
      .select(explode(array(bloomBitPositions(col(keyCol), m, k): _*)).as("p"))
      .distinct()
      .select(floor(col("p") / 64).cast("int").as("w"), mask(col("p")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits"))
      .collect()
    val packed = new Array[Long](m / 64)
    wordRows.foreach(r => packed(r.getInt(0)) = r.getLong(1))
    val wordsLit = typedlit(packed.toSeq)
    probe.filter(bloomBitPositions(col(keyCol), m, k)
      .map(p => (element_at(wordsLit,
        floor(p / 64).cast("int") + 1).bitwiseAND(mask(p))) =!= 0L)
      .reduce(_ && _))
  }
}
