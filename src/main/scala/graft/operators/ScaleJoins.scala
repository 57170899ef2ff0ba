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
}
