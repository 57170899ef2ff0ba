package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Key-based deduplication (SURVEY §2.4).
  *
  * `arbitrary` preserves the reference's `dropDuplicates(subset)` semantics
  * (Automated_Bronze_to_Silver notebook-content.py:98): first-row-wins per
  * key under whatever physical order the shuffle produces — fast (one
  * hash-partial + one final agg, single shuffle on the key) but
  * non-deterministic across runs.
  *
  * `deterministic` is the testable variant: min-by-tiebreak per key via
  * row_number over (key, tiebreak) — same single shuffle, plus a per-key
  * sort that AQE keeps partition-local. Use it wherever downstream results
  * must be reproducible (all our oracle queries do).
  */
object Dedup {

  def arbitrary(df: DataFrame, key: Seq[String]): DataFrame =
    df.dropDuplicates(key)

  def deterministic(df: DataFrame, key: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(tiebreak.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[deterministic]] for LOW-CARDINALITY outputs (entity/dim extracts:
    * a feed-sized input collapsing to an entity-sized result). The
    * window alone would shuffle AND sort the whole feed just to keep
    * one row per key; a `distinct()` first collapses exact-duplicate
    * rows with map-side partial aggregation — the exchange then carries
    * ≤ (distinct rows × partitions) instead of the feed, and the
    * per-key sort runs over the entity-sized remainder (r20, opt guide
    * §2.3 "aggregate before you shuffle"). Identical output: dropping
    * exact-duplicate rows never changes the per-key min-by-tiebreak
    * winner's CONTENT (among tiebreak-tied rows the window's pick is
    * arbitrary either way — callers already require ties to agree on
    * every surviving column, see the bronze synthesis contract). */
  def deterministicSmall(df: DataFrame, key: Seq[String], tiebreak: Seq[String]): DataFrame =
    deterministic(df.distinct(), key, tiebreak)
}
