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
}
