package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint for DERIVED small sides — drop lists,
  * component maps, per-round graph state: relations that are small at
  * every tested scale but grow with the dup-graph's PARTICIPANTS, not
  * with a fixed domain (a 512-bucket census or a 256-row offset table
  * is bounded by construction; a near-dup drop list is bounded by
  * nothing but the corpus's duplication rate). An unconditional
  * `broadcast()` of such a side is correct and fast until the corpus
  * where it crosses the driver's broadcast ceiling (8 GB) — a 100 TB
  * web crawl at a typical 40-60% dup rate puts billions of ids in the
  * drop list, and the job then FAILS loudly at the hint.
  *
  * The gate counts the (materialized) side first: under the threshold
  * the hint applies and the big side streams un-shuffled — the plan
  * every tested scale wants; over it the hint is WITHHELD and the join
  * plans as an ordinary keyed shuffle — one exchange on the join key,
  * the scale-safe fallback these plans pay nowhere else.
  *
  * The threshold is rows, not bytes: the gated sides are 1-2 BIGINT
  * columns (≈50 B/row as a hashed relation), so the 16M-row default
  * keeps the built relation under ~1 GB — wide margin to the ceiling,
  * far above anything the hint is needed for. Override per session
  * with `graft.broadcast.gate.rows` (GraphPlanSpec forces both regimes
  * through it). */
object GatedBroadcast {
  val GateConf = "graft.broadcast.gate.rows"
  val DefaultGateRows: Long = 16L * 1024 * 1024

  def gateRows(df: DataFrame): Long =
    df.sparkSession.conf.getOption(GateConf)
      .map(_.toLong).getOrElse(DefaultGateRows)

  /** Hint iff `knownRows` is under the gate — the variant for callers
    * that already know the side's size (one node count reused across
    * iteration rounds). */
  def apply(df: DataFrame, knownRows: Long): DataFrame =
    if (knownRows <= gateRows(df)) broadcast(df) else df

  /** Count-and-gate. Call only with a MATERIALIZED side (persisted or
    * checkpointed — the CC output, a persistTracked round): the count
    * is then a cache/file scan, never a lineage recompute. */
  def apply(df: DataFrame): DataFrame = apply(df, df.count())
}
