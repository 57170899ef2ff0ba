package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine deterministic numeric helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Plain `SUM(double)` is accumulation-order dependent, so two
  * engines (or two shuffle layouts) can differ in the last ulp and break a
  * hash compare. The fix: sum in exact decimal arithmetic (inputs here are
  * money-like values with ≤4 meaningful decimal digits), then cast the exact
  * total back to double. Both engines round-trip the identical decimal to
  * the identical double. Division of two identical doubles is IEEE-exact, so
  * derived averages/ratios stay deterministic too.
  */
object Exact {
  /** Exact sum of a fixed-point-valued double column → double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average = exact sum / count (both operands identical across
    * engines, so the IEEE division result is too). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** Oracle-side twin of [[dsum]] as a SQL fragment. */
  def sqlSum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side twin of [[davg]]. */
  def sqlAvg(expr: String, scale: Int = 2): String =
    s"${sqlSum(expr, scale)} / COUNT(*)"
}
