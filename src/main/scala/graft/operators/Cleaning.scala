package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Bronze→silver cleaning/conformance operators. Each is a pure
  * `DataFrame => DataFrame` so Catalyst fuses the whole chain into one
  * scan: the standard/validity predicates reach the parquet reader as
  * pushed filters, and only selected columns are read (verified via
  * `.explain` — PushedFilters/ReadSchema).
  */
object Cleaning {

  /** Keep exactly one pollutant standard per pollutant so one measurement
    * is never multiplied across standards; trims before matching because
    * the feed contains padded values
    * (Batch_Bronze_to_Silver notebook-content.py:55-67). Drops the column
    * afterwards — it carries no information once filtered. */
  def cleanStandard(df: DataFrame,
                    standards: Seq[String] = Schemas.keptStandards): DataFrame =
    df.filter(trim(col("pollutant_standard")).isin(standards: _*))
      .drop("pollutant_standard")

  /** Validity gate: instrument-flagged valid rows with non-null metrics
    * (Batch_Bronze_to_Silver notebook-content.py:68-69). */
  def validityFilter(df: DataFrame): DataFrame =
    df.filter(col("validity_indicator") === "Y"
      && col("arithmetic_mean").isNotNull
      && col("aqi").isNotNull)

  /** Type conformance for string-schema feeds (the automated-ingestion
    * variant declares dates as strings and converts on write —
    * automated_ingestion notebook-content.py:84,110,210): idempotent casts,
    * no-ops when the column already has the target type. */
  def typeConform(df: DataFrame): DataFrame = {
    val casts = Map(
      "date_local" -> "date", "date_of_last_change" -> "date",
      "poc" -> "int", "observation_count" -> "int",
      "first_max_hour" -> "int", "aqi" -> "int",
      "latitude" -> "double", "longitude" -> "double",
      "arithmetic_mean" -> "double", "first_max_value" -> "double",
      "observation_percent" -> "double")
    casts.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(t)) else d
    }
  }
}
