package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.operators.{Cleaning, Dedup}

/** Bronze → silver normalization (reference:
  * Notebooks/Batch_Bronze_to_Silver.Notebook/notebook-content.py and the
  * Automated_* twin): clean + conform + dedup the measurement grain, then
  * extract one normalized table per entity.
  *
  * Shuffle budget: exactly one wide shuffle for the measurement table (the
  * dedup on the 6-col natural key); each dim extract shuffles only its own
  * tiny distinct-key set after Catalyst prunes columns at the scan. At
  * 100 TB the measurement dedup is the dominant exchange and is
  * key-partitioned — the same partitioning the fact build reuses.
  */
object BronzeToSilver {

  final case class Silver(
      measurement: DataFrame, site: DataFrame, adminArea: DataFrame,
      parameter: DataFrame, method: DataFrame, cbsa: DataFrame)

  /** Columns the silver measurement keeps (reference's select list). */
  private val measurementCols = Seq(
    "state_code", "county_code", "site_number", "parameter_code",
    "poc", "date_local", "arithmetic_mean", "first_max_value",
    "first_max_hour", "aqi", "observation_count", "observation_percent",
    "method_code", "event_type", "sample_duration")

  def measurement(bronze: DataFrame): DataFrame = {
    val cleaned = Cleaning.validityFilter(
      Cleaning.typeConform(Cleaning.cleanStandard(bronze)))
    // project to kept + tiebreak columns BEFORE the dedup: the window's
    // exchange otherwise drags every bronze column (site names,
    // addresses, unit strings — over half the feed's bytes) through the
    // shuffle and sort just to drop them on the far side. Same rows,
    // same columns out; at 100 TB this halves the dominant exchange.
    val narrowed = cleaned.select(
      (measurementCols :+ "date_of_last_change").map(col): _*)
    Dedup.deterministic(narrowed, Schemas.measurementKey,
      tiebreak = Seq("date_of_last_change", "observation_count"))
      .select(measurementCols.head, measurementCols.tail: _*)
  }

  def site(bronze: DataFrame): DataFrame =
    Dedup.deterministicSmall(
      bronze.select("state_code", "county_code", "site_number",
        "local_site_name", "site_address", "city", "latitude", "longitude",
        "cbsa_code", "datum"),
      key = Seq("state_code", "county_code", "site_number"),
      tiebreak = Seq("local_site_name"))

  def adminArea(bronze: DataFrame): DataFrame =
    Dedup.deterministicSmall(
      bronze.select(col("state_code"), col("state").as("state_name"),
        col("county_code"), col("county").as("county_name")),
      key = Seq("state_code", "county_code"),
      tiebreak = Seq("state_name", "county_name"))

  def parameter(bronze: DataFrame): DataFrame =
    Dedup.deterministicSmall(
      bronze.filter(col("parameter_code").isNotNull)
        .select(col("parameter_code"), col("parameter").as("parameter_name"),
          col("units_of_measure").as("unit_of_measurement")),
      key = Seq("parameter_code"), tiebreak = Seq("parameter_name"))

  def method(bronze: DataFrame): DataFrame =
    Dedup.deterministicSmall(
      bronze.filter(col("method_code").isNotNull)
        .select(col("method_code"), col("method").as("method_name")),
      key = Seq("method_code"), tiebreak = Seq("method_name"))

  def cbsa(bronze: DataFrame): DataFrame =
    Dedup.deterministicSmall(
      bronze.filter(col("cbsa_code").isNotNull)
        .select(col("cbsa_code"), col("cbsa").as("cbsa_name")),
      key = Seq("cbsa_code"), tiebreak = Seq("cbsa_name"))

  def apply(bronze: DataFrame): Silver =
    Silver(measurement(bronze), site(bronze), adminArea(bronze),
      parameter(bronze), method(bronze), cbsa(bronze))
}
