package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the air-quality medallion pipeline (SURVEY.md §1.3).
  *
  * Bronze mirrors the 31-column EPA AQS daily payload declared by the
  * reference's ingestion notebooks
  * (Notebooks/Batch_ingestion.Notebook/notebook-content.py:64-106); codes
  * are strings to preserve leading zeros (state "01"). Gold mirrors the
  * warehouse DDL (team2_WH.Warehouse/dbo/Tables, per-table .sql files).
  */
object Schemas {

  /** Composite natural key of one daily measurement
    * (Batch_Bronze_to_Silver notebook-content.py:104). */
  val measurementKey: Seq[String] =
    Seq("state_code", "county_code", "site_number", "parameter_code", "poc", "date_local")

  val aqsDaily: StructType = StructType(Seq(
    StructField("state_code", StringType),
    StructField("county_code", StringType),
    StructField("site_number", StringType),
    StructField("parameter_code", StringType),
    StructField("poc", IntegerType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("datum", StringType),
    StructField("parameter", StringType),
    StructField("sample_duration", StringType),
    StructField("pollutant_standard", StringType),
    StructField("date_local", DateType),
    StructField("units_of_measure", StringType),
    StructField("event_type", StringType),
    StructField("observation_count", IntegerType),
    StructField("observation_percent", DoubleType),
    StructField("validity_indicator", StringType),
    StructField("arithmetic_mean", DoubleType),
    StructField("first_max_value", DoubleType),
    StructField("first_max_hour", IntegerType),
    StructField("aqi", IntegerType),
    StructField("method_code", StringType),
    StructField("method", StringType),
    StructField("local_site_name", StringType),
    StructField("site_address", StringType),
    StructField("city", StringType),
    StructField("county", StringType),
    StructField("state", StringType),
    StructField("cbsa_code", StringType),
    StructField("cbsa", StringType),
    StructField("date_of_last_change", DateType)))

  /** Side input (Population Ingestion notebook-content.py:41-47). */
  val statePopulation: StructType = StructType(Seq(
    StructField("state", StringType),
    StructField("population", IntegerType),
    StructField("state_code", StringType)))

  /** The six EPA pollutant standards the silver layer keeps — one standard
    * per pollutant so a measurement is never multiplied across standards
    * (Batch_Bronze_to_Silver notebook-content.py:55-66). */
  val keptStandards: Seq[String] = Seq(
    "PM25 24-hour 2024", "Ozone 8-hour 2015", "NO2 1-hour 2010",
    "CO 8-hour 1971", "SO2 1-hour 2010", "PM10 24-hour 2006")

  /** parameter_code → particulate vs gas
    * (Batch_Silver_to_Gold notebook-content.py:108-111). */
  val particulateCodes: Seq[String] = Seq("88101", "81102")

  /** The five public EPA AQS parameter codes the pipeline ingests
    * (PM2.5, PM10, CO, O3, SO2) — single definition site consumed by both
    * the Spark f9 query and its emitted DuckDB oracle. */
  val aqsParameterCodes: Seq[String] =
    Seq("88101", "81102", "42101", "44201", "42401")
}
