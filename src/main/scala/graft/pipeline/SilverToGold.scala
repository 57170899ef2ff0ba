package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DimBuild
import graft.operators.DimBuild.{KeyMode, SequentialKeys}

/** Silver → gold Kimball star build (reference:
  * Notebooks/Batch_Silver_to_Gold.Notebook/notebook-content.py:74-260):
  * four dimensions with surrogate keys and the fact assembled through
  * left joins on natural keys.
  *
  * Scale posture: all four dims are tiny relative to the fact (dates,
  * parameters, methods, sites) → every fact-side join is explicitly
  * `broadcast`, so the fact is assembled in a single scan with zero
  * fact-side shuffles; the star join is a chain of BroadcastHashJoins
  * inside one whole-stage-codegen span.
  */
object SilverToGold {

  final case class Gold(
      dimDate: DataFrame, dimLocation: DataFrame, dimParameter: DataFrame,
      dimMethod: DataFrame, fact: DataFrame)

  def dimDate(measurement: DataFrame, keyMode: KeyMode = SequentialKeys): DataFrame = {
    val dates = measurement.select(col("date_local").as("date")).distinct()
    DimBuild.surrogateKey(
      DimBuild.dateAttributes(dates), Seq("date"), "date_key", keyMode)
  }

  def dimParameter(parameter: DataFrame, keyMode: KeyMode = SequentialKeys): DataFrame =
    DimBuild.surrogateKey(
      parameter.withColumn("category",
        DimBuild.parameterCategory(col("parameter_code"))),
      Seq("parameter_code"), "parameter_key", keyMode)

  def dimMethod(method: DataFrame, keyMode: KeyMode = SequentialKeys): DataFrame =
    DimBuild.surrogateKey(method, Seq("method_code"), "method_key", keyMode)

  /** site ⋈ admin_area (2-col key) ⋈ cbsa ⋈ population, plus the census
    * region mapping (Batch_Silver_to_Gold notebook-content.py:155-183).
    * Population arrives with the echoed header row already filtered by
    * the ingestion stage. */
  def dimLocation(site: DataFrame, adminArea: DataFrame, cbsa: DataFrame,
                  population: DataFrame,
                  keyMode: KeyMode = SequentialKeys): DataFrame = {
    val joined = site
      .join(broadcast(adminArea), Seq("state_code", "county_code"), "left")
      .join(broadcast(cbsa), Seq("cbsa_code"), "left")
      .join(broadcast(population.select("state_code", "population")),
        Seq("state_code"), "left")
      .withColumn("region", DimBuild.region(col("state_code")))
    DimBuild.surrogateKey(joined,
      Seq("state_code", "county_code", "site_number"), "location_key", keyMode)
      .select("location_key", "state_code", "county_code", "site_number",
        "state_name", "county_name", "city", "cbsa_name", "latitude",
        "longitude", "population", "region")
  }

  /** Fact assembly: left joins (dims may be missing → null keys preserved,
    * as in the reference) + AQI category/exceeds flags
    * (Batch_Silver_to_Gold notebook-content.py:202-246). */
  def fact(measurement: DataFrame, dimDate: DataFrame, dimLocation: DataFrame,
           dimParameter: DataFrame, dimMethod: DataFrame): DataFrame =
    measurement
      .join(broadcast(dimDate.select(col("date"), col("date_key"))),
        measurement("date_local") === col("date"), "left")
      .join(broadcast(dimLocation.select("state_code", "county_code",
        "site_number", "location_key")),
        Seq("state_code", "county_code", "site_number"), "left")
      .join(broadcast(dimParameter.select("parameter_code", "parameter_key")),
        Seq("parameter_code"), "left")
      .join(broadcast(dimMethod.select("method_code", "method_key")),
        Seq("method_code"), "left")
      .select(
        col("date_key"), col("location_key"), col("parameter_key"),
        col("poc"), col("method_key"),
        col("arithmetic_mean"), col("first_max_value"), col("first_max_hour"),
        col("aqi"), col("observation_count"), col("observation_percent"),
        DimBuild.aqiCategory(col("aqi")).as("aqi_category"),
        DimBuild.exceedsStandard(col("aqi")).as("exceeds_standard"))

  def apply(silver: BronzeToSilver.Silver, population: DataFrame,
            keyMode: KeyMode = SequentialKeys): Gold = {
    val dd = dimDate(silver.measurement, keyMode)
    val dp = dimParameter(silver.parameter, keyMode)
    val dm = dimMethod(silver.method, keyMode)
    val dl = dimLocation(silver.site, silver.adminArea, silver.cbsa,
      population, keyMode)
    Gold(dd, dl, dp, dm, fact(silver.measurement, dd, dl, dp, dm))
  }
}
