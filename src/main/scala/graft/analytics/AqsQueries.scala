package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.SilverToGold.Gold

/** The reference's Power BI measure surface (SURVEY §2.12) re-expressed as
  * Spark DataFrame programs over the gold star. Each function is the
  * engine-side equivalent of a DAX measure (cites to
  * the .tmdl files under AQI.SemanticModel/definition/tables); slicer
  * semantics arrive as
  * optional filter parameters.
  *
  * The DAX `REMOVEFILTERS`/`ALL` pattern (an aggregate at a coarser grain
  * than the display grain) maps to a window over a wider partition — see
  * [[pctOfUsExposure]] and [[stateRank]].
  */
object AqsQueries {

  /** Pre-joined star view: fact ⋈ broadcast dims (relationships.tmdl:1-16).
    * Dims stay broadcast at any fact scale. */
  def star(g: Gold): DataFrame =
    g.fact
      .join(broadcast(g.dimDate), Seq("date_key"), "left")
      .join(broadcast(g.dimLocation), Seq("location_key"), "left")
      .join(broadcast(g.dimParameter), Seq("parameter_key"), "left")
      .join(broadcast(g.dimMethod), Seq("method_key"), "left")

  /** AVG_AQI by year × parameter (FACT.tmdl:73-76 + clusteredColumnChart). */
  def avgAqiByYearParameter(s: DataFrame): DataFrame =
    s.groupBy("year", "parameter_name")
      .agg(avg("aqi").as("avg_aqi"))
      .orderBy("year", "parameter_name")

  /** Monthly average AQI + MoM % change (FACT.tmdl:117-164).
    *
    * Two reference variants exist:
    *  - `AQI MoM Perc` (DATEADD -1 MONTH): January compares against
    *    December of the prior year — the default, a lag over the global
    *    (year, month) order.
    *  - `MoM AQI Change` (CurrentYear/CurrentMonth VAR form): the prior
    *    month is looked up *within the same year*, so January has no
    *    predecessor and the measure is BLANK — `januaryBlank = true`,
    *    a window partitioned by year. */
  def avgAqiByMonthWithMoM(s: DataFrame,
                           januaryBlank: Boolean = false): DataFrame = {
    val m = s.groupBy("year", "month").agg(avg("aqi").as("avg_aqi"))
    val w =
      if (januaryBlank) Window.partitionBy("year").orderBy("month")
      else Window.orderBy("year", "month")
    m.withColumn("prev", lag("avg_aqi", 1).over(w))
      .withColumn("mom_pct",
        round((col("avg_aqi") - col("prev")) / col("prev") * 100, 4))
      .orderBy("year", "month")
  }

  /** SAMEPERIODLASTYEAR at month grain (FACT.tmdl:82-97: `AVG AQI PY` =
    * CALCULATE([AVG_AQI], SAMEPERIODLASTYEAR(dim_date[date])) and
    * `AVG YoY Perc` = DIVIDE(cur - py, py)). The DAX date-shift becomes a
    * left self-join of the monthly aggregate on `add_months(month, -12)`:
    * months with no prior-year twin (the first year of data, or calendar
    * gaps) get NULL = DAX BLANK — the edge case SURVEY §7 risk 3 calls out. */
  def avgAqiSamePeriodLastYear(s: DataFrame): DataFrame = {
    val m = s.groupBy(trunc(col("date"), "mm").as("month_start"))
      .agg(avg("aqi").as("avg_aqi"))
    val py = m.select(col("month_start").as("py_month"),
      col("avg_aqi").as("avg_aqi_py"))
    m.join(py, add_months(col("month_start"), -12) === col("py_month"), "left")
      .withColumn("yoy_pct",
        round((col("avg_aqi") - col("avg_aqi_py")) / col("avg_aqi_py") * 100, 4))
      .select("month_start", "avg_aqi", "avg_aqi_py", "yoy_pct")
      .orderBy("month_start")
  }

  /** Unhealthy Day Count: fact rows with aqi > 100 (FACT.tmdl:5-13). */
  def unhealthyDayCount(s: DataFrame): DataFrame =
    s.agg(count(when(col("aqi") > 100, 1)).as("unhealthy_day_count"))

  /** Per-100k with the HASONEVALUE blank guard (FACT.tmdl:290-299:
    * `IF(NOT HASONEVALUE(dim_location[state_name]), BLANK(), ...)`).
    *
    * The DAX guard blanks the measure in any filter context spanning more
    * than one state (e.g. the grand-total row). Engine-side, the filter
    * context is the grouping: group by `groupCols` and blank (NULL) any
    * group whose rows span multiple states — grouping by state_name itself
    * always passes the guard; a coarser grain (region, or the global
    * total via groupCols = Nil) blanks exactly like the total row does. */
  def unhealthyDaysPer100k(s: DataFrame,
                           groupCols: Seq[String] = Seq("state_name")): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) s.groupBy()
      else s.groupBy(groupCols.map(col): _*)
    val base = grouped
      .agg(count(when(col("aqi") > 100, 1)).as("unhealthy"),
        first("population").as("population"),
        countDistinct("state_name").as("n_states"))
      .withColumn("per_100k",
        when(col("n_states") === 1,
          round(col("unhealthy") / col("population") * 100000, 4)))
      .drop("n_states")
    if (groupCols.isEmpty) base else base.orderBy(groupCols.map(col): _*)
  }

  /** State Rank (FACT.tmdl:271-289): RANKX over ALL states by
    * [Unhealthy Day Count] (aqi > 100), ASC, DENSE — lowest unhealthy-day
    * count ranks 1. (The >150/DESC predicate belongs to [[worstState]].) */
  def stateRank(s: DataFrame): DataFrame = {
    val counts = s.groupBy("state_name")
      .agg(count(when(col("aqi") > 100, 1)).as("unhealthy_days"))
    counts.withColumn("state_rank",
      dense_rank().over(Window.orderBy(col("unhealthy_days").asc)))
      .orderBy("state_rank", "state_name")
  }

  /** Rank Color (FACT.tmdl:336-343): the report's conditional-format SWITCH
    * over [State Rank] — ≤10 green, ≤40 yellow, else red. */
  def rankColor(s: DataFrame): DataFrame =
    stateRank(s).withColumn("rank_color",
      when(col("state_rank") <= 10, "#2E7D32")
        .when(col("state_rank") <= 40, "#F9A825")
        .otherwise("#C62828"))

  /** Worst state: TOPN(1) by count(aqi>150), state-name tiebreak
    * (FACT.tmdl:34-40). */
  def worstState(s: DataFrame): DataFrame =
    s.groupBy("state_name")
      .agg(count(when(col("aqi") > 150, 1)).as("unhealthy_days"))
      .orderBy(col("unhealthy_days").desc, col("state_name").asc)
      .limit(1)

  /** Leading pollutant: TOPN(1) parameter by avg AQI (FACT.tmdl:56-67). */
  def leadingPollutant(s: DataFrame): DataFrame =
    s.groupBy("parameter_name").agg(avg("aqi").as("avg_aqi"))
      .orderBy(col("avg_aqi").desc, col("parameter_name").asc)
      .limit(1)

  /** Pollutant Display Name (dim_parameter.tmdl:5-16): the DAX SWITCH on
    * SELECTEDVALUE remaps raw EPA parameter names to display labels,
    * falling through to the raw name — a when-chain with the column itself
    * as the otherwise branch. */
  def pollutantDisplayName(parameterName: Column): Column =
    when(parameterName === "carbon monoxide", "Carbon Monoxide")
      .when(parameterName === "Nitrogen dioxide (N02)", "Nitrogen Dioxide")
      .when(parameterName === "Ozone", "Ozone")
      .when(parameterName === "PM10 Total 0-10um STP", "PM 10")
      .when(parameterName === "PM2.5 - Local Conditions", "PM 2.5")
      .when(parameterName === "Sulfur dioxide", "Sulfur Dioxide")
      .otherwise(parameterName)

  /** Avg AQI per pollutant under the display-name remap (the SWITCH measure
    * feeding report visuals). */
  def avgAqiByDisplayPollutant(s: DataFrame): DataFrame =
    s.groupBy(pollutantDisplayName(col("parameter_name")).as("pollutant"))
      .agg(avg("aqi").as("avg_aqi"))
      .orderBy("pollutant")

  /** Bad AQI days YTD: running count of distinct bad days within the year
    * (DATESYTD, FACT.tmdl:252-265). */
  def badAqiDaysYtd(s: DataFrame): DataFrame = {
    val badCats = Seq("Unhealthy", "Very Unhealthy", "Hazardous")
    val daily = s.filter(col("aqi_category").isin(badCats: _*))
      .select("year", "date").distinct()
      .groupBy("year", "date").agg(lit(1).as("bad"))
    val w = Window.partitionBy("year").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("bad_days_ytd", sum("bad").over(w))
      .select("year", "date", "bad_days_ytd")
      .orderBy("year", "date")
  }

  /** Exposure Score per state = unhealthy days × population; % of US
    * exposure = state ÷ Σ over ALL states (PARAM.tmdl:21-42 — the
    * REMOVEFILTERS ratio-of-totals). */
  def pctOfUsExposure(s: DataFrame): DataFrame = {
    val st = s.groupBy("state_name")
      .agg(count(when(col("aqi") > 100, 1)).as("unhealthy"),
        first("population").as("population"))
      .withColumn("exposure", col("unhealthy") * col("population"))
    st.withColumn("pct_of_us",
      round(col("exposure") / sum("exposure").over(Window.partitionBy()) * 100, 4))
      .orderBy("state_name")
  }

  /** YoY AQI change % (FACT.tmdl:166-193). */
  def yoyAqiChange(s: DataFrame): DataFrame = {
    val y = s.groupBy("year").agg(avg("aqi").as("avg_aqi"))
    val w = Window.orderBy("year")
    y.withColumn("avg_aqi_py", lag("avg_aqi", 1).over(w))
      .withColumn("yoy_pct",
        round((col("avg_aqi") - col("avg_aqi_py")) / col("avg_aqi_py") * 100, 4))
      .orderBy("year")
  }

  /** AQI category share by state (azureMap series, SURVEY §2.12 #10). */
  def aqiCategoryShareByState(s: DataFrame): DataFrame = {
    val c = s.groupBy("state_name", "aqi_category").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("state_name")
    c.withColumn("share", round(col("n") / sum("n").over(w), 4))
      .orderBy("state_name", "aqi_category")
  }
}
