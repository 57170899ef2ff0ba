package graft.analytics

import org.apache.spark.sql.DataFrame
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

  /** Monthly average AQI + MoM % change (FACT.tmdl:117-164). January of a
    * year compares against December of the prior year (lag over the
    * year,month order) — the DAX variant that returns BLANK at January is
    * the partitioned-by-year window instead. */
  def avgAqiByMonthWithMoM(s: DataFrame): DataFrame = {
    val m = s.groupBy("year", "month").agg(avg("aqi").as("avg_aqi"))
    val w = Window.orderBy("year", "month")
    m.withColumn("prev", lag("avg_aqi", 1).over(w))
      .withColumn("mom_pct",
        round((col("avg_aqi") - col("prev")) / col("prev") * 100, 4))
      .orderBy("year", "month")
  }

  /** Unhealthy Day Count: fact rows with aqi > 100 (FACT.tmdl:5-13). */
  def unhealthyDayCount(s: DataFrame): DataFrame =
    s.agg(count(when(col("aqi") > 100, 1)).as("unhealthy_day_count"))

  /** Per-100k variant (FACT.tmdl:290-299 + HASONEVALUE guard
    * DATE.tmdl:18-24): only meaningful per state, so the state is the
    * grouping grain here. */
  def unhealthyDaysPer100k(s: DataFrame): DataFrame =
    s.groupBy("state_name")
      .agg(count(when(col("aqi") > 100, 1)).as("unhealthy"),
        first("population").as("population"))
      .withColumn("per_100k",
        round(col("unhealthy") / col("population") * 100000, 4))
      .orderBy("state_name")

  /** State Rank: dense rank by unhealthy-day count, ignoring current
    * filters = rank over the full state partition (FACT.tmdl:271-289). */
  def stateRank(s: DataFrame): DataFrame = {
    val counts = s.groupBy("state_name")
      .agg(count(when(col("aqi") > 150, 1)).as("unhealthy_days"))
    counts.withColumn("state_rank",
      dense_rank().over(Window.orderBy(col("unhealthy_days").desc)))
      .orderBy("state_rank", "state_name")
  }

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
