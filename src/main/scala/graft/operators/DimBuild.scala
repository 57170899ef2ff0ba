package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Schemas

/** Dimension-building operators for the gold star schema (SURVEY §2.3,
  * §2.7 W1-W2): calendar attributes, the EPA AQI category ladder, census
  * region mapping, parameter categorization, and surrogate keys.
  */
object DimBuild {

  /** EPA AQI category breakpoints (public EPA scale; reference CASE chain
    * at Batch_Silver_to_Gold notebook-content.py:219-228, incl. an explicit
    * NULL branch). */
  def aqiCategory(aqi: Column): Column =
    when(aqi.isNull, lit(null).cast("string"))
      .when(aqi <= 50, "Good")
      .when(aqi <= 100, "Moderate")
      .when(aqi <= 150, "Unhealthy for Sensitive Groups")
      .when(aqi <= 200, "Unhealthy")
      .when(aqi <= 300, "Very Unhealthy")
      .otherwise("Hazardous")

  /** exceeds_standard flag (Automated_Silver_to_Gold
    * notebook-content.py:218-220). */
  def exceedsStandard(aqi: Column): Column = aqi > 100

  /** US census region from state FIPS code (hard-coded IN-lists, as in
    * Batch_Silver_to_Gold notebook-content.py:121-140). */
  val northeast = Seq("09", "23", "25", "33", "44", "50", "34", "36", "42")
  val midwest = Seq("17", "18", "26", "39", "55", "19", "20", "27", "29", "31", "38", "46")
  val south = Seq("10", "11", "12", "13", "24", "37", "45", "51", "54",
    "01", "21", "28", "47", "05", "22", "40", "48")
  val west = Seq("04", "08", "16", "30", "32", "35", "49", "56", "02", "06", "15", "41", "53")

  def region(stateCode: Column): Column =
    when(stateCode.isin(northeast: _*), "Northeast")
      .when(stateCode.isin(midwest: _*), "Midwest")
      .when(stateCode.isin(south: _*), "South")
      .when(stateCode.isin(west: _*), "West")
      .otherwise("Unknown")

  /** Particulate vs gas (Batch_Silver_to_Gold notebook-content.py:108-111). */
  def parameterCategory(parameterCode: Column): Column =
    when(parameterCode.isin(Schemas.particulateCodes: _*), "Particulate Matter")
      .otherwise("Gas")

  /** Calendar attributes for dim_date from a date column. `isoWeekend`
    * selects the canonical Sat/Sun definition; the reference has two
    * inconsistent variants (dayofweek IN (6,7) at Batch_Silver_to_Gold:83
    * vs IN (1,7) at Automated_Silver_to_Gold:135 — Spark dayofweek is
    * 1=Sunday); we expose both, defaulting to the true-weekend (1,7). */
  def dateAttributes(df: DataFrame, dateCol: String = "date",
                     trueWeekend: Boolean = true): DataFrame = {
    val d = col(dateCol)
    val dow = dayofweek(d)
    val weekend = if (trueWeekend) dow.isin(1, 7) else dow.isin(6, 7)
    df.withColumn("year", year(d))
      .withColumn("month", month(d))
      .withColumn("month_name", date_format(d, "MMMM"))
      .withColumn("day", dayofmonth(d))
      .withColumn("day_of_week", dow)
      .withColumn("day_name", date_format(d, "EEEE"))
      .withColumn("quarter", quarter(d))
      .withColumn("is_weekend", weekend)
  }

  /** Surrogate key assignment over the *distinct natural key* rows of a
    * dimension, two modes behind one interface (SURVEY §4, the one real
    * scale hazard in the reference):
    *
    *  - `SequentialKeys` — parity with the reference's global
    *    `row_number().over(Window.orderBy(...))` (Batch_Silver_to_Gold
    *    notebook-content.py:86-87,112-118,182-183): dense 1..N keys,
    *    insertion-order-free, but a single-partition sort. Correct choice
    *    for dimensions, whose distinct-key cardinality stays small even at
    *    100 TB fact scale.
    *  - `HashKeys` — scale mode for high-cardinality keys: xxhash64 of the
    *    natural key, fully parallel, stable under reprocessing (the same
    *    natural key always re-derives the same surrogate), at the price of
    *    non-dense keys and a (negligible at <2³² rows) collision risk.
    */
  sealed trait KeyMode
  case object SequentialKeys extends KeyMode
  case object HashKeys extends KeyMode

  def surrogateKey(dim: DataFrame, naturalKey: Seq[String], keyName: String,
                   mode: KeyMode = SequentialKeys, offset: Long = 0L): DataFrame =
    mode match {
      case SequentialKeys =>
        val w = Window.orderBy(naturalKey.map(col): _*)
        dim.withColumn(keyName, (row_number().over(w) + lit(offset)).cast("long"))
      case HashKeys =>
        dim.withColumn(keyName, xxhash64(naturalKey.map(col): _*))
    }

  /** Continue an existing key sequence for newly staged dim rows
    * (max-key + offset re-keying, Automated_Silver_to_Gold
    * notebook-content.py:277-287). */
  def continueKeys(existing: DataFrame, fresh: DataFrame,
                   naturalKey: Seq[String], keyName: String): DataFrame = {
    val maxKey = existing.agg(coalesce(max(col(keyName)), lit(0L))).head().getLong(0)
    surrogateKey(fresh, naturalKey, keyName, SequentialKeys, maxKey)
  }
}
