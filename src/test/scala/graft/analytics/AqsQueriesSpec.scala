package graft.analytics

import graft.SparkSpec
import graft.model.Fixtures
import graft.pipeline.{Ingest, Pipeline}
import org.apache.spark.sql.functions._

class AqsQueriesSpec extends SparkSpec {

  lazy val gold = Pipeline.batch(
    Fixtures.bronze(spark, days = 30),
    Ingest.cleanPopulation(Fixtures.statePopulation(spark)))
  lazy val s = AqsQueries.star(gold).cache()

  test("star view resolves every dim attribute") {
    assert(s.filter(col("state_name").isNull).count() === 0)
    assert(s.filter(col("parameter_name").isNull).count() === 0)
    assert(s.filter(col("date").isNull).count() === 0)
  }

  test("avg AQI by year×parameter covers all fixture parameters") {
    val got = AqsQueries.avgAqiByYearParameter(s)
    assert(got.select("parameter_name").distinct().count() === 3)
    assert(got.filter(col("avg_aqi").isNull).count() === 0)
  }

  test("MoM change is null only on the first month") {
    val got = AqsQueries.avgAqiByMonthWithMoM(s).collect()
    assert(got.head.isNullAt(got.head.fieldIndex("mom_pct")))
    assert(got.tail.forall(r => !r.isNullAt(r.fieldIndex("mom_pct"))))
  }

  test("unhealthy counts agree between measures") {
    val total = AqsQueries.unhealthyDayCount(s).head().getLong(0)
    val perState = AqsQueries.unhealthyDaysPer100k(s)
      .agg(sum("unhealthy")).head().getLong(0)
    assert(total === perState)
    assert(total === s.filter(col("aqi") > 100).count())
  }

  test("state rank is dense starting at 1") {
    val ranks = AqsQueries.stateRank(s).select("state_rank")
      .distinct().collect().map(_.getInt(0)).sorted
    assert(ranks.head === 1)
    assert(ranks.toSeq === (1 to ranks.length))
  }

  test("state rank follows the DAX measure: ASC dense by count(aqi>100)") {
    // FACT.tmdl:271-289 — RANKX(ALL(states), [Unhealthy Day Count],, ASC,
    // DENSE), where Unhealthy Day Count is aqi > 100.
    val counts = s.groupBy("state_name")
      .agg(count(when(col("aqi") > 100, 1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ordered = counts.values.toSeq.distinct.sorted
    AqsQueries.stateRank(s).collect().foreach { r =>
      val expected = ordered.indexOf(counts(r.getAs[String]("state_name"))) + 1
      assert(r.getAs[Int]("state_rank") === expected,
        s"state ${r.getAs[String]("state_name")}")
    }
  }

  test("rank color buckets follow the SWITCH thresholds") {
    AqsQueries.rankColor(s).collect().foreach { r =>
      val rank = r.getAs[Int]("state_rank")
      val expected =
        if (rank <= 10) "#2E7D32" else if (rank <= 40) "#F9A825" else "#C62828"
      assert(r.getAs[String]("rank_color") === expected)
    }
  }

  test("worst state has the most aqi>150 days") {
    val worst = AqsQueries.worstState(s).head()
    val maxDays = s.groupBy("state_name")
      .agg(count(when(col("aqi") > 150, 1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(worst.getAs[Long]("unhealthy_days") === maxDays)
  }

  test("pct of US exposure sums to 100") {
    val sumPct = AqsQueries.pctOfUsExposure(s)
      .agg(sum("pct_of_us")).head().getDouble(0)
    assert(math.abs(sumPct - 100.0) < 0.01)
  }

  test("YTD bad days is monotone within a year") {
    val got = AqsQueries.badAqiDaysYtd(s).collect()
    val byYear = got.groupBy(_.getAs[Int]("year"))
    byYear.foreach { case (_, rows) =>
      val seq = rows.map(_.getAs[Long]("bad_days_ytd")).toSeq
      assert(seq === seq.sorted)
    }
  }

  test("one-pass AqiHistogram aggregator matches groupBy counts") {
    val hist = s.agg(graft.operators.AqiHistogram.column(col("aqi")).as("h"))
      .head().getMap[String, Long](0)
    val byCat = s.groupBy("aqi_category").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("Unknown") -> r.getLong(1)).toMap
    graft.operators.AqiHistogram.names.foreach { n =>
      assert(hist.getOrElse(n, 0L) === byCat.getOrElse(n, 0L), s"category $n")
    }
  }

  test("category shares sum to 1 per state") {
    val bad = AqsQueries.aqiCategoryShareByState(s)
      .groupBy("state_name").agg(sum("share").as("t"))
      .filter(abs(col("t") - 1.0) > 0.01).count()
    assert(bad === 0)
  }

  // ----- DAX time-intelligence edge semantics (SURVEY §7 risk 3) --------

  // Long-span star: 430 days from 2023-11-20 → spans Nov 2023 .. Jan 2025,
  // so months from Nov 2024 onward have a prior-year twin and two Januaries
  // are present.
  lazy val longGold = Pipeline.batch(
    Fixtures.bronze(spark, days = 430),
    Ingest.cleanPopulation(Fixtures.statePopulation(spark)))
  lazy val s2 = AqsQueries.star(longGold).cache()

  test("HASONEVALUE guard: per-100k blanks any multi-state grain") {
    val byState = AqsQueries.unhealthyDaysPer100k(s2)
    assert(byState.filter(col("per_100k").isNull).count() === 0)
    val total = AqsQueries.unhealthyDaysPer100k(s2, groupCols = Nil)
    assert(total.count() === 1)
    assert(total.head().isNullAt(total.head().fieldIndex("per_100k")))
  }

  test("SAMEPERIODLASTYEAR: PY blank until a prior-year month exists") {
    val got = AqsQueries.avgAqiSamePeriodLastYear(s2).collect()
    val (withPy, withoutPy) = got.partition(r =>
      !r.isNullAt(r.fieldIndex("avg_aqi_py")))
    // months before 2024-11 have no 12-months-earlier data → BLANK
    assert(withoutPy.forall(_.getAs[java.sql.Date]("month_start")
      .toLocalDate.isBefore(java.time.LocalDate.of(2024, 11, 1))))
    assert(withPy.nonEmpty)
    withPy.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("yoy_pct")))
      assert(!r.getAs[java.sql.Date]("month_start").toLocalDate
        .isBefore(java.time.LocalDate.of(2024, 11, 1)))
    }
  }

  test("MoM January edge: blank under the within-year variant only") {
    val global = AqsQueries.avgAqiByMonthWithMoM(s2).collect()
    val withinYear = AqsQueries.avgAqiByMonthWithMoM(s2, januaryBlank = true)
      .collect()
    def january(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(r => r.getAs[Int]("month") === 1)
    // two Januaries (2024, 2025): within-year variant blanks both...
    assert(january(withinYear).length === 2)
    january(withinYear).foreach(r => assert(r.isNullAt(r.fieldIndex("mom_pct"))))
    // ...the DATEADD variant compares January to the prior December
    january(global).foreach(r => assert(!r.isNullAt(r.fieldIndex("mom_pct"))))
    // and off-January months agree between the variants
    val gm = global.map(r => (r.getAs[Int]("year"), r.getAs[Int]("month")) ->
      r.getAs[Double]("avg_aqi")).toMap
    withinYear.foreach { r =>
      assert(gm((r.getAs[Int]("year"), r.getAs[Int]("month")))
        === r.getAs[Double]("avg_aqi"))
    }
  }

  test("pollutant display name follows the SWITCH remap with fallthrough") {
    import spark.implicits._
    val got = Seq("carbon monoxide", "PM2.5 - Local Conditions",
      "PM10 Total 0-10um STP", "Nitrogen dioxide (N02)", "Sulfur dioxide",
      "Ozone", "Lead (TSP) LC").toDF("p")
      .select(AqsQueries.pollutantDisplayName(col("p"))).as[String].collect()
    assert(got.toSeq === Seq("Carbon Monoxide", "PM 2.5", "PM 10",
      "Nitrogen Dioxide", "Sulfur Dioxide", "Ozone", "Lead (TSP) LC"))
    val display = AqsQueries.avgAqiByDisplayPollutant(s)
    assert(display.count() > 0)
    assert(display.filter(col("avg_aqi").isNull).count() === 0)
  }
}
