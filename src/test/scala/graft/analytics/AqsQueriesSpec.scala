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

  test("worst state matches rank 1") {
    val worst = AqsQueries.worstState(s).head().getString(0)
    val top = AqsQueries.stateRank(s).filter(col("state_rank") === 1)
      .orderBy("state_name").head().getString(0)
    assert(worst === top)
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
}
