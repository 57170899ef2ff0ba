package graft.dev

import org.apache.spark.sql.SparkSession
import graft.model.Fixtures
import graft.pipeline.{Catalog, Ingest, Pipeline}
import graft.analytics.AqsQueries

/** Dev-only: drive the full medallion pipeline through the public API the
  * way a library user would — bronze fixture → silver → gold → warehouse
  * publish → BI measures — printing each measure's head. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.analytics.TempDirs.scratch("graft-demo-wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bronze = Fixtures.bronze(spark, days = 40)
    val population = Ingest.cleanPopulation(Fixtures.statePopulation(spark))
    Ingest.assertStateCoverage(bronze, 10)
    val gold = Pipeline.batch(bronze, population)
    Catalog.publishWarehouse(spark, gold)
    println(s"fact rows: ${spark.table("wh_fact_daily_air_quality").count()}")

    val s = AqsQueries.star(gold).cache()
    println("== avg AQI by year × parameter =="); AqsQueries.avgAqiByYearParameter(s).show(6, false)
    println("== monthly + MoM =="); AqsQueries.avgAqiByMonthWithMoM(s).show(5, false)
    println("== unhealthy day count =="); AqsQueries.unhealthyDayCount(s).show()
    println("== state rank =="); AqsQueries.stateRank(s).show(5, false)
    println("== worst state =="); AqsQueries.worstState(s).show(false)
    println("== leading pollutant =="); AqsQueries.leadingPollutant(s).show(false)
    println("== bad days YTD =="); AqsQueries.badAqiDaysYtd(s).show(5, false)
    println("== % of US exposure =="); AqsQueries.pctOfUsExposure(s).show(5, false)
    println("== YoY =="); AqsQueries.yoyAqiChange(s).show(false)
    println("== category share =="); AqsQueries.aqiCategoryShareByState(s).show(8, false)
    spark.stop()
  }
}
