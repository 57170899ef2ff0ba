package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.PipelineQueries
import graft.operators.DimBuild
import graft.pipeline.{BronzeToSilver, SilverToGold}

/** Dev-only: stage-level timings of the g1 composed pipeline. */
object G1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[g1probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    // warm the JIT once
    PipelineQueries.bronzeFromLineitem(spark, dir).count()
    t("bronze scan+project") {
      PipelineQueries.bronzeFromLineitem(spark, dir).count()
    }
    val bronze = PipelineQueries.bronzeFromLineitem(spark, dir)
    // note: the cleaning filter pushes below the spread exchange onto the
    // single-file scan partition, so THIS stage runs single-threaded on
    // the unpersisted path — the registry query persists bronze first,
    // which materializes the projection once and keeps the filter on
    // materialized columns (see PipelineQueries)
    t("cleaned") {
      graft.operators.Cleaning.validityFilter(
        graft.operators.Cleaning.typeConform(
          graft.operators.Cleaning.cleanStandard(bronze))).count()
    }
    t("measurement dedup") { BronzeToSilver.measurement(bronze).count() }
    t("site dim") { BronzeToSilver.site(bronze).count() }
    t("adminArea dim") { BronzeToSilver.adminArea(bronze).count() }
    t("parameter dim") { BronzeToSilver.parameter(bronze).count() }
    t("method dim") { BronzeToSilver.method(bronze).count() }
    t("cbsa dim") { BronzeToSilver.cbsa(bronze).count() }
    val silver = BronzeToSilver(bronze)
    val population = bronze.select(col("state_code")).distinct()
      .withColumn("population",
        (col("state_code").cast("int") * 100000 + 7).cast("int"))
    val dd = SilverToGold.dimDate(silver.measurement, DimBuild.HashKeys)
    val dp = SilverToGold.dimParameter(silver.parameter, DimBuild.HashKeys)
    val dm = SilverToGold.dimMethod(silver.method, DimBuild.HashKeys)
    val dl = SilverToGold.dimLocation(silver.site, silver.adminArea,
      silver.cbsa, population, DimBuild.HashKeys)
    t("dimDate") { dd.count() }
    t("dimLocation") { dl.count() }
    t("fact assembly") {
      SilverToGold.fact(silver.measurement, dd, dl, dp, dm).count()
    }
    t("full g1") {
      graft.SparkEntry.queries("g1_gold_fact")(spark, dir).count()
    }
    graft.analytics.Caches.release()
    t("full g1 again") {
      graft.SparkEntry.queries("g1_gold_fact")(spark, dir).count()
    }
    spark.stop()
  }
}
