package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{Caches, PipelineQueries}
import graft.operators.DimBuild
import graft.pipeline.{BronzeToSilver, SilverToGold}

/** Dev-only: stage timings of g1 EXACTLY as the registry composes it
  * (bronze persisted first, silver.measurement persisted, dims
  * persisted) — G1Probe times the unpersisted path, which mis-charges
  * the single-file scan serialization to every stage. */
object G1Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[g1p2] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // one full warmup
    graft.SparkEntry.queries("g1_gold_fact")(spark, dir).count()
    Caches.release()
    for (r <- 1 to reps) {
      println(s"--- rep $r")
      val bronze = Caches.persistTracked(
        PipelineQueries.bronzeFromLineitem(spark, dir))
      t("bronze persist")(bronze.count())
      val silver0 = BronzeToSilver(bronze)
      val silver = silver0.copy(
        measurement = Caches.persistTracked(silver0.measurement))
      t("measurement persist")(silver.measurement.count())
      val population = bronze.select(col("state_code")).distinct()
        .withColumn("population",
          (col("state_code").cast("int") * 100000 + 7).cast("int"))
      val dd = Caches.persistTracked(
        SilverToGold.dimDate(silver.measurement, DimBuild.HashKeys))
      val dp = Caches.persistTracked(
        SilverToGold.dimParameter(silver.parameter, DimBuild.HashKeys))
      val dm = Caches.persistTracked(
        SilverToGold.dimMethod(silver.method, DimBuild.HashKeys))
      val dl = Caches.persistTracked(
        SilverToGold.dimLocation(silver.site, silver.adminArea,
          silver.cbsa, population, DimBuild.HashKeys))
      t("dimDate persist")(dd.count())
      t("dimParameter persist")(dp.count())
      t("dimMethod persist")(dm.count())
      t("dimLocation persist")(dl.count())
      val fact = SilverToGold.fact(silver.measurement, dd, dl, dp, dm)
      val gold = fact
        .join(broadcast(dd.select(col("date_key"), col("year"))),
          Seq("date_key"))
        .join(broadcast(dl.select(
          col("location_key"), col("region"), col("population"))),
          Seq("location_key"))
        .join(broadcast(dp.select(
          col("parameter_key"), col("parameter_name"), col("category"))),
          Seq("parameter_key"))
        .join(broadcast(dm.select(col("method_key"))),
          Seq("method_key"))
        .groupBy("year", "region", "parameter_name", "category",
          "aqi_category")
        .agg(count(lit(1)).as("n_meas"),
          countDistinct(col("location_key")).as("n_sites"),
          countDistinct(col("method_key")).as("n_methods"),
          sum(when(col("exceeds_standard"), 1L).otherwise(0L)).as("n_exceed"),
          graft.analytics.Exact.dsum(col("arithmetic_mean")).as("mean_sum"),
          max(col("aqi")).as("max_aqi"),
          sum(col("observation_count").cast("long")).as("n_obs"),
          max(col("population")).as("max_pop"))
        .orderBy("year", "region", "parameter_name", "category",
          "aqi_category")
      t("gold agg")(gold.count())
      Caches.release()
      t("full g1")(graft.SparkEntry.queries("g1_gold_fact")(spark, dir).count())
      Caches.release()
    }
    spark.stop()
  }
}
